"""Streaming just-in-time decode (sm3x.data.streaming): batch-for-batch
equivalence with the decode-once cache, registry/flag wiring, and feed
composition with wrap_for_device."""

import numpy as np
import pytest

from sm3x.core.mesh import make_mesh
from sm3x.data.datasets import build_dataset
from sm3x.data.prefetch import PrefetchData, wrap_for_device
from sm3x.data.streaming import StreamingPairedData
from sm3x.data.synthetic import make_fake_derm7pt


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("stream7pc"))
    make_fake_derm7pt(r, n_cases=10, img_size=56)
    return r


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_streaming_matches_cached_batches(root):
    cached = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64)
    stream = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64,
                           streaming=True)
    assert isinstance(stream, StreamingPairedData)
    assert stream.n == cached.n
    assert stream.steps_per_epoch(4) == cached.steps_per_epoch(4)
    np.testing.assert_array_equal(stream.labels, cached.labels)
    np.testing.assert_array_equal(stream.meta_codes, cached.meta_codes)
    for epoch in (0, 1):
        got = list(stream.batches(4, epoch=epoch))
        want = list(cached.batches(4, epoch=epoch))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g.derm, w.derm)
            np.testing.assert_array_equal(g.derm_hw, w.derm_hw)
            np.testing.assert_array_equal(g.clinic, w.clinic)
            np.testing.assert_array_equal(g.clinic_hw, w.clinic_hw)
            np.testing.assert_array_equal(g.label, w.label)
            np.testing.assert_array_equal(g.index, w.index)
            np.testing.assert_array_equal(g.mask, w.mask)
            np.testing.assert_array_equal(g.meta, w.meta)


def test_streaming_early_stop_and_bad_depth(root):
    stream = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64,
                           streaming=True)
    it = stream.batches(2, epoch=0)
    next(it)
    it.close()  # decode-ahead producer must not hang the generator
    with pytest.raises(ValueError, match="decode_ahead"):
        StreamingPairedData(["a"], ["b"], [[0] * 8], decode_ahead=0)


def test_streaming_propagates_decode_errors(root, mesh):
    stream = StreamingPairedData(
        ["/nonexistent/x.png"], ["/nonexistent/y.png"], [[0] * 8],
        cache_size=32)
    with pytest.raises(FileNotFoundError):
        list(stream.batches(1))


def test_wrap_for_device_composes_streaming(root, mesh):
    stream = build_dataset("SevenPCBaseDataset", root, "train", cache_size=64,
                           streaming=True)
    wrapped = wrap_for_device(stream, mesh)
    assert isinstance(wrapped, PrefetchData)
    assert wrap_for_device(stream, mesh, strategy="host") is stream
    with pytest.raises(ValueError, match="resident"):
        wrap_for_device(stream, mesh, strategy="resident")


def test_streaming_rejected_for_single_modality(tmp_path):
    with pytest.raises(NotImplementedError, match="streaming"):
        build_dataset("ISIC17Dataset", str(tmp_path), "train", streaming=True)


def test_no_cache_images_flag_lands_in_config():
    from sm3x.cli.parser import get_parser, base_configs

    args = get_parser("t").parse_args(["--no-cache-images"])
    data, _, _ = base_configs(args)
    assert data.cache_images is False
    data, _, _ = base_configs(get_parser("t").parse_args([]))
    assert data.cache_images is True
