"""ProcessShardedData (sm3x.data.multihost) — the TPU-native
DistributedSampler analogue (reference src/utils/misc.py:437). On a
single-process mesh the "local rows" are the whole batch, so the feed
must reproduce shard_batch bitwise; the cross-process leg runs in
tests/test_multihost.py (slow)."""

from types import SimpleNamespace

import numpy as np

import jax

from sm3x.core.mesh import data_sharding, make_mesh, shard_batch
from sm3x.data.multihost import ProcessShardedData, local_batch_rows
from sm3x.data.synthetic import synthetic_canvas_batch


def _fake_host(n=16, canvas=64, seed=0):
    c, hw, _ = synthetic_canvas_batch(n, canvas=canvas, seed=seed)
    return SimpleNamespace(
        derm=SimpleNamespace(canvases=c, valid_hw=hw),
        clinic=SimpleNamespace(canvases=c[::-1].copy(),
                               valid_hw=hw[::-1].copy()),
        labels=np.arange(n * 8, dtype=np.int32).reshape(n, 8) % 3,
        n=n, meta_codes=None, meta_vocab_sizes=None,
        epoch_order=lambda epoch, seed=3407, shuffle=True: np.arange(n),
        steps_per_epoch=lambda b: (n + b - 1) // b)


def test_local_rows_cover_batch_single_process():
    mesh = make_mesh()
    assert local_batch_rows(mesh, 16).tolist() == list(range(16))


def test_feed_matches_shard_batch():
    mesh = make_mesh()
    host = _fake_host()
    psd = ProcessShardedData(host, mesh)
    assert psd.steps_per_epoch(8) == 2
    batches = list(psd.batches(8, epoch=0, shuffle=False))
    assert len(batches) == 2
    for i, b in enumerate(batches):
        sel = np.arange(i * 8, i * 8 + 8)
        ref = shard_batch(mesh, {
            "derm": host.derm.canvases[sel],
            "derm_hw": host.derm.valid_hw[sel],
            "clinic": host.clinic.canvases[sel],
            "clinic_hw": host.clinic.valid_hw[sel]})
        assert b.derm.sharding == data_sharding(mesh)
        for field, want in (("derm", ref["derm"]), ("derm_hw", ref["derm_hw"]),
                            ("clinic", ref["clinic"]),
                            ("clinic_hw", ref["clinic_hw"])):
            np.testing.assert_array_equal(
                np.asarray(getattr(b, field)), np.asarray(want))
        np.testing.assert_array_equal(b.index, sel)
        np.testing.assert_array_equal(b.label, host.labels[sel])
        assert b.mask.all()


def test_feed_pads_tail_batch():
    mesh = make_mesh()
    host = _fake_host(n=12)
    psd = ProcessShardedData(host, mesh)
    batches = list(psd.batches(8, epoch=0, shuffle=False))
    assert len(batches) == 2
    tail = batches[1]
    # wrap padding (iter_batch_selections): rows 8..11 then 0..3, masked
    np.testing.assert_array_equal(tail.index[:4], np.arange(8, 12))
    assert tail.mask[:4].all() and not tail.mask[4:].any()
    np.testing.assert_array_equal(
        np.asarray(tail.derm), host.derm.canvases[tail.index])


def test_wrap_for_device_single_process_unchanged():
    """process_count()==1 keeps the existing strategy choice."""
    from sm3x.data.prefetch import wrap_for_device

    assert jax.process_count() == 1
    host = _fake_host()
    # not a PairedImageData -> passes through untouched on one process
    assert wrap_for_device(host, make_mesh()) is host
