"""Async host->device prefetch (sm3x.data.prefetch): batch equivalence
with the host path, device placement/sharding, strategy selection, and
clean early-stop/error propagation."""

import numpy as np
import pytest

import jax

from sm3x.core.mesh import make_mesh
from sm3x.data.datasets import build_dataset
from sm3x.data.device_data import DeviceData
from sm3x.data.prefetch import PrefetchData, wrap_for_device
from sm3x.data.synthetic import make_fake_derm7pt


@pytest.fixture(scope="module")
def host_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prefetch7pc"))
    make_fake_derm7pt(root, n_cases=10, img_size=56)
    return build_dataset("SevenPCBaseDataset", root, "train", cache_size=64)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_prefetch_matches_host_batches(host_data, mesh):
    pre = PrefetchData(host_data, mesh, depth=2)
    assert pre.steps_per_epoch(8) == host_data.steps_per_epoch(8)
    for epoch in (0, 1):
        got = list(pre.batches(8, epoch=epoch))
        want = list(host_data.batches(8, epoch=epoch))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert isinstance(g.derm, jax.Array)
            np.testing.assert_array_equal(np.asarray(g.derm), w.derm)
            np.testing.assert_array_equal(np.asarray(g.derm_hw), w.derm_hw)
            np.testing.assert_array_equal(np.asarray(g.clinic), w.clinic)
            np.testing.assert_array_equal(np.asarray(g.clinic_hw),
                                          w.clinic_hw)
            # host-side fields untouched
            np.testing.assert_array_equal(g.label, w.label)
            np.testing.assert_array_equal(g.index, w.index)
            np.testing.assert_array_equal(g.mask, w.mask)


def test_prefetch_batches_are_data_sharded(host_data, mesh):
    pre = PrefetchData(host_data, mesh, depth=1)
    b = next(iter(pre.batches(8, epoch=0)))
    spec = b.derm.sharding.spec
    assert spec[0] == "data", spec
    # consumed only one batch of several: the generator must not hang
    # (early-stop drains the producer)


def test_prefetch_early_stop_does_not_hang(host_data, mesh):
    pre = PrefetchData(host_data, mesh, depth=1)
    it = pre.batches(8, epoch=0)
    next(it)
    it.close()  # GeneratorExit inside the consumer loop


def test_prefetch_propagates_producer_errors(host_data, mesh):
    class Boom(Exception):
        pass

    class BadData:
        n = host_data.n
        labels = host_data.labels

        def steps_per_epoch(self, bs):
            return 1

        def epoch_order(self, *a, **k):
            return np.arange(self.n)

        def batches(self, *a, **k):
            raise Boom("producer failed")
            yield  # pragma: no cover

    with pytest.raises(Boom):
        list(PrefetchData(BadData(), mesh).batches(2))


def test_prefetch_rejects_bad_depth(host_data, mesh):
    with pytest.raises(ValueError, match="depth"):
        PrefetchData(host_data, mesh, depth=0)


def test_wrap_for_device_picks_resident_then_prefetch(host_data, mesh):
    assert isinstance(wrap_for_device(host_data, mesh), DeviceData)
    small_budget = host_data.derm.canvases.nbytes  # < derm+clinic
    wrapped = wrap_for_device(host_data, mesh,
                              hbm_budget_bytes=small_budget)
    assert isinstance(wrapped, PrefetchData)
    # passthrough for non-PairedImageData inputs
    assert wrap_for_device(wrapped, mesh) is wrapped


def test_wrap_for_device_forced_strategies(host_data, mesh):
    assert wrap_for_device(host_data, mesh, strategy="host") is host_data
    assert isinstance(wrap_for_device(host_data, mesh, strategy="resident"),
                      DeviceData)
    forced = wrap_for_device(host_data, mesh, strategy="prefetch", depth=3)
    assert isinstance(forced, PrefetchData) and forced.depth == 3
    with pytest.raises(ValueError, match="device-feed"):
        wrap_for_device(host_data, mesh, strategy="bogus")


def test_prefetch_early_stop_cancels_producer(host_data, mesh):
    """Closing the generator mid-epoch must CANCEL the producer (stop
    after the in-flight batch), not let it upload the rest of the epoch."""
    uploads = []

    class Counting:
        n = host_data.n
        labels = host_data.labels

        def steps_per_epoch(self, bs):
            return host_data.steps_per_epoch(bs)

        def epoch_order(self, *a, **k):
            return host_data.epoch_order(*a, **k)

        def batches(self, *a, **k):
            one = next(iter(host_data.batches(8, epoch=0)))
            for _ in range(6):
                uploads.append(1)
                yield one

    pre = PrefetchData(Counting(), mesh, depth=1)
    it = pre.batches(8, epoch=0)  # 6 producer batches
    next(it)
    it.close()
    # consumed 1; producer may have 1 in-flight + depth(1) queued
    assert sum(uploads) <= 3, uploads


def test_wrap_for_device_rejects_bad_strategy_for_streaming(host_data, mesh):
    from sm3x.data.streaming import StreamingPairedData

    stream = StreamingPairedData(["a"], ["b"], [[0] * 8])
    with pytest.raises(ValueError, match="device-feed"):
        wrap_for_device(stream, mesh, strategy="bogus")


def test_wrap_for_device_warns_on_ignored_forced_strategy(mesh):
    class Synthetic:  # not a paired canvas dataset
        pass

    with pytest.warns(UserWarning, match="no effect"):
        wrap_for_device(Synthetic(), mesh, strategy="resident")


def test_wrap_for_device_budget_is_cumulative(host_data, mesh):
    from sm3x.data.prefetch import resident_nbytes

    both = (host_data.derm.canvases.nbytes
            + host_data.clinic.canvases.nbytes)
    first = wrap_for_device(host_data, mesh, hbm_budget_bytes=both + both // 2)
    assert isinstance(first, DeviceData)
    assert resident_nbytes(first) == both
    # the same split again exceeds the remaining half-budget
    second = wrap_for_device(host_data, mesh,
                             hbm_budget_bytes=both + both // 2,
                             reserved_bytes=resident_nbytes(first))
    assert isinstance(second, PrefetchData)


def test_wrap_from_config_plumbs_cli_flags(host_data, mesh):
    from sm3x.core.config import DataConfig
    from sm3x.data.prefetch import wrap_from_config

    forced = wrap_from_config(
        host_data, mesh, DataConfig(device_feed="prefetch", prefetch_depth=4))
    assert isinstance(forced, PrefetchData) and forced.depth == 4
    # a 1 MB budget forces the auto path off HBM residency
    auto = wrap_from_config(
        host_data, mesh, DataConfig(hbm_data_budget_mb=0))
    assert isinstance(auto, PrefetchData)
    assert wrap_from_config(host_data, mesh,
                            DataConfig()).__class__ is DeviceData
