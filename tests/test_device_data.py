"""Device-resident dataset wrapper."""

import numpy as np

import jax

from sm3x.core.mesh import make_mesh
from sm3x.data.derm7pt import Derm7ptMeta
from sm3x.data.device_data import DeviceData
from sm3x.data.pipeline import PairedImageData
from sm3x.data.synthetic import make_fake_derm7pt


def test_device_data_matches_host(tmp_path):
    make_fake_derm7pt(str(tmp_path), n_cases=16, img_size=72)
    meta = Derm7ptMeta(str(tmp_path))
    host = PairedImageData.from_meta(meta, "train", cache_size=64)
    mesh = make_mesh()
    dev = DeviceData(host, mesh)
    assert dev.n == host.n

    hb = list(host.batches(8, epoch=1, seed=7))
    db = list(dev.batches(8, epoch=1, seed=7))
    assert len(hb) == len(db)
    for h, d in zip(hb, db):
        np.testing.assert_array_equal(h.index, d.index)
        np.testing.assert_array_equal(h.mask, d.mask)
        np.testing.assert_array_equal(h.label, d.label)
        np.testing.assert_array_equal(h.derm, np.asarray(d.derm))
        np.testing.assert_array_equal(h.clinic_hw, np.asarray(d.clinic_hw))
        # device batches are already on the mesh, batch-dim sharded
        assert isinstance(d.derm, jax.Array)
