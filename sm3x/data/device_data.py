"""Device-resident dataset (HBM canvas cache).

Derm7pt is tiny (~1k pairs): the whole uint8 canvas cache fits in a
fraction of one chip's HBM. Keeping it device-resident removes the
per-step host->device upload entirely — on a tunneled/remote TPU that
transfer dominates the step. Batches become index gathers inside jit.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from sm3x.core.mesh import data_sharding, replicate
from sm3x.data.pipeline import Batch, PairedImageData, iter_batch_selections


class DeviceData:
    """Wraps a PairedImageData with device-resident canvases. `batches`
    yields Batch objects whose derm/clinic fields are DEVICE arrays
    (sharded over the data axis) gathered by index — no per-step H2D."""

    def __init__(self, data: PairedImageData, mesh):
        self.mesh = mesh
        self.n = data.n
        self.labels = data.labels
        self.meta_codes = getattr(data, "meta_codes", None)
        self.meta_vocab_sizes = getattr(data, "meta_vocab_sizes", None)
        self._derm = replicate(mesh, jnp.asarray(data.derm.canvases))
        self._derm_hw = replicate(mesh, jnp.asarray(data.derm.valid_hw))
        self._clinic = replicate(mesh, jnp.asarray(data.clinic.canvases))
        self._clinic_hw = replicate(mesh, jnp.asarray(data.clinic.valid_hw))
        self._host = data
        out = data_sharding(mesh)
        self._gather = jax.jit(
            lambda c, h, i: (c[i], h[i]), out_shardings=(out, out))

    def steps_per_epoch(self, batch_size: int) -> int:
        return (self.n + batch_size - 1) // batch_size

    def epoch_order(self, epoch: int, seed: int = 3407, shuffle: bool = True):
        return self._host.epoch_order(epoch, seed, shuffle)

    def batches(self, batch_size: int, epoch: int = 0, seed: int = 3407,
                shuffle: bool = True, pad: str = "wrap") -> Iterator[Batch]:
        order = self.epoch_order(epoch, seed, shuffle)
        gather = self._gather
        for sel, mask in iter_batch_selections(order, batch_size):
            idx = replicate(self.mesh, jnp.asarray(sel, jnp.int32))
            derm, derm_hw = gather(self._derm, self._derm_hw, idx)
            clinic, clinic_hw = gather(self._clinic, self._clinic_hw, idx)
            yield Batch(derm=derm, derm_hw=derm_hw, clinic=clinic,
                        clinic_hw=clinic_hw, label=self.labels[sel],
                        index=sel.astype(np.int32), mask=mask,
                        meta=(None if self.meta_codes is None
                              else self.meta_codes[sel]))
