"""Multi-host input sharding (the TPU-native DistributedSampler analogue).

The reference splits each epoch across ranks with DistributedSampler
(src/utils/misc.py:437) so every DDP process only loads its share of
each batch. Single-controller-style JAX multi-host needs the inverse
plumbing: every process computes the SAME deterministic global epoch
order (the seeded permutation `PairedImageData.epoch_order` — identical
on all hosts), gathers ONLY the batch rows its addressable devices own,
and assembles the global batch-sharded array with
`jax.make_array_from_process_local_data`. No host materializes another
host's canvas rows, and the sample selection is bitwise-identical to
the single-host feeds (`iter_batch_selections` is the one shared
definition of which samples each step sees), so switching a run from
one host to a pod changes neither the loss nor the data order.

Like PrefetchData, assembly runs on a producer thread `depth` batches
ahead so the local gather + H2D transfer hides under device compute.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

import jax

from sm3x.core.mesh import data_sharding
from sm3x.data.pipeline import Batch, iter_batch_selections
from sm3x.data.prefetch import iter_with_producer


def local_batch_rows(mesh, global_batch: int) -> np.ndarray:
    """Global row indices of this process's addressable shards of a
    batch-dim-sharded (global_batch, ...) array on `mesh`. Sorted
    ascending — the row order `make_array_from_process_local_data`
    expects local data in. On a single-process mesh this is simply
    arange(global_batch)."""
    sharding = data_sharding(mesh)
    rows = set()
    for idx in sharding.addressable_devices_indices_map(
            (global_batch,)).values():
        rows.update(range(*idx[0].indices(global_batch)))
    return np.array(sorted(rows), dtype=np.int64)


class ProcessShardedData:
    """Per-process device feed over a host PairedImageData.

    `batches` yields Batch objects whose derm/clinic canvas+hw fields
    are GLOBAL batch-sharded device arrays assembled from process-local
    rows only. label/index/mask/meta stay full host arrays (tiny, and
    derivable on every host from the shared epoch order), so trainers
    consume these batches unchanged — `shard_batch` passes the already
    correctly-sharded device fields through."""

    def __init__(self, data, mesh, depth: int = 2):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self._host = data
        self.mesh = mesh
        self.depth = depth
        self.n = data.n
        self.labels = data.labels
        self.meta_codes = getattr(data, "meta_codes", None)
        self.meta_vocab_sizes = getattr(data, "meta_vocab_sizes", None)

    def steps_per_epoch(self, batch_size: int) -> int:
        return self._host.steps_per_epoch(batch_size)

    def epoch_order(self, epoch: int, seed: int = 3407, shuffle: bool = True):
        return self._host.epoch_order(epoch, seed, shuffle)

    def batches(self, batch_size: int, epoch: int = 0, seed: int = 3407,
                shuffle: bool = True, pad: str = "wrap") -> Iterator[Batch]:
        sharding = data_sharding(self.mesh)
        rows = local_batch_rows(self.mesh, batch_size)
        host = self._host

        def assemble(sel: np.ndarray, mask: np.ndarray) -> Batch:
            lsel = sel[rows]  # this process's rows of the global batch

            def mk(store_rows: np.ndarray, item_shape) -> jax.Array:
                return jax.make_array_from_process_local_data(
                    sharding, np.ascontiguousarray(store_rows),
                    (batch_size, *item_shape))

            if hasattr(host, "decode_rows"):
                # streaming (--no-cache-images): decode ONLY this
                # process's rows just-in-time
                d, dh, c, ch = host.decode_rows(lsel)
            else:  # canvas-cached: gather from the decode-once stores
                d, dh = host.derm.canvases[lsel], host.derm.valid_hw[lsel]
                c, ch = host.clinic.canvases[lsel], host.clinic.valid_hw[lsel]
            derm = mk(d, d.shape[1:])
            derm_hw = mk(dh, (2,))
            clinic = mk(c, c.shape[1:])
            clinic_hw = mk(ch, (2,))
            return Batch(
                derm=derm, derm_hw=derm_hw, clinic=clinic,
                clinic_hw=clinic_hw, label=self.labels[sel],
                index=sel.astype(np.int32), mask=mask,
                meta=(None if self.meta_codes is None
                      else self.meta_codes[sel]))

        def make_items():
            order = self.epoch_order(epoch, seed, shuffle)
            return (assemble(sel, mask)
                    for sel, mask in iter_batch_selections(order, batch_size))

        yield from iter_with_producer(make_items, self.depth, "sm3x-mh-feed")
