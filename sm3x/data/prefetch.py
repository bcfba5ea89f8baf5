"""Async host->device batch prefetch.

The HBM-resident path (sm3x.data.device_data.DeviceData) removes the
per-step upload entirely, but only fits datasets a fraction of HBM in
size. For anything larger (ISIC-scale, or big canvases), the fallback
was a synchronous `shard_batch` upload on the step's critical path.

`PrefetchData` wraps any host dataset (PairedImageData-shaped: `batches`,
`steps_per_epoch`, `epoch_order`, `labels`) and overlaps the upload with
device compute the TPU-native way: a background thread slices the next
host batches and enqueues `jax.device_put` transfers (async under JAX's
dispatch model) a bounded `depth` ahead, so the H2D of batch k+1 rides
under the device step of batch k. The reference gets the same overlap
from DataLoader worker processes + CUDA pinned-memory copies
(reference src/utils/misc.py:450-458); here one thread suffices because
the host work is a numpy gather — decode happened once at dataset build
(sm3x.data.pipeline.ImageStore).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import warnings
from typing import Iterator

import jax

from sm3x.core.mesh import data_sharding
from sm3x.data.pipeline import Batch


def iter_with_producer(make_items, depth: int, name: str):
    """Yield items from the iterator `make_items()` produced by a daemon
    thread running up to `depth` items ahead. The producer is CANCELLED
    when the consumer stops early (generator close / exception unwind) —
    it stops after the in-flight item instead of finishing the epoch.
    Producer exceptions re-raise in the consumer."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def producer():
        try:
            it = make_items()
            while not stop.is_set():
                try:
                    item = next(it)
                except StopIteration:
                    break
                q.put(item)  # blocks when full; the drain loop unblocks
        except BaseException as e:  # surface in the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True, name=name)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # unblock a producer stuck in q.put so it can see the stop flag
        while t.is_alive():
            try:
                q.get(timeout=0.05)
            except queue.Empty:
                pass
        t.join(timeout=5)


class PrefetchData:
    """Device-prefetching view over a host dataset.

    `batches` yields Batch objects whose derm/clinic canvas+hw fields are
    already device arrays sharded over the mesh "data" axis, transferred
    up to `depth` batches ahead of consumption. Labels/index/mask/meta
    stay host-side (they feed host logic or are tiny)."""

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

        def put(batch: Batch) -> Batch:
            # device_put here (producer thread) starts the H2D transfer
            # `depth` batches ahead of the consumer
            dev = jax.device_put(
                (batch.derm, batch.derm_hw, batch.clinic, batch.clinic_hw),
                sharding)
            return dataclasses.replace(
                batch, derm=dev[0], derm_hw=dev[1],
                clinic=dev[2], clinic_hw=dev[3])

        yield from iter_with_producer(
            lambda: (put(b) for b in self._host.batches(
                batch_size, epoch, seed, shuffle, pad)),
            self.depth, "sm3x-prefetch")


def resident_nbytes(wrapped) -> int:
    """HBM bytes a wrap_for_device result pinned for canvases (0 unless
    it chose the DeviceData strategy). Feed as `reserved_bytes` when
    wrapping FURTHER datasets so one budget covers them all."""
    from sm3x.data.device_data import DeviceData

    if isinstance(wrapped, DeviceData):
        host = wrapped._host
        return int(host.derm.canvases.nbytes + host.clinic.canvases.nbytes)
    return 0


def wrap_for_device(data, mesh, hbm_budget_bytes: int | None = None,
                    depth: int = 2, strategy: str = "auto",
                    reserved_bytes: int = 0):
    """Pick the device-feeding strategy for a host PairedImageData:
    HBM-resident (DeviceData) when the canvas cache fits the budget,
    otherwise async prefetch (PrefetchData). `strategy` forces one:
    "resident", "prefetch", or "host" (blocking per-step upload).
    Streaming datasets (sm3x.data.streaming) compose with the prefetch
    leg. `reserved_bytes` charges HBM already pinned by earlier wraps
    against the budget. Other inputs (already-wrapped or synthetic) pass
    through unchanged."""
    from sm3x.data.device_data import DeviceData
    from sm3x.data.pipeline import PairedImageData
    from sm3x.data.streaming import StreamingPairedData

    if strategy not in ("auto", "resident", "prefetch", "host"):
        raise ValueError(f"unknown device-feed strategy {strategy!r} "
                         "(auto|resident|prefetch|host)")
    if (strategy == "auto" and jax.process_count() > 1
            and isinstance(data, (PairedImageData, StreamingPairedData))):
        # multi-host default: each process assembles (and, streaming,
        # decodes) only the batch rows its addressable devices own
        # (sm3x.data.multihost); the single-host strategies would make
        # every host gather/decode the full global batch (they still work
        # if forced — device_put only transfers addressable shards)
        from sm3x.data.multihost import ProcessShardedData

        return ProcessShardedData(data, mesh, depth=depth)
    if isinstance(data, StreamingPairedData):
        # just-in-time decode: nothing to make resident; overlap the
        # upload with compute unless the caller wants the host path
        if strategy == "host":
            return data
        if strategy == "resident":
            raise ValueError(
                "--device-feed resident needs the decoded canvas cache; "
                "streaming (--no-cache-images) decodes just-in-time — "
                "drop one of the two flags")
        return PrefetchData(data, mesh, depth=depth)
    if not isinstance(data, PairedImageData):
        if strategy in ("resident", "prefetch") and not isinstance(
                data, (DeviceData, PrefetchData)):
            warnings.warn(
                f"--device-feed {strategy} has no effect on "
                f"{type(data).__name__} (not a paired canvas dataset); "
                "feeding it as-is")
        return data
    if strategy == "host":
        return data
    if strategy == "resident":
        return DeviceData(data, mesh)
    if strategy == "prefetch":
        return PrefetchData(data, mesh, depth=depth)
    if hbm_budget_bytes is None:
        # default: stay well clear of live activations — canvases may use
        # at most ~1/4 of one chip's HBM (v5e: 16 GB)
        hbm_budget_bytes = 4 << 30
    cache_bytes = data.derm.canvases.nbytes + data.clinic.canvases.nbytes
    if cache_bytes + reserved_bytes <= hbm_budget_bytes:
        try:
            return DeviceData(data, mesh)
        except Exception:
            pass
    return PrefetchData(data, mesh, depth=depth)


def wrap_from_config(data, mesh, data_cfg, reserved_bytes: int = 0):
    """wrap_for_device keyed by a DataConfig (--device-feed,
    --hbm-data-budget-mb, --prefetch-depth)."""
    return wrap_for_device(
        data, mesh,
        hbm_budget_bytes=int(getattr(data_cfg, "hbm_data_budget_mb", 4096)) << 20,
        depth=int(getattr(data_cfg, "prefetch_depth", 2)),
        strategy=getattr(data_cfg, "device_feed", "auto"),
        reserved_bytes=reserved_bytes)
