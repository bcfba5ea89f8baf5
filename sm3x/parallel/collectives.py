"""Collective helpers over the named mesh.

The reference's NCCL inventory (SURVEY §5 distributed backend): implicit
DDP allreduce, SyncBN stats, gather/broadcast (k-means), barrier, and a
padded variable-length all_gather (src/utils/misc.py:629-659). Under a
data-sharded jit the first three fall out of GSPMD; the helpers here
cover the explicit shard_map/pmap use cases and multi-host bring-up.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def distributed_initialize(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (the reference's init_process_group analogue,
    misc.py:390-415). On a single-host TPU slice this is a no-op — the
    runtime already sees every local chip."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def cross_replica_mean(x, axis_name: str = "data"):
    """SyncBN-style statistic mean inside shard_map/pmap bodies."""
    return jax.lax.pmean(x, axis_name)


def process_info() -> tuple:
    """(process_id, num_processes) WITHOUT forcing backend initialization:
    reads the jax.distributed runtime state directly, so logging/setup
    code can be rank-aware before any device is touched (jax.process_*
    would initialize the pinned TPU backend as a side effect)."""
    try:
        from jax._src import distributed

        gs = distributed.global_state
        return int(gs.process_id or 0), int(gs.num_processes or 1)
    except Exception:
        return 0, 1


def is_main_process() -> bool:
    """True on the process that owns filesystem artifacts (rank 0). All
    ranks share ONE run dir since round 5, so checkpoint/best/ckp_N
    writes must be rank-0-only or same-name .tmp atomic renames race
    (the reference gates saves on rank 0 the same way,
    backbone_train.py:578)."""
    return process_info()[0] == 0


def broadcast_string(s: str, max_len: int = 1024) -> str:
    """Agree on a string across processes (rank 0 wins). Used to share a
    rank-0-resolved run directory so every rank logs into the SAME dir
    (the reference's mp.spawn workers inherit the parent's dump_path,
    tools/backbone_train.py:626-631; independent per-rank increment_path
    resolution would race on a shared filesystem). No-op single-process."""
    import numpy as np

    if process_info()[1] == 1:
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, dtype=np.uint8)
    raw = s.encode("utf-8")[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode("utf-8")


def host_gather(x):
    """Fetch a (possibly multi-host-sharded) global array to a full host
    numpy array on EVERY process. Single-process: a plain device->host
    copy. Multi-process: `multihost_utils.process_allgather` — each host
    only holds its addressable shards, so epoch-end metric code cannot
    `np.asarray` a global array directly (the reference sidesteps this by
    computing metrics per-rank only, SURVEY §7; here every host gets the
    full set and metrics stay single-host-identical)."""
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def host_gather_tree(tree):
    """host_gather over a whole pytree in ONE batched operation.
    Single-process: jax.device_get starts every leaf's async copy before
    blocking — leaf-by-leaf host_gather pays one device round-trip per
    leaf (8 heads × n_batches per eval epoch added ~0.7 s/epoch on a
    remote-attached chip, BENCH.md round 5). Multi-process: one
    process_allgather over the tree instead of one collective per leaf."""
    import numpy as np

    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, jax.device_get(tree))
    from jax.experimental import multihost_utils

    return jax.tree.map(np.asarray,
                        multihost_utils.process_allgather(tree, tiled=True))


def all_gather_varlen(x, axis_name: str = "data", max_len: Optional[int] = None):
    """Variable-length all_gather (misc.py:629-659 semantics) inside a
    shard_map/pmap body: pad the leading dim to the cross-replica max,
    gather, and return (gathered (W, max, ...), lengths (W,)) — callers
    slice per-shard rows with the lengths. Static shapes are required
    under jit, so `max_len` must be given when shards can disagree at
    trace time (the reference discovers it with a size all_gather at
    runtime; XLA needs it statically)."""
    n = x.shape[0]
    if max_len is None:
        max_len = n
    pad = [(0, max_len - n)] + [(0, 0)] * (x.ndim - 1)
    padded = jnp.pad(x, pad)
    gathered = jax.lax.all_gather(padded, axis_name)
    lengths = jax.lax.all_gather(jnp.asarray(n), axis_name)
    return gathered, lengths
