"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL
(/root/reference/src/utils/misc.py:390-415). TPU-natively this becomes a
named `jax.sharding.Mesh` with a "data" axis (and an extensible "model"
axis for tensor-parallel sharding of the wide stacked heads): jit with
`NamedSharding` lets GSPMD insert the ICI collectives (grad psum, global
batch-norm stats) automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    With a single chip this is a 1x1 mesh — all sharding code still works
    (GSPMD treats size-1 axes as no-ops), so the same train step runs on
    one chip or a v5e-8 slice unchanged.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays onto the mesh, batch-dim sharded."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def label_head_shardings(mesh: Mesh, tree, num_labels: int = 8):
    """Tensor-parallel placement spec for a params/batch_stats pytree:
    the stacked per-label projector weights (every (num_labels, ...) leaf
    under a `projectors` subtree — the nn.vmap-lifted MultiLabelProjector,
    reference src/models/projector.py) shard their leading heads dim over
    the "model" axis; every other leaf is replicated. On a model=1 mesh
    everything comes out replicated, so callers can use this
    unconditionally."""
    rep = replicated_sharding(mesh)
    tp = NamedSharding(mesh, P(MODEL_AXIS))
    m = int(mesh.shape[MODEL_AXIS])

    def walk(t, stacked=False):
        if isinstance(t, dict):
            return {k: walk(v, stacked or k == "projectors")
                    for k, v in t.items()}
        shape = getattr(t, "shape", ())
        if (m > 1 and stacked and len(shape) >= 2
                and shape[0] == num_labels and shape[0] % m == 0):
            return tp
        return rep

    return walk(tree)


def shard_label_heads(mesh: Mesh, tree, num_labels: int = 8):
    """Place a params/batch_stats pytree per `label_head_shardings`."""
    return jax.tree.map(jax.device_put, tree,
                        label_head_shardings(mesh, tree, num_labels))


def vit_tp_shardings(mesh: Mesh, tree):
    """Megatron-style tensor-parallel spec for ViT encoder params
    (--mesh-model > 1 with a vit_* backbone — the BASELINE.json
    "large-batch contrastive on v5e-16" stretch scaling axis).

    Within every transformer block (`block<i>` path component):
      * attention q/k/v kernels (D, H, hd) and biases (H, hd) shard the
        heads dim over "model" (column-parallel),
      * the attention out kernel (H, hd, D) shards its heads dim
        (row-parallel — GSPMD inserts the psum of partial outputs),
      * MLP fc1 (D, hidden)/bias shard the hidden dim (column-parallel),
        fc2 (hidden, D) shards hidden (row-parallel, replicated bias).
    Everything else (patch embed, LN, cls/pos, projectors outside the
    encoder blocks) replicates, so the attention softmax and residual
    stream stay local to each shard; the only collectives per block are
    the two row-parallel psums, exactly the Megatron-LM communication
    pattern expressed as shardings instead of explicit NCCL calls.

    Axes that do not divide the "model" size fall back to replicated
    (e.g. vit_t16's 3 heads on model=2 keep replicated attention while
    its MLP still shards)."""
    rep = replicated_sharding(mesh)
    m = int(mesh.shape[MODEL_AXIS])

    def walk(t, path=()):
        if isinstance(t, dict):
            return {k: walk(v, path + (k,)) for k, v in t.items()}
        if m <= 1:
            return rep
        in_block = any(p.startswith("block") and p[5:].isdigit()
                       for p in path)
        if not in_block or len(path) < 2:
            return rep
        leaf, parent = path[-1], path[-2]
        shape = getattr(t, "shape", ())
        grand = path[-3] if len(path) >= 3 else ""
        if grand == "attn" and parent in ("query", "key", "value"):
            if leaf == "kernel" and len(shape) == 3 and shape[1] % m == 0:
                return NamedSharding(mesh, P(None, MODEL_AXIS, None))
            if leaf == "bias" and len(shape) == 2 and shape[0] % m == 0:
                return NamedSharding(mesh, P(MODEL_AXIS, None))
        elif grand == "attn" and parent == "out":
            if leaf == "kernel" and len(shape) == 3 and shape[0] % m == 0:
                return NamedSharding(mesh, P(MODEL_AXIS, None, None))
        elif parent == "fc1":
            if leaf == "kernel" and len(shape) == 2 and shape[1] % m == 0:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            if leaf == "bias" and len(shape) == 1 and shape[0] % m == 0:
                return NamedSharding(mesh, P(MODEL_AXIS))
        elif parent == "fc2":
            if leaf == "kernel" and len(shape) == 2 and shape[0] % m == 0:
                return NamedSharding(mesh, P(MODEL_AXIS, None))
        return rep

    return walk(tree)
