"""Multi-host (multi-process) distributed runtime tests.

The reference runs one NCCL process per GPU via mp.spawn
(tools/backbone_train.py:626-631). sm3x is single-controller per host;
multi-HOST runs use jax.distributed (SURVEY §2b N4). These tests launch
a real 2-process jax.distributed job over virtual CPU devices with gloo
collectives — cross-process allreduce actually happens, so the
multi-host code path is validated end-to-end without pod hardware.
"""

import math
import os
import subprocess
import sys

import pytest

from _backend import free_port as _free_port

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_workers(nprocs: int, mode: str, timeout: float,
                 local_devices: int = 4):
    """Launch the worker in `mode` on nprocs processes; return each
    process's full stdout (all must exit 0)."""
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nprocs), str(port), mode,
             str(local_devices)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)
    return outs


def _value(out: str, tag: str) -> float:
    lines = [l for l in out.splitlines() if l.startswith(tag + " ")]
    assert lines, out
    return float(lines[-1].split()[1])


def test_two_process_allreduce():
    """A data-sharded global array's sum crosses the process boundary;
    both processes must agree on the replicated result, and host_gather
    must rebuild the full array on each process (GATHER line — the
    worker asserts element equality itself)."""
    outs = _run_workers(2, "psum", timeout=240)
    n = 8  # 2 processes x 4 virtual devices
    expected = float(sum(range(n * 3)))
    for out in outs:
        assert _value(out, "RESULT") == expected
        assert _value(out, "GATHER") == expected
        # dim-1-sharded (H, B, D) gather — the MLC memory-bank fill
        assert _value(out, "BANK") == float(sum(range(2 * n * 3)))


@pytest.mark.slow
def test_two_process_ssl_train_step():
    """ONE full SSL train step (grad psum + global-batch BN across the
    process boundary) on a 2-process mesh: both hosts read the same
    finite loss, and the process-sharded input feed (each host assembles
    only its addressable batch rows, sm3x.data.multihost) reproduces the
    full-batch feed's loss exactly."""
    outs = _run_workers(2, "ssl", timeout=1800)
    losses = [_value(out, "RESULT") for out in outs]
    shard_losses = [_value(out, "SHARD") for out in outs]
    assert losses[0] == losses[1]
    assert shard_losses == losses, (losses, shard_losses)
    assert math.isfinite(losses[0]) and losses[0] > 0


def _tag(out: str, tag: str) -> str:
    lines = [l for l in out.splitlines() if l.startswith(tag + " ")]
    assert lines, out
    return lines[-1].split(None, 1)[1]


@pytest.mark.slow
def test_two_process_deepcluster_epoch_parity():
    """A FULL DeepCluster epoch (init_memory -> per-head k-means -> train
    steps -> bank slot updates) on 2 processes x 4 devices vs the
    1-process x 8-device run on the same global mesh.

    Bit-for-bit across process configurations: the k-means ASSIGNMENTS —
    the executable form of the replicated-k-means determinism claim
    (sm3x/ops/kmeans.py): every process runs the same program on the
    same replicated bank, so no rank-0 gather/broadcast is needed (vs
    the reference's dist.gather/broadcast, tools/mlc_train.py:137-186).
    Bit-for-bit WITHIN the 2-process run: everything (both processes
    hold identical replicated state all epoch). Across configurations
    real values (centroids, loss, bank, prototypes) agree only to fp32
    reduction order — the bank fill's cross-process psum / gloo
    allreduce sums in a different order than the single-process
    reduction (measured: loss 1.1311849356 vs 1.1311849952, and the
    ulp-level bank skew shifts centroid means while the argmax
    assignments absorb it) — so those compare numerically at 1e-5.
    Also covers cluster_and_update's device_put of fresh centroids onto
    the live multi-host prototype sharding (advisor round-2 finding)."""
    outs2 = _run_workers(2, "mlc", timeout=1800, local_devices=4)
    outs1 = _run_workers(1, "mlc", timeout=1800, local_devices=8)
    # k-means determinism: bit-exact across the process boundary
    vals = [_tag(out, "ASSIGNHASH") for out in outs2 + outs1]
    assert len(set(vals)) == 1, ("ASSIGNHASH", vals)
    # replication: the two processes of the 2-proc run agree on all state
    for tag in ("RESULT", "BANKHASH", "BANKSUM", "CENTHASH", "CENTSUM",
                "PROTOHASH", "PROTOSUM"):
        vals = [_tag(out, tag) for out in outs2]
        assert len(set(vals)) == 1, (tag, vals)
    # cross-config: real values equal up to fp32 reduction order
    for tag in ("RESULT", "CENTSUM", "BANKSUM", "PROTOSUM"):
        a, b = float(_tag(outs2[0], tag)), float(_tag(outs1[0], tag))
        assert math.isfinite(a) and abs(a - b) <= 1e-5 * max(1.0, abs(b)), (
            tag, a, b)
