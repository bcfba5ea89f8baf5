"""2-process CLI training end-to-end: the reference's mp.spawn launcher
story (tools/backbone_train.py:626-631) replayed as two real
`tools/backbone_train.py` processes joined by --coordinator. Exercises
the full multi-host stack through the actual CLI surface: jax.distributed
bring-up, ProcessShardedData input feeding (auto-selected at
process_count 2), cross-process grad psum + global-batch BN, and the
shared-run-dir logging contract (rank 0 resolves the run dir and owns
stdout + log.txt; rank 1 adopts it via broadcast and writes
log.txt.rank1 — reference logger.py:44-63). Slow-gated: two concurrent
compiles on shared CPUs."""

import os
import subprocess
import sys

import pytest

from _backend import free_port as _free_port

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_cli_backbone_train(tmp_path):
    from sm3x.data.synthetic import make_fake_derm7pt

    data = str(tmp_path / "data")
    make_fake_derm7pt(data, n_cases=12, img_size=56)
    port = _free_port()
    procs, logs = [], []
    for i in range(2):
        # per-process FRESH compile caches: equal compile times keep both
        # processes inside gloo's 30s first-collective handshake window
        # (a shared cache lets one process AOT-load in ms while the other
        # compiles for minutes — see tests/multihost_worker.py)
        env = dict(os.environ, SM3X_PLATFORM="cpu", SM3X_CPU_DEVICES="4",
                   SM3X_COMPILATION_CACHE=str(tmp_path / f"cache_{i}"),
                   PYTHONPATH=REPO)
        log = str(tmp_path / "run")
        logs.append(log)  # both ranks share ONE run dir
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "backbone_train.py"),
             "--data-name", "SevenPCBaseDataset", "--data-path", data,
             "--img-sz", "32", "32", "--cache-size", "48",
             "--mean", "0.78", "0.67", "0.60",
             "--std", "0.21", "0.25", "0.26",
             "-a", "resnet18", "--epochs", "1", "-b", "16",
             "--world-size", "2", "--save-freq", "1",
             "--arch-version", "v32", "--proj-dim", "16",
             "--temperature", "0.1", "-lr", "1e-4", "--log-path", log,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO))
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=1800)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)
    # rank 0 logs to stdout + log.txt; rank 1 ONLY to log.txt.rank1 in
    # the SAME run dir (per-rank file parity, reference logger.py:44-63)
    with open(os.path.join(logs[1], "log.txt.rank1")) as f:
        rank1_log = f.read()
    assert "Epoch 0: loss" not in outs[1], "rank 1 must not log to stdout"
    losses = []
    for out in (outs[0], rank1_log):
        lines = [l for l in out.splitlines() if "Epoch 0: loss" in l]
        assert lines, out
        losses.append(float(lines[-1].split("loss")[1].split()[0]))
    # the loss is replicated after the cross-process psum
    assert losses[0] == losses[1], losses
    # rank 0 checkpoints into the shared run dir
    assert os.path.isfile(os.path.join(logs[0], "ckp_0.msgpack"))
    assert os.path.isfile(os.path.join(logs[0], "log.txt"))
