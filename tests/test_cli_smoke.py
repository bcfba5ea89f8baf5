"""Full CLI pipeline smoke test: backbone_train -> mlc_train -> mlc_eval
-> backbone_eval on a synthetic dataset, via the real tool entry points
(subprocesses on the 8-virtual-CPU backend)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(script, args, cwd):
    env = dict(os.environ)
    # SM3X_PLATFORM is applied in-process by the CLI mains; the plain
    # JAX_PLATFORMS env var is consumed before user code on this host
    # (sitecustomize pins the TPU), so these subprocesses used to land
    # on the real chip — slow cold compiles and tunnel-variance flakes.
    env["SM3X_PLATFORM"] = "cpu"
    env["SM3X_CPU_DEVICES"] = "8"
    cmd = [sys.executable, os.path.join(REPO, "tools", script)] + args
    res = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                         text=True, timeout=900)
    assert res.returncode == 0, (
        f"{script} failed:\nSTDOUT:\n{res.stdout[-3000:]}\n"
        f"STDERR:\n{res.stderr[-3000:]}")
    return res


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from sm3x.data.synthetic import make_fake_derm7pt

    root = tmp_path_factory.mktemp("cli7pc")
    make_fake_derm7pt(str(root), n_cases=12, img_size=56)
    return str(root)


COMMON = ["--data-name", "SevenPCBaseDataset",
          "--img-sz", "32", "32", "--cache-size", "48",
          "--mean", "0.78", "0.67", "0.60", "--std", "0.21", "0.25", "0.26",
          "-a", "resnet18", "--epochs", "1", "-b", "8", "--save-freq", "1"]


@pytest.mark.slow
def test_full_cli_pipeline(dataset, tmp_path):
    work = str(tmp_path)

    ssl_log = os.path.join(work, "bk")
    run_tool("backbone_train.py", COMMON + [
        "--data-path", dataset, "--arch-version", "v32",
        "--proj-dim", "16", "--temperature", "0.1", "-lr", "1e-4",
        "--log-path", ssl_log], work)
    ckpt = os.path.join(ssl_log, "ckp_0.msgpack")
    assert os.path.exists(ckpt)

    mlc_log = os.path.join(work, "mlc")
    run_tool("mlc_train.py", COMMON + [
        "--data-path", dataset, "--temperature", "1",
        "--mlc-proj", "v4", "--mlc-proj-dim", "32",
        "--num-heads", "1", "--sa-dim-ff", "16",
        "--extractor-weights", ckpt, "-lr", "1e-4",
        "--log-path", mlc_log], work)
    mlc_ckpt = os.path.join(mlc_log, "ckp_0.msgpack")
    assert os.path.exists(mlc_ckpt)

    eval_log = os.path.join(work, "ev")
    run_tool("mlc_eval.py", COMMON + [
        "--data-path", dataset,
        "--mlc-proj", "v4", "--mlc-proj-dim", "32",
        "--num-heads", "1", "--sa-dim-ff", "16",
        "--pretrain-path", mlc_ckpt, "--finetune", "projector",
        "--train-sz", "32", "--test-sz", "32", "-lr", "1e-3",
        "--log-path", eval_log], work)
    csv = os.path.join(eval_log, "results.csv")
    assert os.path.exists(csv)
    header = open(csv).readline().strip().split(",")
    assert header[1] == "BWV-1" and header[-1] == "DIAG avg"

    bk_eval_log = os.path.join(work, "bke")
    run_tool("backbone_eval.py", COMMON + [
        "--data-path", dataset,
        "--pretrain-path", ckpt, "--finetune", "fc", "-lr", "1e-3",
        "--log-path", bk_eval_log], work)
    assert os.path.exists(os.path.join(bk_eval_log, "results.csv"))


def test_cli_multicrop_ssl(dataset, tmp_path):
    """--data-name SevenPCSwavDataset through the real backbone_train CLI
    runs the multi-crop step (local views in the loss) and checkpoints."""
    work = str(tmp_path)
    log = os.path.join(work, "swav")
    res = run_tool("backbone_train.py", [
        "--data-name", "SevenPCSwavDataset",
        "--img-sz", "32", "32", "--cache-size", "48",
        "--mean", "0.78", "0.67", "0.60",
        "--std", "0.21", "0.25", "0.26",
        "-a", "resnet18", "--epochs", "1", "-b", "8", "--save-freq", "1",
        "--data-path", dataset, "--arch-version", "v32",
        "--proj-dim", "16", "--temperature", "0.1", "-lr", "1e-4",
        "--size-crops", "32", "16", "--nmb-crops", "2", "1",
        "--min-scale-crops", "0.5", "0.14",
        "--max-scale-crops", "1.0", "0.5",
        "--local-loss-weight", "0.5",
        "--log-path", log], work)
    assert os.path.exists(os.path.join(log, "ckp_0.msgpack"))
    assert "multi-crop SSL" in res.stdout + res.stderr
    cfg_dump = open(os.path.join(log, "configs.txt")).read()
    assert "size_crops" in cfg_dump and "local_loss_weight" in cfg_dump
