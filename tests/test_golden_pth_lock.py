"""Golden quality-parity lock, to the limit of this environment (the real
released weights/data are not present — VERDICT r1 next-step 3): a REAL
`.pth` file saved with the released checkpoints' key conventions
(`{"state_dict": ...}` wrapper, `module.` DDP prefixes, `encoder.` inside
extractor keys — reference inference.py:122-127) is pushed through
`tools/reproduce_results.py` END-TO-END as a subprocess (torch load →
key surgery → Flax conversion → jitted test-split eval → released-layout
results.csv → --compare), and every CSV cell must match a CSV computed
from the torch oracle's own forward over the same data within ±0.2 (the
BASELINE.md tolerance).

The torch side preprocesses with F.interpolate(bilinear,
align_corners=False) — the same resample semantics as sm3x's matmul-form
eval resize — so the lock covers preprocessing + forward + metrics + CSV
together, not just the forward (which tests/test_mlc_parity.py already
locks at 1e-4)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from sm3x import NUM_CLASSES

from torch_ref import (TorchMultiLabelProjector, randomize_bn_stats,
                       torch_resnet18, torch_resnet50)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MEAN = (0.7833, 0.6712, 0.6026)
STD = (0.2139, 0.2472, 0.2571)


class _Branch(nn.Module):
    """SSL branch as saved in the released ckpts: the resnet lives under
    an `encoder` attribute (SimCLR, reference simclr.py:41-49), which is
    why inference.py strips the `encoder.` substring on load."""

    def __init__(self, backbone=torch_resnet18):
        super().__init__()
        self.encoder = backbone()

    def forward(self, x):
        return self.encoder(x)


class _Extractor(nn.Module):
    def __init__(self, backbone=torch_resnet18):
        super().__init__()
        self.derm_backbone = _Branch(backbone)
        self.clinic_backbone = _Branch(backbone)

    def extract(self, d, c):
        return [self.derm_backbone(d), self.clinic_backbone(c)]


class TorchEvalModel(nn.Module):
    """Key layout of the released best_linear/best_finetune checkpoints
    (reference tools/mlc_eval.py Model): extractor.*_backbone.encoder.*,
    projectors.projectors.N.0.*, mlc_sa.*, prototypes.N.*."""

    def __init__(self, feat_dim=1024, proj_dim=32, ff=16,
                 backbone=torch_resnet18):
        super().__init__()
        self.extractor = _Extractor(backbone)
        self.projectors = TorchMultiLabelProjector(feat_dim, proj_dim, 8)
        self.mlc_sa = nn.TransformerEncoderLayer(
            d_model=proj_dim, nhead=1, dim_feedforward=ff, dropout=0.1)
        self.prototypes = nn.ModuleList(
            [nn.Linear(proj_dim, i) for i in NUM_CLASSES])

    def forward(self, d, c):
        feats = torch.cat(self.extractor.extract(d, c), dim=1)
        proj = torch.stack(self.projectors(feats), dim=0)
        sa = self.mlc_sa(proj)
        return [self.prototypes[i](sa[i]) for i in range(len(self.prototypes))]


def _torch_eval_preds(tm, data, test_sz, batch_size=8):
    """Torch-side expected predictions over the same test split with the
    reference eval transform (Resize + Normalize, mlc_eval.py:302-308)."""
    mean = torch.tensor(MEAN).view(1, 3, 1, 1)
    std = torch.tensor(STD).view(1, 3, 1, 1)
    all_preds = [[] for _ in range(8)]
    targets = []
    for batch in data.batches(batch_size, epoch=0, shuffle=False):
        imgs = {}
        for kind in ("derm", "clinic"):
            canv = getattr(batch, kind)
            hws = getattr(batch, kind + "_hw")
            views = []
            for c, (h, w) in zip(canv, hws):
                x = torch.from_numpy(
                    c[:h, :w].astype(np.float32) / 255.0).permute(2, 0, 1)
                x = F.interpolate(x[None], (test_sz, test_sz),
                                  mode="bilinear", align_corners=False)[0]
                views.append(x)
            imgs[kind] = (torch.stack(views) - mean) / std
        with torch.no_grad():
            preds = tm(imgs["derm"], imgs["clinic"])
        m = batch.mask
        for i in range(8):
            all_preds[i].append(preds[i].numpy()[m])
        targets.append(batch.label[m])
    return ([np.concatenate(p) for p in all_preds],
            np.concatenate(targets))


def _run_golden_lock(tmp_path, *, arch, backbone, feat_dim, proj_dim, ff,
                     n_cases, img_size, test_sz, cache_size, batch,
                     timeout):
    from sm3x.data.datasets import SevenPCBaseDataset
    from sm3x.data.synthetic import make_fake_derm7pt
    from sm3x.metrics import write_results_csv

    root = str(tmp_path / "data")
    make_fake_derm7pt(root, n_cases=n_cases, img_size=img_size)

    gen = torch.Generator().manual_seed(11)
    torch.manual_seed(11)
    tm = TorchEvalModel(feat_dim=feat_dim, proj_dim=proj_dim, ff=ff,
                        backbone=backbone)
    randomize_bn_stats(tm, gen)
    # the released init is normal(0, 0.01); amplify the heads so per-case
    # logits are well separated and AUROC is not tie-brittle at this scale
    for p in tm.prototypes:
        p.weight.data.normal_(0.0, 0.5, generator=gen)
        p.bias.data.normal_(0.0, 0.5, generator=gen)
    tm.eval()

    # a REAL .pth with the released conventions: state_dict wrapper +
    # module. prefixes + encoder. inside extractor keys
    pth = str(tmp_path / "best_finetune.pth")
    torch.save({"state_dict": {f"module.{k}": v
                               for k, v in tm.state_dict().items()},
                "epoch": 3}, pth)

    data = SevenPCBaseDataset(root, "test", cache_size=cache_size)
    preds, targets = _torch_eval_preds(tm, data, test_sz,
                                       batch_size=batch)
    expected_csv = str(tmp_path / "expected.csv")
    write_results_csv(expected_csv, preds, targets)

    out_csv = str(tmp_path / "ours.csv")
    # --platform cpu: JAX_PLATFORMS in the env does not survive this
    # host's sitecustomize (the subprocess would land on the real TPU and
    # a cold compile can blow any reasonable timeout — this test timed
    # out at 900s that way); the in-process flag is the robust channel.
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "reproduce_results.py"),
         "--pretrain-path", pth, "--data-path", root, "--out", out_csv,
         "--compare", expected_csv, "--tolerance", "0.2",
         "-a", arch, "--mlc-proj-dim", str(proj_dim),
         "--sa-dim-ff", str(ff),
         "-b", str(batch), "--test-sz", str(test_sz),
         "--cache-size", str(cache_size),
         "--fp32", "--platform", "cpu"],
        capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, (
        f"reproduce_results lock failed:\nSTDOUT:\n{res.stdout[-4000:]}\n"
        f"STDERR:\n{res.stderr[-2000:]}")
    assert "PASS: 0 cells beyond" in res.stdout

    # and the CSVs agree cell-for-cell well inside the tolerance
    ours = open(out_csv).read().splitlines()
    exp = open(expected_csv).read().splitlines()
    assert ours[0] == exp[0]  # identical released-layout header
    for ro, re_ in zip(ours[1:], exp[1:]):
        co, ce = ro.split(","), re_.split(",")
        assert co[0] == ce[0]
        diffs = [abs(float(a) - float(b)) for a, b in zip(co[1:], ce[1:])]
        assert max(diffs) <= 0.2, (co[0], max(diffs))


@pytest.mark.slow
def test_released_pth_to_csv_lock(tmp_path):
    _run_golden_lock(
        tmp_path, arch="resnet18", backbone=torch_resnet18, feat_dim=1024,
        proj_dim=32, ff=16, n_cases=24, img_size=56, test_sz=64,
        cache_size=64, batch=8, timeout=1800)


@pytest.mark.slow
def test_released_pth_to_csv_lock_released_scale(tmp_path):
    """The EXACT shape of the real quality-parity trigger (VERDICT r3 next
    #5): resnet50 @ 224 eval, mlc-proj-dim 512 / sa-dim-ff 128 (run.sh
    stage-3/4 recipe), over a 395-case fake test split — the size of the
    real Derm7pt test split the released CSVs were computed on
    (/root/reference/README.md:10-12). First contact with the real
    best_linear/best_finetune weights is then a rerun of this test with
    the real paths (MIGRATION.md), not a debug session.

    CPU-heavy (two resnet50 towers over 395 cases, torch + XLA): ~15-25
    min on a 1-core host; slow-gated like the rest of the CLI pipeline."""
    # n_cases=1580 -> train 790 / valid 395 / test 395
    # (make_fake_derm7pt splits n//2, n//4, remainder)
    _run_golden_lock(
        tmp_path, arch="resnet50", backbone=torch_resnet50, feat_dim=4096,
        proj_dim=512, ff=128, n_cases=1580, img_size=240, test_sz=224,
        cache_size=256, batch=16, timeout=5400)
