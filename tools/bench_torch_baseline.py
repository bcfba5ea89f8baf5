#!/usr/bin/env python
"""Ground the bench.py denominator: measure the PyTorch reference's SSL
step on THIS host (CPU torch — the only torch backend available here).

The reference (tools/backbone_train.py:70-139 + src/models/simclr.py:399-482)
publishes no throughput numbers (SURVEY §6), and its model code cannot be
imported here (torchvision is not installed), so this runs the
structurally-equivalent local torch oracle (tests/torch_ref.py — the same
modules the parity tests verify against): dual ResNet-50 encoders, 2 views
per modality, 3-way NT-Xent (intra-derm, intra-clinic, cross), AdamW —
one full optimizer step, fp32 (CPU autocast fp16 is not the reference's
CUDA AMP and is typically slower on CPU; documented, not measured).

Also measures the reference's host-side augmentation cost approximated
with PIL primitives (the reference chains torchvision PIL transforms,
tools/backbone_train.py:448-466; torchvision itself is absent, so this is
a lower-bound approximation using the same underlying PIL ops: resized
crop, color jitter via ImageEnhance, grayscale, flip, GaussianBlur).

Prints one JSON line per measurement. Run:  python tools/bench_torch_baseline.py [batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_ref import torch_resnet50, torch_ssl_projector


def ntxent(z1, z2, temperature=0.1):
    """In-batch NT-Xent over two projected views (positives-first logits
    layout of src/models/simclr.py:54-93, local negatives)."""
    b = z1.shape[0]
    z = F.normalize(torch.cat([z1, z2], dim=0), dim=1)
    sim = z @ z.t() / temperature
    mask = torch.eye(2 * b, dtype=torch.bool)
    pos = torch.cat([torch.diag(sim, b), torch.diag(sim, -b)]).unsqueeze(1)
    neg = sim[~mask].view(2 * b, -1)
    logits = torch.cat([pos, neg], dim=1)
    labels = torch.zeros(2 * b, dtype=torch.long)
    return F.cross_entropy(logits, labels)


class DualSSL(nn.Module):
    """SimCLRSkinV32-equivalent compute: two ResNet-50 encoders, intra
    projectors + per-modality cross projectors (style 0 = one cross pair)."""

    def __init__(self, proj_dim=128):
        super().__init__()
        self.derm = torch_resnet50()
        self.clinic = torch_resnet50()
        self.derm_proj = torch_ssl_projector(2048, proj_dim)
        self.clinic_proj = torch_ssl_projector(2048, proj_dim)
        self.derm_cross = torch_ssl_projector(2048, proj_dim)
        self.clinic_cross = torch_ssl_projector(2048, proj_dim)

    def forward(self, d1, d2, c1, c2, temperature=0.1):
        fd1, fd2 = self.derm(d1), self.derm(d2)
        fc1, fc2 = self.clinic(c1), self.clinic(c2)
        loss_d = ntxent(self.derm_proj(fd1), self.derm_proj(fd2), temperature)
        loss_c = ntxent(self.clinic_proj(fc1), self.clinic_proj(fc2),
                        temperature)
        loss_x = ntxent(self.derm_cross(fd1), self.clinic_cross(fc1),
                        temperature)
        return loss_d + loss_c + loss_x


def bench_train_step(batch: int, steps: int) -> float:
    torch.manual_seed(0)
    model = DualSSL()
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-6, eps=1e-5,
                            weight_decay=5e-2)
    views = [torch.randn(batch, 3, 224, 224) for _ in range(4)]

    def step():
        opt.zero_grad(set_to_none=True)
        loss = model(*views)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return 4 * batch * steps / dt


def bench_pil_augmentation(n: int = 256) -> float:
    """Reference-style per-sample CPU augmentation chain, 4 views/sample
    (2 per modality), using PIL primitives directly."""
    import random

    from PIL import Image, ImageEnhance, ImageFilter, ImageOps

    rng = random.Random(0)
    base = [Image.fromarray(
        np.random.default_rng(i).integers(0, 255, (320, 320, 3),
                                          dtype=np.uint8).astype(np.uint8))
        for i in range(8)]

    def one_view(img):
        # RandomResizedCrop(224, scale 0.5-1.0)
        s = rng.uniform(0.5, 1.0)
        a = rng.uniform(3 / 4, 4 / 3)
        w = int((s * a) ** 0.5 * img.width)
        h = int((s / a) ** 0.5 * img.height)
        x = rng.randint(0, max(img.width - w, 0))
        y = rng.randint(0, max(img.height - h, 0))
        v = img.crop((x, y, x + w, y + h)).resize((224, 224), Image.BILINEAR)
        # ColorJitter(0.8,0.8,0.8,0.2) @ p=0.8
        if rng.random() < 0.8:
            for enh in (ImageEnhance.Brightness, ImageEnhance.Contrast,
                        ImageEnhance.Color):
                v = enh(v).enhance(rng.uniform(0.2, 1.8))
        # grayscale @ p=0.2
        if rng.random() < 0.2:
            v = ImageOps.grayscale(v).convert("RGB")
        if rng.random() < 0.5:
            v = ImageOps.mirror(v)
        # GaussianBlur @ p=0.5
        if rng.random() < 0.5:
            v = v.filter(ImageFilter.GaussianBlur(rng.uniform(0.1, 2.0)))
        # ToTensor + Normalize
        arr = np.asarray(v, dtype=np.float32) / 255.0
        return (arr - 0.65) / 0.23

    t0 = time.perf_counter()
    for i in range(n):
        img = base[i % len(base)]
        for _ in range(4):
            one_view(img)
    dt = time.perf_counter() - t0
    return 4 * n / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # os.cpu_count() reports 1 in this sandbox; sched_getaffinity sees the
    # real core set
    try:
        n_cpus = len(os.sched_getaffinity(0))
    except AttributeError:
        n_cpus = os.cpu_count() or 8
    torch.set_num_threads(max(n_cpus, 8))

    aug = bench_pil_augmentation()
    print(json.dumps({
        "metric": "reference_cpu_augmentation_images_per_sec",
        "value": round(aug, 2),
        "unit": "aug 224x224 views/sec on this host's CPUs "
                "(PIL chain approximating backbone_train.py:448-466)",
    }), flush=True)

    imgs = bench_train_step(batch, steps)
    print(json.dumps({
        "metric": "reference_torch_cpu_ssl_images_per_sec",
        "value": round(imgs, 2),
        "unit": f"images/sec (fp32 fwd+bwd+AdamW, batch {batch}, "
                f"{torch.get_num_threads()} CPU threads)",
    }), flush=True)


if __name__ == "__main__":
    main()
