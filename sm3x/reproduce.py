"""Reproduce the released results CSVs from a checkpoint.

The reference's quality lock (SURVEY §4): run the released
best_linear.pth / best_finetune.pth over the Derm7pt test split and match
linear_results.csv / finetune_results.csv. This module loads either a
torch .pth (converted on the fly) or an sm3x msgpack, evaluates the test
split, writes the CSV in the released layout, and (optionally) diffs
every cell against a reference CSV with the ±tolerance from BASELINE.md.

    sm3x-reproduce --pretrain-path best_finetune.pth \
        --data-path ./data/7PC --out results.csv \
        --compare /path/to/finetune_results.csv --tolerance 0.2

(Also reachable as tools/reproduce_results.py.)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def evaluate(pretrain_path, data_path, arch="resnet50", mlc_proj_dim=512,
             sa_dim_ff=128, batch_size=64, cache_size=320, test_sz=224,
             mean=(0.7833, 0.6712, 0.6026), std=(0.2139, 0.2472, 0.2571),
             fp32=False, platform=None):
    import jax
    import jax.numpy as jnp

    if platform:
        # env vars are too late in this environment (sitecustomize pins
        # the TPU platform before user code runs); the in-process config
        # update is the only channel that sticks. CPU gets the same
        # 8-virtual-device mesh the test suite uses.
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            jax.config.update("jax_num_cpu_devices", 8)

    from sm3x.core.cache import enable_compilation_cache
    from sm3x.core.mesh import make_mesh, shard_batch
    from sm3x.data.datasets import SevenPCBaseDataset
    from sm3x.ops.augment import eval_resize_batch
    from sm3x.api import build_evaluator, load_weights

    if fp32:
        # true-f32 matmuls/convs (TPU defaults f32 dots to fast bf16
        # passes, ~1e-2 relative — too loose for a torch-parity lock)
        jax.config.update("jax_default_matmul_precision", "highest")
    enable_compilation_cache()
    mesh = make_mesh()
    model = build_evaluator(arch=arch, mlc_proj_dim=mlc_proj_dim,
                            sa_dim_ff=sa_dim_ff,
                            dtype=jnp.float32 if fp32 else jnp.bfloat16)
    variables = load_weights(pretrain_path, arch)

    @jax.jit
    def eval_step(derm, derm_hw, clinic, clinic_hw):
        d = eval_resize_batch(derm, derm_hw, mean, std, (test_sz, test_sz))
        c = eval_resize_batch(clinic, clinic_hw, mean, std, (test_sz, test_sz))
        _, preds = model.apply(variables, d, c)
        return preds

    data = SevenPCBaseDataset(data_path, "test", cache_size=cache_size)
    all_preds, all_targets, all_masks = [], [], []
    for batch in data.batches(batch_size, epoch=0, shuffle=False):
        db = shard_batch(mesh, {
            "derm": batch.derm, "derm_hw": batch.derm_hw,
            "clinic": batch.clinic, "clinic_hw": batch.clinic_hw})
        preds = eval_step(db["derm"], db["derm_hw"], db["clinic"], db["clinic_hw"])
        all_preds.append([np.asarray(p) for p in preds])
        all_targets.append(batch.label)
        all_masks.append(batch.mask)
    mask = np.concatenate(all_masks)
    preds = [np.concatenate([p[i] for p in all_preds])[mask]
             for i in range(len(all_preds[0]))]
    targets = np.concatenate(all_targets)[mask]
    return preds, targets


def compare_csv(ours: str, reference: str, tolerance: float = 0.2):
    """Cell-by-cell diff; returns (n_bad, report lines).

    Cells are matched by COLUMN NAME, not position, and a column present
    in only one file is a failure — a reordered or truncated CSV must
    not pass the quality lock."""
    import csv

    def read(path):
        with open(path) as f:
            rows = list(csv.reader(f))
        header = rows[0][1:]
        table = {r[0]: [float(v) for v in r[1:]] for r in rows[1:]}
        return header, table

    h1, t1 = read(ours)
    h2, t2 = read(reference)
    report = []
    n_bad = 0
    for name in h2:
        if name not in h1:
            report.append(f"MISSING column {name}")
            n_bad += 1
    for name in h1:
        if name not in h2:
            report.append(f"EXTRA column {name}")
            n_bad += 1
    col_of = {name: i for i, name in enumerate(h1)}
    for metric in t2:
        if metric not in t1:
            report.append(f"MISSING metric row {metric}")
            n_bad += 1
            continue
        for j, name in enumerate(h2):
            if name not in col_of:
                continue  # already reported as MISSING column
            a = t1[metric][col_of[name]]
            b = t2[metric][j]
            if abs(a - b) > tolerance:
                report.append(f"{metric}/{name}: ours {a:.3f} vs ref {b:.3f} "
                              f"(|d|={abs(a - b):.3f})")
                n_bad += 1
    return n_bad, report


def _preflight(args):
    """Fail fast, naming every missing staged artifact — the quality lock
    against the released weights (reference README.md:10-12) must be
    runnable the day `best_linear.pth`/`best_finetune.pth` and the
    Derm7pt release are staged, so the error message is the staging
    checklist."""
    import os

    missing = []
    if not os.path.exists(args.pretrain_path):
        missing.append(
            f"  --pretrain-path {args.pretrain_path}: not found. Stage the "
            f"released checkpoint (best_linear.pth / best_finetune.pth from "
            f"the skin-sm3 release, or an sm3x .msgpack) at this path.")
    meta_csv = os.path.join(args.data_path, "meta.csv")
    if not os.path.exists(meta_csv):
        missing.append(
            f"  --data-path {args.data_path}: {meta_csv} not found. Stage "
            f"the Derm7pt release here (meta.csv + images/ with the "
            f"referenced derm/clinic files, plus "
            f"{{train,valid,test}}_indexes.csv).")
    if args.compare and not os.path.exists(args.compare):
        missing.append(
            f"  --compare {args.compare}: not found. Stage the released "
            f"linear_results.csv / finetune_results.csv to lock against.")
    if missing:
        sys.exit("sm3x-reproduce: missing staged artifacts:\n"
                 + "\n".join(missing))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain-path", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--out", default="results.csv")
    p.add_argument("--compare", default=None)
    p.add_argument("--tolerance", type=float, default=0.2)
    p.add_argument("-a", "--arch", default="resnet50")
    p.add_argument("--mlc-proj-dim", type=int, default=512)
    p.add_argument("--sa-dim-ff", type=int, default=128)
    p.add_argument("-b", "--batch-size", type=int, default=64)
    p.add_argument("--test-sz", type=int, default=224)
    p.add_argument("--cache-size", type=int, default=320)
    p.add_argument("--fp32", action="store_true",
                   help="fp32 compute instead of bf16 (tight numeric "
                   "parity against torch-computed expectations)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                   help="force a jax backend in-process (JAX_PLATFORMS in "
                   "the environment does not survive this host's "
                   "sitecustomize); cpu implies an 8-virtual-device mesh")
    p.add_argument("--mean", nargs=3, type=float,
                   default=[0.7833, 0.6712, 0.6026])
    p.add_argument("--std", nargs=3, type=float,
                   default=[0.2139, 0.2472, 0.2571])
    args = p.parse_args()

    _preflight(args)

    from sm3x.metrics import write_results_csv

    preds, targets = evaluate(
        args.pretrain_path, args.data_path, args.arch, args.mlc_proj_dim,
        args.sa_dim_ff, args.batch_size, cache_size=args.cache_size,
        test_sz=args.test_sz, mean=tuple(args.mean), std=tuple(args.std),
        fp32=args.fp32, platform=args.platform)
    write_results_csv(args.out, preds, targets)
    print(f"wrote {args.out}")

    from sm3x.metrics import mean_average_precision

    ap = mean_average_precision(preds, targets)
    print(f"mAP_AVG {100 * ap['mAP_AVG']:.2f}  "
          f"mAP_SEL_AVG {100 * ap['mAP_SEL_AVG']:.2f}  (BASELINE.json "
          f"'mAP parity' metric; not part of the released CSV layout)")

    if args.compare:
        n_bad, report = compare_csv(args.out, args.compare, args.tolerance)
        for line in report[:50]:
            print(line)
        print(f"{'PASS' if n_bad == 0 else 'FAIL'}: {n_bad} cells beyond "
              f"±{args.tolerance}")
        sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
