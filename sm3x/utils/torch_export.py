"""JAX pytree -> PyTorch checkpoint conversion (the inverse of
sm3x.utils.torch_convert).

Why: the reference's deployment/exchange unit is a `.pth` state dict
(reference inference.py:122-127, README.md:10-12). A reference user
migrating to sm3x may need to go the other way too — hand an
sm3x-trained model back to collaborators still running the PyTorch
stack. These exporters emit state dicts in the released checkpoints' key
conventions, so the reference's own loaders accept them strictly:

- stage-1 SSL checkpoints: `derm_backbone.encoder.*`,
  `<mod>.projector.<seq_idx>.*`, `cross_proj*` (reference
  simclr.py:250-482 attribute layout),
- eval/inference checkpoints: `extractor.<mod>_backbone.encoder.*`,
  `projectors.projectors.N.<seq_idx>.*`, `mlc_sa.*`, `prototypes.N.*`
  — with `encoder.` KEPT inside extractor keys, which is what
  inference.py:124-126 strips on load.

Layout inversions mirror torch_convert: HWIO->OIHW convs,
(in,out)->(out,in) linears, scale/bias->weight/bias norms; BatchNorm
emits the `num_batches_tracked` buffer torch's strict load requires.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sm3x.utils.torch_convert import _MLP_LAYOUT, _STAGE_BLOCKS, _BASIC

Array = np.ndarray
StateDict = Dict[str, Array]


def _np(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def _lin_w(w) -> Array:
    return np.ascontiguousarray(_np(w).T)  # (in,out) -> (out,in)


def _conv_w(w) -> Array:
    return np.ascontiguousarray(np.transpose(_np(w), (3, 2, 0, 1)))  # HWIO->OIHW


def _bn(sd: StateDict, torch_key: str, params: dict | None, stats: dict):
    """params=None emits a stat-only (affine=False) BatchNorm."""
    if params is not None:
        sd[f"{torch_key}.weight"] = _np(params["scale"])
        sd[f"{torch_key}.bias"] = _np(params["bias"])
    sd[f"{torch_key}.running_mean"] = _np(stats["mean"])
    sd[f"{torch_key}.running_var"] = _np(stats["var"])
    sd[f"{torch_key}.num_batches_tracked"] = np.zeros((), np.int64)


def _ln(sd: StateDict, torch_key: str, params: dict):
    sd[f"{torch_key}.weight"] = _np(params["scale"])
    sd[f"{torch_key}.bias"] = _np(params["bias"])


# ----------------------------------------------------------------------------
# ResNet
# ----------------------------------------------------------------------------

def export_resnet(params: dict, stats: dict, arch: str = "resnet50",
                  prefix: str = "") -> StateDict:
    """sm3x ResNet trees -> vendored-torchvision key layout
    (inverse of torch_convert.convert_resnet)."""
    sd: StateDict = {}
    p = prefix
    sd[p + "conv1.weight"] = _conv_w(params["conv1"]["kernel"])
    _bn(sd, p + "bn1", params["bn1"], stats["bn1"])
    n_convs = 2 if arch in _BASIC else 3
    for stage, n_blocks in enumerate(_STAGE_BLOCKS[arch], start=1):
        for b in range(n_blocks):
            tp = f"{p}layer{stage}.{b}"
            bp = params[f"layer{stage}_{b}"]
            bs = stats[f"layer{stage}_{b}"]
            for c in range(1, n_convs + 1):
                sd[f"{tp}.conv{c}.weight"] = _conv_w(bp[f"cb{c}"]["conv"]["kernel"])
                _bn(sd, f"{tp}.bn{c}", bp[f"cb{c}"]["bn"], bs[f"cb{c}"]["bn"])
            if "down" in bp:
                sd[f"{tp}.downsample.0.weight"] = _conv_w(bp["down"]["conv"]["kernel"])
                _bn(sd, f"{tp}.downsample.1", bp["down"]["bn"], bs["down"]["bn"])
    if "fc" in params:
        sd[p + "fc.weight"] = _lin_w(params["fc"]["kernel"])
        sd[p + "fc.bias"] = _np(params["fc"]["bias"])
    return sd


# ----------------------------------------------------------------------------
# SSL projector (Sequential indices 0,1,3,4,6,7; final BN affine=False)
# ----------------------------------------------------------------------------

def export_ssl_projector(params: dict, stats: dict, prefix: str = "") -> StateDict:
    sd: StateDict = {}
    p = prefix
    sd[p + "0.weight"] = _lin_w(params["fc1"]["kernel"])
    _bn(sd, p + "1", params["bn1"], stats["bn1"])
    sd[p + "3.weight"] = _lin_w(params["fc2"]["kernel"])
    _bn(sd, p + "4", params["bn2"], stats["bn2"])
    sd[p + "6.weight"] = _lin_w(params["fc3"]["kernel"])
    _bn(sd, p + "7", None, stats["bn3"])  # affine=False
    return sd


# ----------------------------------------------------------------------------
# SimCLRSkin V3 / V32 (stage-1 SSL checkpoint)
# ----------------------------------------------------------------------------

def export_simclr_skin(params: dict, stats: dict, arch: str = "resnet50") -> StateDict:
    """Full stage-1 state dict. Shared vs per-modality cross projectors
    (V3 vs V32) is detected from the tree (cross_proj vs cross_proj_derm)."""
    sd: StateDict = {}
    for mod in ("derm_backbone", "clinic_backbone"):
        sd.update(export_resnet(params[mod]["encoder"], stats[mod]["encoder"],
                                arch, prefix=f"{mod}.encoder."))
        if "projector" in params[mod]:
            sd.update(export_ssl_projector(params[mod]["projector"],
                                           stats[mod]["projector"],
                                           prefix=f"{mod}.projector."))
    if "cross_proj" in params:
        sd.update(export_ssl_projector(params["cross_proj"], stats["cross_proj"],
                                       prefix="cross_proj."))
    elif "cross_proj_derm" in params:
        sd.update(export_ssl_projector(params["cross_proj_derm"],
                                       stats["cross_proj_derm"],
                                       prefix="cross_proj.0."))
        sd.update(export_ssl_projector(params["cross_proj_clinic"],
                                       stats["cross_proj_clinic"],
                                       prefix="cross_proj.1."))
    return sd


# ----------------------------------------------------------------------------
# MultiLabelProjector v1-v4 (unstack the vmapped (H, ...) heads)
# ----------------------------------------------------------------------------

def export_multilabel_projector(params: dict, stats: dict | None,
                                variant: str = "v4",
                                prefix: str = "projectors.") -> StateDict:
    sd: StateDict = {}
    lins, bns = _MLP_LAYOUT[variant]
    heads_p = params["heads"]
    heads_s = (stats or {}).get("heads", {})
    # head count from the first LINEAR: an arbitrary entry may be a BN
    # (scale/bias, no kernel) in the v1-v3 variants
    num_labels = heads_p[lins[0][0]]["kernel"].shape[0]
    for name, idx in lins:
        for h in range(num_labels):
            sd[f"{prefix}{h}.{idx}.weight"] = _lin_w(heads_p[name]["kernel"][h])
            if "bias" in heads_p[name]:
                sd[f"{prefix}{h}.{idx}.bias"] = _np(heads_p[name]["bias"][h])
    for name, idx in bns:
        # the variant's FINAL BatchNorm is affine=False (reference
        # projector.py: BatchNorm1d(..., affine=False)); it has no flax
        # params entry and torch's strict load expects stat-only keys
        affine = name in heads_p
        for h in range(num_labels):
            if affine:
                sd[f"{prefix}{h}.{idx}.weight"] = _np(heads_p[name]["scale"][h])
                sd[f"{prefix}{h}.{idx}.bias"] = _np(heads_p[name]["bias"][h])
            sd[f"{prefix}{h}.{idx}.running_mean"] = _np(heads_s[name]["mean"][h])
            sd[f"{prefix}{h}.{idx}.running_var"] = _np(heads_s[name]["var"][h])
            sd[f"{prefix}{h}.{idx}.num_batches_tracked"] = np.zeros((), np.int64)
    return sd


# ----------------------------------------------------------------------------
# TransformerEncoderLayer / prototypes / classifier heads
# ----------------------------------------------------------------------------

def export_transformer_layer(params: dict, prefix: str = "mlc_sa.") -> StateDict:
    sd: StateDict = {}
    p = prefix
    sd[p + "self_attn.in_proj_weight"] = _lin_w(params["self_attn"]["in_proj"]["kernel"])
    sd[p + "self_attn.in_proj_bias"] = _np(params["self_attn"]["in_proj"]["bias"])
    sd[p + "self_attn.out_proj.weight"] = _lin_w(params["self_attn"]["out_proj"]["kernel"])
    sd[p + "self_attn.out_proj.bias"] = _np(params["self_attn"]["out_proj"]["bias"])
    sd[p + "linear1.weight"] = _lin_w(params["linear1"]["kernel"])
    sd[p + "linear1.bias"] = _np(params["linear1"]["bias"])
    sd[p + "linear2.weight"] = _lin_w(params["linear2"]["kernel"])
    sd[p + "linear2.bias"] = _np(params["linear2"]["bias"])
    _ln(sd, p + "norm1", params["norm1"])
    _ln(sd, p + "norm2", params["norm2"])
    return sd


def export_prototypes(params: dict, prefix: str = "prototypes.") -> StateDict:
    sd: StateDict = {}
    for name, leaf in params.items():
        i = int(name.removeprefix("proto"))
        sd[f"{prefix}{i}.weight"] = _lin_w(leaf["kernel"])
        if "bias" in leaf:
            sd[f"{prefix}{i}.bias"] = _np(leaf["bias"])
    return sd


# ----------------------------------------------------------------------------
# Full MLC eval/inference model (released best_linear/best_finetune layout)
# ----------------------------------------------------------------------------

def export_mlc_model(params: dict, stats: dict, arch: str = "resnet50",
                     variant: str = "v4") -> StateDict:
    """Inverse of convert_mlc_model, in the RELEASED key convention:
    `encoder.` is kept inside extractor keys (inference.py:124-126 strips
    it back out on load)."""
    sd: StateDict = {}
    for mod in ("derm_backbone", "clinic_backbone"):
        sd.update(export_resnet(params["extractor"][mod]["encoder"],
                                stats["extractor"][mod]["encoder"], arch,
                                prefix=f"extractor.{mod}.encoder."))
    head_p = params["head"]
    head_s = stats.get("head", {})
    sd.update(export_multilabel_projector(
        head_p["projectors"], head_s.get("projectors"), variant,
        prefix="projectors.projectors."))
    sd.update(export_transformer_layer(head_p["mlc_sa"], "mlc_sa."))
    sd.update(export_prototypes(head_p["prototypes"], "prototypes."))
    return sd


def save_torch_checkpoint(path: str, sd: StateDict, epoch: int = 0,
                          ddp_prefix: bool = False):
    """Write the training-state wrapper the reference saves
    (tools/backbone_train.py:578-592): {"epoch", "state_dict"}."""
    import torch

    if ddp_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    tensors = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}
    torch.save({"epoch": epoch, "state_dict": tensors}, path)


def main():
    """CLI: sm3x msgpack checkpoint -> reference-convention .pth
    (sm3x-export-torch; tools/export_torch_ckpt.py is the repo shim)."""
    import argparse
    import os

    p = argparse.ArgumentParser("sm3x -> torch checkpoint exporter")
    p.add_argument("--ckpt", type=str, required=True,
                   help="sm3x msgpack checkpoint (trainer ckp_*.msgpack / "
                        "best_eval.msgpack)")
    p.add_argument("--kind", choices=("ssl", "mlc"), required=True,
                   help="ssl = stage-1 layout (loadable by reference "
                        "mlc_train/load_ssl_pretrain); mlc = released "
                        "best_linear/best_finetune layout (strict-loadable "
                        "by reference inference.py:122-127)")
    p.add_argument("--out", type=str, required=True, help=".pth output path")
    p.add_argument("-a", "--arch", type=str, default="resnet50")
    p.add_argument("--mlc-proj", type=str, default="v4",
                   help="projector variant of the MLC head (v1-v4)")
    p.add_argument("--ddp-prefix", action="store_true",
                   help="prefix every key with `module.` (DDP-style)")
    args = p.parse_args()

    from sm3x.utils.checkpoint import load_checkpoint

    tree = load_checkpoint(args.ckpt)
    params, stats = tree["params"], tree["batch_stats"]
    epoch = int(tree.get("epoch", 0))
    if args.kind == "ssl":
        sd = export_simclr_skin(params, stats, args.arch)
    else:
        sd = export_mlc_model(params, stats, args.arch, args.mlc_proj)
    save_torch_checkpoint(args.out, sd, epoch=epoch, ddp_prefix=args.ddp_prefix)
    print(f"wrote {len(sd)} tensors (epoch {epoch}) -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB)")


__all__ = [
    "export_resnet", "export_ssl_projector", "export_simclr_skin",
    "export_multilabel_projector", "export_transformer_layer",
    "export_prototypes", "export_mlc_model", "save_torch_checkpoint",
    "main",
]
