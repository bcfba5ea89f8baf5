"""PyTorch checkpoint -> JAX pytree conversion.

The reference ships `.pth` checkpoints whose keys follow four surgery
conventions (SURVEY §5 checkpoint/resume):

1. stage-2 loads the FULL stage-1 state then nulls the projectors
   (tools/mlc_train.py:341-346),
2. backbone_eval splits `derm_backbone.encoder.*` / `clinic_backbone.
   encoder.*` into two per-encoder dicts (tools/backbone_eval.py:284-295),
3. `load_ssl_pretrain` strips `module.`/`encoder.` prefixes and asserts
   only `fc.*` is missing (src/utils/misc.py:497-521),
4. `inference.py:124-126` strips every `encoder.` substring before a
   strict load.

This module converts raw torch state-dicts (as {key: np.ndarray}) to the
{params, batch_stats} trees of the sm3x Flax models, including stacking
the per-label projector/head lists into the vmapped (H, ...) layout.
Conversion handles layout changes: conv OIHW->HWIO, linear (out,in)->(in,out).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


Array = np.ndarray
StateDict = Dict[str, Array]


def load_torch_state_dict(path: str) -> StateDict:
    """torch.load -> numpy dict; accepts the training-state wrapper
    {epoch, state_dict, optimizer, scaler} or a bare state dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in obj.items()}


def strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    """Keep keys under `prefix`, with it removed (misc.py:497-513 flavor)."""
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def strip_module(sd: StateDict) -> StateDict:
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def strip_encoder_substring(sd: StateDict) -> StateDict:
    """inference.py:124-126: replace('encoder.', '') on every key."""
    return {k.replace("encoder.", ""): v for k, v in sd.items()}


def _lin_w(w: Array) -> Array:
    return np.ascontiguousarray(w.T)  # (out,in) -> (in,out)


def _conv_w(w: Array) -> Array:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW->HWIO


def _set(tree: dict, path: Tuple[str, ...], value: Array):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = value


def _bn(params: dict, stats: dict, flax_path: Tuple[str, ...],
        sd: StateDict, torch_key: str):
    """BatchNorm: weight/bias -> scale/bias (if affine), running stats."""
    if f"{torch_key}.weight" in sd:
        _set(params, flax_path + ("scale",), sd[f"{torch_key}.weight"])
        _set(params, flax_path + ("bias",), sd[f"{torch_key}.bias"])
    _set(stats, flax_path + ("mean",), sd[f"{torch_key}.running_mean"])
    _set(stats, flax_path + ("var",), sd[f"{torch_key}.running_var"])


def _ln(params: dict, flax_path, sd: StateDict, torch_key: str):
    _set(params, flax_path + ("scale",), sd[torch_key + ".weight"])
    _set(params, flax_path + ("bias",), sd[torch_key + ".bias"])


# ----------------------------------------------------------------------------
# ResNet
# ----------------------------------------------------------------------------

_STAGE_BLOCKS = {
    "resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
    "resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3],
    "resnet152": [3, 8, 36, 3],
    "resnext50_32x4d": [3, 4, 6, 3], "resnext101_32x8d": [3, 4, 23, 3],
    "resnext101_64x4d": [3, 4, 23, 3],
    "wide_resnet50_2": [3, 4, 6, 3], "wide_resnet101_2": [3, 4, 23, 3],
}
_BASIC = {"resnet18", "resnet34"}


def convert_resnet(sd: StateDict, arch: str = "resnet50", with_fc: bool = False):
    """torch (vendored torchvision) resnet state-dict -> sm3x ResNet trees."""
    params: dict = {}
    stats: dict = {}
    _set(params, ("conv1", "kernel"), _conv_w(sd["conv1.weight"]))
    _bn(params, stats, ("bn1",), sd, "bn1")
    n_convs = 2 if arch in _BASIC else 3
    for stage, n_blocks in enumerate(_STAGE_BLOCKS[arch], start=1):
        for b in range(n_blocks):
            tp = f"layer{stage}.{b}"
            fp = f"layer{stage}_{b}"
            for c in range(1, n_convs + 1):
                _set(params, (fp, f"cb{c}", "conv", "kernel"),
                     _conv_w(sd[f"{tp}.conv{c}.weight"]))
                _bn(params, stats, (fp, f"cb{c}", "bn"), sd, f"{tp}.bn{c}")
            if f"{tp}.downsample.0.weight" in sd:
                _set(params, (fp, "down", "conv", "kernel"),
                     _conv_w(sd[f"{tp}.downsample.0.weight"]))
                _bn(params, stats, (fp, "down", "bn"), sd, f"{tp}.downsample.1")
    if with_fc and "fc.weight" in sd:
        _set(params, ("fc", "kernel"), _lin_w(sd["fc.weight"]))
        _set(params, ("fc", "bias"), sd["fc.bias"])
    return params, stats


# ----------------------------------------------------------------------------
# SSL projector (make_projector: indices 0,1,3,4,6,7 in the Sequential)
# ----------------------------------------------------------------------------

def convert_ssl_projector(sd: StateDict, prefix: str = ""):
    p = prefix
    params: dict = {}
    stats: dict = {}
    _set(params, ("fc1", "kernel"), _lin_w(sd[p + "0.weight"]))
    _bn(params, stats, ("bn1",), sd, p + "1")
    _set(params, ("fc2", "kernel"), _lin_w(sd[p + "3.weight"]))
    _bn(params, stats, ("bn2",), sd, p + "4")
    _set(params, ("fc3", "kernel"), _lin_w(sd[p + "6.weight"]))
    _bn(params, stats, ("bn3",), sd, p + "7")  # affine=False: stats only
    return params, stats


# ----------------------------------------------------------------------------
# SimCLRSkin V3 / V32
# ----------------------------------------------------------------------------

def convert_simclr_skin(sd: StateDict, arch: str = "resnet50",
                        shared_cross_proj: bool = False,
                        with_projectors: bool = True):
    """Full stage-1 model. V32 has cross_proj.0/.1 ModuleList keys
    (simclr.py:405-410); V3 a single shared cross_proj."""
    sd = strip_module(sd)
    params: dict = {}
    stats: dict = {}
    for mod in ("derm_backbone", "clinic_backbone"):
        enc = strip_prefix(sd, f"{mod}.encoder.")
        ep, es = convert_resnet(enc, arch)
        _set(params, (mod, "encoder"), ep)
        _set(stats, (mod, "encoder"), es)
        if with_projectors and f"{mod}.projector.0.weight" in sd:
            pp, ps = convert_ssl_projector(strip_prefix(sd, f"{mod}.projector."))
            _set(params, (mod, "projector"), pp)
            _set(stats, (mod, "projector"), ps)
    if with_projectors:
        if shared_cross_proj and "cross_proj.0.weight" in sd:
            pp, ps = convert_ssl_projector(strip_prefix(sd, "cross_proj."))
            params["cross_proj"] = pp
            stats["cross_proj"] = ps
        elif "cross_proj.0.0.weight" in sd:
            pp, ps = convert_ssl_projector(strip_prefix(sd, "cross_proj.0."))
            params["cross_proj_derm"] = pp
            stats["cross_proj_derm"] = ps
            pp, ps = convert_ssl_projector(strip_prefix(sd, "cross_proj.1."))
            params["cross_proj_clinic"] = pp
            stats["cross_proj_clinic"] = ps
    return params, stats


# ----------------------------------------------------------------------------
# MultiLabelProjector v1-v4 (stacked heads)
# ----------------------------------------------------------------------------

_MLP_LAYOUT = {
    # variant -> [(flax_fc, seq_idx_of_linear), ...], [(flax_bn, seq_idx)...]
    "v1": ([("fc1", 0), ("fc2", 3), ("fc3", 6)], [("bn1", 1), ("bn2", 4), ("bn3", 7)]),
    "v2": ([("fc1", 0), ("fc2", 3)], [("bn1", 1), ("bn2", 4)]),
    "v3": ([("fc1", 0)], [("bn1", 1)]),
    "v4": ([("fc1", 0)], []),
}


def convert_multilabel_projector(sd: StateDict, num_labels: int = 8,
                                 variant: str = "v4", prefix: str = "projectors."):
    """Stack per-head Sequential weights into the vmapped (H, ...) layout."""
    lins, bns = _MLP_LAYOUT[variant]
    params: dict = {}
    stats: dict = {}
    for name, idx in lins:
        w = np.stack([_lin_w(sd[f"{prefix}{h}.{idx}.weight"])
                      for h in range(num_labels)])
        _set(params, ("heads", name, "kernel"), w)
        if f"{prefix}0.{idx}.bias" in sd:
            b = np.stack([sd[f"{prefix}{h}.{idx}.bias"] for h in range(num_labels)])
            _set(params, ("heads", name, "bias"), b)
    for name, idx in bns:
        if f"{prefix}0.{idx}.weight" in sd:
            _set(params, ("heads", name, "scale"),
                 np.stack([sd[f"{prefix}{h}.{idx}.weight"] for h in range(num_labels)]))
            _set(params, ("heads", name, "bias"),
                 np.stack([sd[f"{prefix}{h}.{idx}.bias"] for h in range(num_labels)]))
        _set(stats, ("heads", name, "mean"),
             np.stack([sd[f"{prefix}{h}.{idx}.running_mean"] for h in range(num_labels)]))
        _set(stats, ("heads", name, "var"),
             np.stack([sd[f"{prefix}{h}.{idx}.running_var"] for h in range(num_labels)]))
    return params, stats


# ----------------------------------------------------------------------------
# TransformerEncoderLayer
# ----------------------------------------------------------------------------

def convert_transformer_layer(sd: StateDict, prefix: str = "mlc_sa."):
    p = prefix
    params: dict = {}
    _set(params, ("self_attn", "in_proj", "kernel"), _lin_w(sd[p + "self_attn.in_proj_weight"]))
    _set(params, ("self_attn", "in_proj", "bias"), sd[p + "self_attn.in_proj_bias"])
    _set(params, ("self_attn", "out_proj", "kernel"), _lin_w(sd[p + "self_attn.out_proj.weight"]))
    _set(params, ("self_attn", "out_proj", "bias"), sd[p + "self_attn.out_proj.bias"])
    _set(params, ("linear1", "kernel"), _lin_w(sd[p + "linear1.weight"]))
    _set(params, ("linear1", "bias"), sd[p + "linear1.bias"])
    _set(params, ("linear2", "kernel"), _lin_w(sd[p + "linear2.weight"]))
    _set(params, ("linear2", "bias"), sd[p + "linear2.bias"])
    _ln(params, ("norm1",), sd, p + "norm1")
    _ln(params, ("norm2",), sd, p + "norm2")
    return params


# ----------------------------------------------------------------------------
# Prototypes / linear heads
# ----------------------------------------------------------------------------

def convert_prototypes(sd: StateDict, num_labels: int = 8, prefix: str = "prototypes."):
    params: dict = {}
    for i in range(num_labels):
        _set(params, (f"proto{i}", "kernel"), _lin_w(sd[f"{prefix}{i}.weight"]))
        if f"{prefix}{i}.bias" in sd:
            _set(params, (f"proto{i}", "bias"), sd[f"{prefix}{i}.bias"])
    return params


def convert_multihead_classifier(sd: StateDict, num_labels: int = 8,
                                 prefix: str = "classifier."):
    params: dict = {}
    for i in range(num_labels):
        _set(params, (f"head{i}", "kernel"), _lin_w(sd[f"{prefix}{i}.weight"]))
        _set(params, (f"head{i}", "bias"), sd[f"{prefix}{i}.bias"])
    return params


# ----------------------------------------------------------------------------
# Full MLC model (tools/mlc_eval.py:67 Model / inference.py:53 Model)
# ----------------------------------------------------------------------------

def convert_mlc_model(sd: StateDict, arch: str = "resnet50",
                      num_labels: int = 8, variant: str = "v4",
                      strip_encoder: bool = True):
    """Full eval/inference model: extractor + projectors + mlc_sa +
    prototypes. `strip_encoder` applies the inference.py:124-126 remap
    (the released checkpoints keep `encoder.` inside extractor keys)."""
    sd = strip_module(sd)
    if strip_encoder:
        sd = strip_encoder_substring(sd)

    params: dict = {}
    stats: dict = {}
    # extractor: derm_backbone.* / clinic_backbone.* hold bare resnets now
    extr_p: dict = {}
    extr_s: dict = {}
    for mod in ("derm_backbone", "clinic_backbone"):
        enc = strip_prefix(sd, f"extractor.{mod}.")
        ep, es = convert_resnet(enc, arch)
        _set(extr_p, (mod, "encoder"), ep)
        _set(extr_s, (mod, "encoder"), es)
    params["extractor"] = extr_p
    stats["extractor"] = extr_s

    pp, ps = convert_multilabel_projector(sd, num_labels, variant, "projectors.projectors.")
    head_p: dict = {"projectors": pp}
    head_s: dict = {}
    if ps:
        head_s["projectors"] = ps
    head_p["mlc_sa"] = convert_transformer_layer(sd, "mlc_sa.")
    head_p["prototypes"] = convert_prototypes(sd, num_labels, "prototypes.")
    params["head"] = head_p
    if head_s:
        stats["head"] = head_s
    return params, stats
