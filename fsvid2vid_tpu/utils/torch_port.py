"""Torch checkpoint importers.

The reference depends on two out-of-band pretrained networks: the FlowNet2
teacher checkpoint (`FlowNet2_checkpoint.pth.tar`, models/flownet.py:28) and
torchvision's ImageNet VGG19 for the perceptual loss (vgg.py:48).  These
importers map those torch state_dicts onto the flax parameter trees, handling
layout conversion:
  conv            (Cout, Cin, kh, kw) -> HWIO (kh, kw, Cin, Cout)
  conv-transpose  (Cin, Cout, kh, kw) -> HWIO with spatial flip, matching the
                  conv_general_dilated(lhs_dilation) formulation of
                  TorchConvTranspose
  linear          (out, in) -> (in, out)

torch is imported lazily and only used to deserialize the pickle — the
framework itself never executes torch ops.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    return {k: v.detach().numpy() for k, v in payload.items()}


def conv_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def convtranspose_to_hwio(w: np.ndarray) -> np.ndarray:
    """(Cin, Cout, kh, kw) torch deconv -> flipped HWIO for lhs-dilated conv."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _assign(tree: Dict, path, value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    assert tuple(old.shape) == tuple(value.shape), (
        f"shape mismatch at {'/'.join(path)}: {old.shape} vs {value.shape}")
    node[path[-1]] = value.astype(np.float32)


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,)


def import_flownet2(flax_params: Dict, ckpt_path: str) -> Dict:
    """Map the FlowNet2 torch checkpoint onto FlowNet2 flax params.

    flax path conventions (models/flownet/flownet2.py):
      <net>/<layer>/conv/kernel      <- '<net>.<layer>.0.weight'   (Sequential)
      <net>/<layer>/deconv/kernel    <- '<net>.<layer>.0.weight'   (transposed)
      <net>/predict_flowX/kernel     <- '<net>.predict_flowX.weight'
      <net>/upsampled_flow*/kernel   <- '<net>.upsampled_flow*.weight' (transposed)
    """
    sd = _load_torch_state_dict(ckpt_path)
    params = _copy_tree(flax_params)
    for path in list(_tree_paths(params)):
        leaf = path[-1]                     # kernel | bias
        mods = path[:-1]
        transposed = any(m == "deconv" or m.startswith("upsampled_flow")
                         for m in mods)
        torch_mods = []
        for m in mods:
            if m in ("conv", "deconv"):
                torch_mods.append("0")      # Sequential wrapper index
            else:
                torch_mods.append(m)
        torch_key = ".".join(torch_mods) + (
            ".weight" if leaf == "kernel" else ".bias")
        if torch_key not in sd:
            raise KeyError(f"missing torch key {torch_key} for flax "
                           f"{'/'.join(path)}")
        w = sd[torch_key]
        if leaf == "kernel" and w.ndim == 4:
            w = convtranspose_to_hwio(w) if transposed else conv_to_hwio(w)
        _assign(params, path, w)
    return params


def import_vgg19(flax_params: Dict, ckpt_path: str) -> Dict:
    """Map torchvision vgg19 (features.N.{weight,bias}) onto Vgg19Features
    (conv_N/{kernel,bias})."""
    sd = _load_torch_state_dict(ckpt_path)
    params = _copy_tree(flax_params)
    for path in list(_tree_paths(params)):
        name, leaf = path[-2], path[-1]
        assert name.startswith("conv_"), name
        idx = name.split("_")[1]
        torch_key = f"features.{idx}." + ("weight" if leaf == "kernel" else "bias")
        w = sd[torch_key]
        if leaf == "kernel":
            w = conv_to_hwio(w)
        _assign(params, path, w)
    return params


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return np.asarray(tree)
