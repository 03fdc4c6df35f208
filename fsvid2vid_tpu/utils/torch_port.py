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


# Any torchvision `<arch>.features` CNN (vgg16/vgg19/...) maps identically:
# features.N.{weight,bias} -> conv_N/{kernel,bias}.
import_vgg_features = import_vgg19


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return np.asarray(tree)


# ---------------------------------------------------------------------------
# FewShotGenerator checkpoint import (reference {epoch}_net_G.pth layout,
# base_model.py:219-227) -> flax variables {'params','spectral','batch_stats'}
# ---------------------------------------------------------------------------

def linear_to_io(w: np.ndarray) -> np.ndarray:
    return w.T


def _generator_torch_key(mods, leaf, cfg) -> str:
    """Map a flax module path inside FewShotGenerator to the torch key prefix.

    Handles: fc weight-gen stacks (Sequential indices 2k / 2*n_fc_layers),
    LabelEmbedder Sequential wrappers (conv at .0 for first/down, .1 for up),
    FlowGenerator's flat Sequentials (down_flow/res_flow/up_flow indexing),
    and the plain attribute-named modules which match 1:1.
    """
    mods = list(mods)
    out = []
    i = 0
    while i < len(mods):
        m = mods[i]
        # --- weight-generation fc stacks: fc_<kind>_<layer>_l<k> | _out ---
        suffix_tok = m.rsplit("_", 1)[-1]
        if m.startswith(("fc_spade_", "fc_conv_")) and (
                (suffix_tok.startswith("l") and suffix_tok[1:].isdigit())
                or suffix_tok == "out"):
            base, suffix = m.rsplit("_", 1)
            if suffix == "out":
                idx = 2 * cfg.n_fc_layers
            else:
                idx = 2 * int(suffix[1:])
            out.append(f"{base}.{idx}")
            i += 1
            continue
        # --- embedders: Sequential wrapper indices ---
        if m in ("label_embedding", "img_ref_embedding", "img_prev_embedding"):
            out.append(m)
            nxt = mods[i + 1]
            if nxt == "conv_first" or nxt.startswith("down_"):
                out.append(f"{nxt}.0")
            elif nxt.startswith("up_"):
                out.append(f"{nxt}.1")  # [Upsample, Conv, act]
            else:
                out.append(nxt)
            i += 2
            continue
        # --- flow generators: flat Sequential layouts ---
        if m in ("flow_network_ref", "flow_network_temp"):
            out.append(m)
            nxt = mods[i + 1]
            nf = cfg.n_downsample_F
            if nxt == "down_first_conv":
                out.append("down_flow.0.0")
            elif nxt == "down_first_norm":
                out.append("down_flow.0.1")
            elif nxt.startswith("down_") and nxt.endswith("_conv"):
                j = int(nxt.split("_")[1])
                out.append(f"down_flow.{2 * (j + 1)}.0")
            elif nxt.startswith("down_") and nxt.endswith("_norm"):
                j = int(nxt.split("_")[1])
                out.append(f"down_flow.{2 * (j + 1)}.1")
            elif nxt.startswith("res_"):
                j = int(nxt.split("_")[1])
                out.append(f"res_flow.{j}")
            elif nxt.startswith("up_") and nxt.endswith("_conv"):
                j = int(nxt.split("_")[1])
                out.append(f"up_flow.{3 * (nf - 1 - j) + 1}.0")
            elif nxt.startswith("up_") and nxt.endswith("_norm"):
                j = int(nxt.split("_")[1])
                out.append(f"up_flow.{3 * (nf - 1 - j) + 1}.1")
            elif nxt == "conv_flow":
                out.append("conv_flow.0")
            elif nxt == "conv_mask":
                out.append("conv_mask.0")
            else:
                out.append(nxt)
            i += 2
            continue
        if m == "fc_kld":
            out.append("fc")  # generator.py:144 names it 'fc'
            i += 1
            continue
        out.append(m)
        i += 1
    return ".".join(out)


_LEAF_MAP = {
    "bias": (".bias",), "scale": (".weight",),
    "kernel": (".weight_orig", ".weight"),
    "mean": (".running_mean",), "var": (".running_var",),
    "u": (".weight_u",), "v": (".weight_v",),
}


def import_fewshot_generator(variables: Dict, ckpt_path_or_sd, cfg) -> Dict:
    """Import a torch FewShotGenerator state_dict into flax variables
    (all three collections).  Unmatched flax leaves raise; unused torch keys
    are tolerated (e.g. num_batches_tracked)."""
    if isinstance(ckpt_path_or_sd, str):
        sd = _load_torch_state_dict(ckpt_path_or_sd)
    else:
        sd = {k: np.asarray(v) for k, v in ckpt_path_or_sd.items()}
    out = _copy_tree(variables)
    for coll in ("params", "spectral", "batch_stats"):
        if coll not in out:
            continue
        for path in list(_tree_paths(out[coll])):
            mods, leaf = path[:-1], path[-1]
            prefix = _generator_torch_key(mods, leaf, cfg)
            for suffix in _LEAF_MAP[leaf]:
                key = prefix + suffix
                if key in sd:
                    break
            else:
                raise KeyError(f"no torch key for flax {coll}/"
                               f"{'/'.join(path)} (tried prefix {prefix})")
            w = sd[key]
            if leaf == "kernel":
                w = conv_to_hwio(w) if w.ndim == 4 else linear_to_io(w)
            _assign(out[coll], path, w)
    return out


def import_discriminator(flax_variables: Dict, ckpt_path_or_sd) -> Dict:
    """Import a torch MultiscaleDiscriminator state_dict
    ({epoch}_net_{D,Df,DT}.pth) into flax variables.

    torch layout: discriminator_K.modelN = Sequential[conv(, norm), leaky]
    -> flax discriminator_K/modelN_conv + modelN_norm."""
    if isinstance(ckpt_path_or_sd, str):
        sd = _load_torch_state_dict(ckpt_path_or_sd)
    else:
        sd = {k: np.asarray(v) for k, v in ckpt_path_or_sd.items()}
    out = _copy_tree(flax_variables)
    for coll in ("params", "spectral", "batch_stats"):
        if coll not in out:
            continue
        for path in list(_tree_paths(out[coll])):
            mods, leaf = list(path[:-1]), path[-1]
            # torch: modelN = Sequential[Sequential[sn(conv), norm], leaky]
            # for middle layers, Sequential[conv, leaky] for first/last
            torch_mods = []
            for m in mods:
                if m.endswith("_conv"):
                    base = ".".join(torch_mods + [m[:-5]])
                    if any(k.startswith(base + ".0.0.") for k in sd):
                        torch_mods.append(m[:-5] + ".0.0")
                    else:
                        torch_mods.append(m[:-5] + ".0")
                elif m.endswith("_norm"):
                    torch_mods.append(m[:-5] + ".0.1")
                else:
                    torch_mods.append(m)
            prefix = ".".join(torch_mods)
            for suffix in _LEAF_MAP[leaf]:
                key = prefix + suffix
                if key in sd:
                    break
            else:
                raise KeyError(f"no torch key for flax {coll}/"
                               f"{'/'.join(path)} (tried prefix {prefix})")
            w = sd[key]
            if leaf == "kernel":
                w = conv_to_hwio(w) if w.ndim == 4 else linear_to_io(w)
            _assign(out[coll], path, w)
    return out
