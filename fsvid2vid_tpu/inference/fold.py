"""Inference-time spectral-norm folding.

At eval time the power-iteration vectors are frozen, so sigma = u @ W @ v is a
constant per kernel: the division can be applied to the stored kernels ONCE
instead of being recomputed every frame (the torch reference recomputes sigma
on every forward too — torch.nn.utils.spectral_norm pre-forward hook).

`fold_spectral_norm(variables)` divides each spectrally-normalized kernel by
its sigma and drops the 'spectral' collection; SNConv/SNDense detect the
missing collection and skip the sigma matvec + divide entirely (saving one
extra full read + write of every weight tensor per frame).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Mapping

import jax

from fsvid2vid_tpu.ops.spectral_norm import (
    conv_kernel_matrix, dense_kernel_matrix, spectral_normalize)


def _fold(params: Mapping[str, Any], spec: Mapping[str, Any]) -> Dict[str, Any]:
    if ("u" in spec and "v" in spec
            and not isinstance(spec["u"], Mapping)):  # an SN module's state
        kern = params["kernel"]
        mat = (conv_kernel_matrix(kern) if kern.ndim == 4
               else dense_kernel_matrix(kern))
        sigma, _, _ = spectral_normalize(mat, spec["u"], spec["v"],
                                         update=False)
        return dict(params, kernel=kern / sigma.astype(kern.dtype))
    out = dict(params)
    for k, sub in spec.items():
        if isinstance(sub, Mapping) and k in out:
            out[k] = _fold(out[k], sub)
    return out


def fold_spectral_norm(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Return `variables` with SN kernels pre-divided by sigma and the
    'spectral' collection removed.  Inference only — training must keep the
    live power iteration.  Runs as ONE jitted program (eager folding would
    dispatch hundreds of tiny ops — pathological through a remote-device
    tunnel)."""
    spectral = variables.get("spectral")
    if spectral is None:
        return dict(variables)

    @functools.partial(jax.jit)
    def fold(v):
        params = _fold(v["params"], v["spectral"])
        return {k: (params if k == "params" else vv)
                for k, vv in v.items() if k != "spectral"}

    return fold(dict(variables))
