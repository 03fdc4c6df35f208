"""Mixed-precision policy (replaces apex AMP O0-O3, models/models.py:22-26).

On TPU the right policy is bf16 compute with f32 parameters/statistics — no
loss scaling needed (bf16 shares f32's exponent range, unlike fp16).  Layers
follow their input dtype and accumulate matmuls in f32
(preferred_element_type), and norms compute statistics in f32, so casting the
inputs and parameter leaves to bf16 at the model boundary yields bf16 MXU
throughput end-to-end.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating-point array leaves to `dtype`."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def bf16_params(variables: Any) -> Any:
    """Cast the 'params' collection to bf16, leaving batch_stats / spectral
    state in f32 (stats precision matters; the vectors are tiny anyway)."""
    out = dict(variables)
    if "params" in out:
        out["params"] = cast_floating(out["params"], jnp.bfloat16)
    return out


def compute_dtype_of(cfg) -> jnp.dtype:
    return jnp.dtype(cfg.compute_dtype)
