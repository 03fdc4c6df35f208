"""Per-sample-weight convolution ("batch conv").

The reference applies generator-produced convolution weights with a Python loop
over the batch — one cuDNN call per sample (models/networks/base_network.py:56-71),
the single worst GPU-utilization sin in the codebase (SURVEY §3.1).  On TPU the
same computation is a single grouped convolution: `jax.vmap` over the batch of
`lax.conv_general_dilated` lowers to one conv with feature_group_count=B, which
XLA tiles onto the MXU.

Weight layout here is HWIO per sample: (B, kh, kw, Cin, Cout); bias (B, Cout).
Padding follows the reference: k // 2 on each side (SAME for odd k).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def batch_conv(x: jnp.ndarray, weight: jnp.ndarray,
               bias: Optional[jnp.ndarray] = None, stride: int = 1) -> jnp.ndarray:
    """Convolve each sample with its own kernel.

    Args:
      x: (B, H, W, Cin).
      weight: (B, kh, kw, Cin, Cout) per-sample kernels.
      bias: optional (B, Cout).
      stride: spatial stride (reference batch_conv stride>=1 path).

    Returns:
      (B, H', W', Cout).
    """
    k = weight.shape[1]
    pad = k // 2

    def one(xi, wi):
        return jax.lax.conv_general_dilated(
            xi[None], wi, window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )[0]

    y = jax.vmap(one)(x, weight).astype(x.dtype)
    if bias is not None:
        y = y + bias[:, None, None, :].astype(y.dtype)
    return y


def torch_weight_to_hwio(w: jnp.ndarray) -> jnp.ndarray:
    """(B, Cout, Cin, kh, kw) -> (B, kh, kw, Cin, Cout) (reference layout adapter)."""
    return jnp.transpose(w, (0, 3, 4, 2, 1))
