"""Per-sample-weight convolution ("batch conv").

The reference applies generator-produced convolution weights with a Python loop
over the batch — one cuDNN call per sample (models/networks/base_network.py:56-71),
the single worst GPU-utilization sin in the codebase (SURVEY §3.1).

Here the same computation is a batched matmul: extract k x k patches once and
contract each sample's patch matrix with its own (k*k*Cin, Cout) weight matrix
via einsum.  This maps directly onto the MXU, and — unlike a vmapped grouped
conv, which folds the batch into feature groups — keeps the batch dimension a
plain batch dimension, so GSPMD shards it over the data axis with no
repartitioning.  For the dominant k == 1 case (spade_ks = embed_ks = 1 in every
shipped config) it reduces to a single einsum with zero patch overhead.

Weight layout HWIO per sample: (B, kh, kw, Cin, Cout); bias (B, Cout).
Padding follows the reference: k // 2 on each side.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _extract_patches(x: jnp.ndarray, k: int, stride: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H', W', k*k*C) patches, padding k//2.

    Channel ordering of the patch axis is (c, ky, kx) — matching
    conv_general_dilated_patches — so weights must be flattened the same way.
    """
    b = x.shape[0]
    pad = k // 2
    patches = jax.lax.conv_general_dilated_patches(
        jnp.transpose(x, (0, 3, 1, 2)),
        filter_shape=(k, k), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)))
    # (B, C*k*k, H', W') with (c, ky, kx) channel-major ordering
    return jnp.transpose(patches, (0, 2, 3, 1))


def batch_conv(x: jnp.ndarray, weight: jnp.ndarray,
               bias: Optional[jnp.ndarray] = None, stride: int = 1) -> jnp.ndarray:
    """Convolve each sample with its own kernel.

    Args:
      x: (B, H, W, Cin).
      weight: (B, kh, kw, Cin, Cout) per-sample kernels.
      bias: optional (B, Cout).
      stride: spatial stride.

    Returns:
      (B, H', W', Cout).
    """
    b, kh, kw, cin, cout = weight.shape
    k = kh
    if k == 1 and stride == 1:
        y = jnp.einsum("bhwi,bio->bhwo", x, weight[:, 0, 0].astype(x.dtype))
    else:
        patches = _extract_patches(x, k, stride)
        # weight -> (B, Cin*k*k, Cout) in (c, ky, kx) patch order
        w = jnp.transpose(weight, (0, 3, 1, 2, 4)).reshape(b, cin * k * k, cout)
        y = jnp.einsum("bhwp,bpo->bhwo", patches, w.astype(x.dtype))
    if bias is not None:
        y = y + bias[:, None, None, :].astype(y.dtype)
    return y


def torch_weight_to_hwio(w: jnp.ndarray) -> jnp.ndarray:
    """(B, Cout, Cin, kh, kw) -> (B, kh, kw, Cin, Cout) (reference layout adapter)."""
    return jnp.transpose(w, (0, 3, 4, 2, 1))
