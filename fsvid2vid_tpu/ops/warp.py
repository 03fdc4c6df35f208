"""Bilinear flow warping (backward warping / resampling).

TPU-native equivalent of the reference's two warp implementations:
  * the generator-side `resample` built on `F.grid_sample(mode='bilinear',
    padding_mode='border', align_corners=True)` with flow given in pixels and
    normalized by (W-1)/2, (H-1)/2 at the callsite
    (models/networks/base_network.py:28-37), and
  * the FlowNet2 `Resample2d` CUDA kernel (resample2d_kernel.cu:16-62), which
    computes out(x,y) = bilinear(image, (x + u(x,y), y + v(x,y))) with border
    clamping, including gradients w.r.t. both image and flow.

Both reduce to the same pixel-space semantics, implemented here once:
  X = clip(x + u, 0, W-1), Y = clip(y + v, 0, H-1)
  out = (1-fx)(1-fy) I[Y0,X0] + fx(1-fy) I[Y0,X1] + (1-fx)fy I[Y1,X0] + fx fy I[Y1,X1]

The bilinear weights are differentiable w.r.t. the flow and the gather is
differentiable w.r.t. the image (scatter-add in the VJP), so plain JAX autodiff
reproduces the CUDA kernels' analytic gradients.  Layout is NHWC (TPU-friendly).

TPU performance note: XLA point gathers are index-bound (~6 ms per 2M indices
on v5e, measured), so instead of four corner gathers this op builds an
edge-replicated 2x2-patch image (4C channels, four cheap shifted copies) and
fetches all four corners with ONE gather at (y0, x0) — 4x fewer indices.  Edge
replication reproduces the x1 = min(x0+1, W-1) border clamp exactly.
Batched inputs run as per-image B=1 gathers (unrolled at trace time): the
per-row fetch cost against a single-image table is ~5.2 ns vs ~9-12 ns for
flattened/batched tables (scripts/warp_opt_bench.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp `image` by `flow`.

    Args:
      image: (B, H, W, C) source image.
      flow:  (B, H, W, 2) pixel-space flow; flow[..., 0] = horizontal (x / width)
             displacement u, flow[..., 1] = vertical v — matching the channel
             order of the reference (base_network.py:31: channel 0 divided by
             the width scale).

    Returns:
      (B, H, W, C) image sampled at (x + u, y + v) with border clamping.
    """
    b, h, w, c = image.shape
    if 1 < b <= 8:
        # Per-image B=1 gathers: XLA's point gather costs ~5.2 ns/row against
        # a single-image table vs ~9.1 flattened across the batch and ~12
        # batched (scripts/warp_opt_bench.py on v5e) — the smaller table
        # roughly halves the per-row fetch cost, and the unrolled gathers
        # pipeline.  Exact same math; trace-time unroll.  Capped at b<=8:
        # larger batches (e.g. the reference's bs30 pose config under GSPMD,
        # or FlowNet2's internal warps at batch*frames) keep the single
        # batched gather — unrolling there multiplies gather/scatter HLO in
        # the backward and compile time faster than it saves fetch cost.
        return jnp.concatenate(
            [flow_warp(image[i:i + 1], flow[i:i + 1]) for i in range(b)], 0)
    dtype = image.dtype
    fl = flow.astype(jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    x = jnp.clip(xs + fl[..., 0], 0.0, w - 1.0)
    y = jnp.clip(ys + fl[..., 1], 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # 2x2 patch image: channels [I(y,x), I(y,x+1), I(y+1,x), I(y+1,x+1)]
    # with edge replication (== the min(idx+1, dim-1) corner clamp).
    right = jnp.concatenate([image[:, :, 1:], image[:, :, -1:]], axis=2)
    row0 = jnp.concatenate([image, right], axis=-1)          # (b,h,w,2c)
    row1 = jnp.concatenate([row0[:, 1:], row0[:, -1:]], axis=1)
    patches = jnp.concatenate([row0, row1], axis=-1).reshape(b, h * w, 4 * c)

    idx = (y0i * w + x0i).reshape(b, h * w, 1)
    v = jnp.take_along_axis(patches, idx, axis=1).reshape(b, h, w, 4, c)

    fx = fx[..., None].astype(dtype)
    fy = fy[..., None].astype(dtype)
    one = jnp.asarray(1.0, dtype)
    out = ((one - fy) * ((one - fx) * v[..., 0, :] + fx * v[..., 1, :])
           + fy * ((one - fx) * v[..., 2, :] + fx * v[..., 3, :]))
    return out


def flow_warp_nchw(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """NCHW wrapper with flow shaped (B, 2, H, W) — the reference's layout."""
    out = flow_warp(jnp.transpose(image, (0, 2, 3, 1)),
                    jnp.transpose(flow, (0, 2, 3, 1)))
    return jnp.transpose(out, (0, 3, 1, 2))
