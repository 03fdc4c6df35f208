"""Small image/compute ops shared across the framework.

Replaces: the channelnorm CUDA extension (channelnorm_kernel.cu:19-60), torch
interpolate/pooling calls (generator.py:124 nearest 2x upsample; SPADE map
resize normalization.py:42; discriminator.py:28 avg-pool pyramid;
input_process.py:59 max-pool mask dilation), and adaptive average pooling
(generator.py:248).  All NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn  # pooling helpers


def channel_norm(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Per-pixel L2 norm over channels -> (B, H, W, 1) (channelnorm ext.)."""
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                            keepdims=True) + eps).astype(x.dtype)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample by an integer factor (F.interpolate default)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest resize to (H, W) matching torch F.interpolate(mode='nearest').

    torch nearest uses floor(out_idx * in/out) source indexing.
    """
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    # Integer-ratio fast paths: floor(i * h/oh) is a strided slice (downsize)
    # or a constant-block broadcast (upsize) — XLA lowers the generic
    # constant-index gather below as a real gather, which is index-bound on
    # TPU; these paths are exact and ~free.
    if h % oh == 0 and w % ow == 0:
        return x[:, ::h // oh, :: w // ow, :]
    if oh % h == 0 and ow % w == 0:
        fy, fx = oh // h, ow // w
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, fy, w, fx, c))
        return x.reshape(b, oh, ow, c)
    ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, ys][:, :, xs]


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize, align_corners=False (torch F.interpolate bilinear)."""
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[3]),
                            method="bilinear")


def avg_pool(x: jnp.ndarray, window: int, stride: int, padding: int,
             count_include_pad: bool = True) -> jnp.ndarray:
    pads = ((padding, padding), (padding, padding))
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding=pads, count_include_pad=count_include_pad)


def max_pool(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Max pool with -inf padding (torch MaxPool2d semantics)."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pads)


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """AdaptiveAvgPool2d: mean over torch's floor/ceil bucket boundaries."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean((2, 4))
    out = jnp.zeros((b, oh, ow, c), x.dtype)
    for i in range(oh):
        y0, y1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        row = x[:, y0:y1]
        for j in range(ow):
            x0, x1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            out = out.at[:, i, j].set(row[:, :, x0:x1].mean((1, 2)))
    return out


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    """actvn (architecture.py:15-17)."""
    return jax.nn.leaky_relu(x, slope)
