"""Dynamic crop + resize as fixed-shape bilinear sampling.

The reference's face refiner crops a data-dependent, variable-size face box and
F.interpolates it to a fixed face_size (models/face_refiner.py:33-40), then
pastes the refined result back (:43-51).  Variable-size slicing is not
expressible under jit; on TPU the same computation is a scale-translate warp:
sampling the fixed-size output over a computed grid is one bilinear gather,
and the paste-back is the inverse warp masked to the box.  Both are batched and
fully differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(image, ys, xs):
    """Sample image (B,H,W,C) at float coords ys/xs (B,h,w), border clamp."""
    b, h, w, c = image.shape
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys); x0 = jnp.floor(xs)
    fy = (ys - y0)[..., None]; fx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32); x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1); x1i = jnp.minimum(x0i + 1, w - 1)
    flat = image.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(b, -1, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(*yi.shape, c)

    v00, v01 = gather(y0i, x0i), gather(y0i, x1i)
    v10, v11 = gather(y1i, x0i), gather(y1i, x1i)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11)).astype(image.dtype)


def crop_resize(image: jnp.ndarray, boxes: jnp.ndarray, out_size) -> jnp.ndarray:
    """Crop per-sample boxes and resize to out_size with bilinear sampling.

    Args:
      image: (B, H, W, C).
      boxes: (B, 4) float [ys, ye, xs, xe) in pixels (exclusive end, torch
             slice convention).
      out_size: (h, w) of the output.

    Matches F.interpolate(image[ys:ye, xs:xe], size, mode='nearest'|bilinear
    align_corners=False) source-coordinate convention:
      src = ys + (i + 0.5) * (ye - ys) / h - 0.5
    """
    b = image.shape[0]
    oh, ow = out_size
    ys, ye, xs, xe = [boxes[:, i] for i in range(4)]
    sy = (ye - ys) / oh
    sx = (xe - xs) / ow
    gi = jnp.arange(oh, dtype=jnp.float32)
    gj = jnp.arange(ow, dtype=jnp.float32)
    yy = ys[:, None] + (gi[None, :] + 0.5) * sy[:, None] - 0.5   # (B, oh)
    xx = xs[:, None] + (gj[None, :] + 0.5) * sx[:, None] - 0.5   # (B, ow)
    yy = jnp.broadcast_to(yy[:, :, None], (b, oh, ow))
    xx = jnp.broadcast_to(xx[:, None, :], (b, oh, ow))
    return _bilinear_sample(image, yy, xx)


def paste_region(canvas: jnp.ndarray, patch: jnp.ndarray,
                 boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of crop_resize: bilinear-resize patch into each sample's box.

    canvas: (B, H, W, C); patch: (B, h, w, C); boxes: (B, 4) [ys, ye, xs, xe).
    Pixels outside the box keep the canvas value.
    """
    b, h, w, c = canvas.shape
    ph, pw = patch.shape[1:3]
    ys, ye, xs, xe = [boxes[:, i] for i in range(4)]
    gi = jnp.arange(h, dtype=jnp.float32)
    gj = jnp.arange(w, dtype=jnp.float32)
    # map canvas pixel -> patch coordinate (inverse of crop_resize mapping)
    py = (gi[None, :] - ys[:, None] + 0.5) * (ph / (ye - ys))[:, None] - 0.5
    px = (gj[None, :] - xs[:, None] + 0.5) * (pw / (xe - xs))[:, None] - 0.5
    py_b = jnp.broadcast_to(py[:, :, None], (b, h, w))
    px_b = jnp.broadcast_to(px[:, None, :], (b, h, w))
    resized = _bilinear_sample(patch, py_b, px_b)
    inside = ((gi[None, :, None] >= ys[:, None, None])
              & (gi[None, :, None] < ye[:, None, None])
              & (gj[None, None, :] >= xs[:, None, None])
              & (gj[None, None, :] < xe[:, None, None]))
    return jnp.where(inside[..., None], resized, canvas)
