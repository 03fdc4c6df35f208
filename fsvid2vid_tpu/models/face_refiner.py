"""Face-region cropping and refinement (reference models/face_refiner.py).

The reference computes a data-dependent, variable-size face bounding box with
`.nonzero()` and Python ints (face_refiner.py:54-86) — not expressible under
jit.  Here the box is computed with masked min/max reductions and the crop /
paste run as fixed-shape bilinear sampling (ops/crop.py), so the whole face
pipeline stays inside the compiled step.
"""
from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.ops.crop import crop_resize, paste_region


def face_size_of(cfg: Config) -> int:
    return int(cfg.fine_size / cfg.aspect_ratio) // 4  # face_refiner.py:21


def get_face_boxes(cfg: Config, pose: jnp.ndarray,
                   crop_smaller: int = 0) -> jnp.ndarray:
    """Per-sample face boxes [ys, ye, xs, xe) (face_refiner.py:54-86).

    pose: (B, H, W, C) label map.  Uses openpose face channels (last 3 > 0)
    unless basic_point_only/remove_face_labels, else DensePose channel 2 > 0.9.
    """
    b, h, w, _ = pose.shape
    use_openpose = not cfg.basic_point_only and not cfg.remove_face_labels
    if use_openpose:
        cond = (pose[..., -3] > 0) & (pose[..., -2] > 0) & (pose[..., -1] > 0)
    else:
        cond = pose[..., 2] > 0.9

    yy = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    big = jnp.float32(1e9)
    ys = jnp.where(cond, yy, big).min((1, 2))
    ye = jnp.where(cond, yy, -big).max((1, 2))
    xs = jnp.where(cond, xx, big).min((1, 2))
    xe = jnp.where(cond, xx, -big).max((1, 2))
    has_face = cond.any((1, 2))

    if use_openpose:
        xc = jnp.floor((xs + xe) / 2)
        yc = jnp.floor((ys * 3 + ye * 2) / 5)
        ylen = jnp.floor((xe - xs) * 2.5)
    else:
        xc = jnp.floor((xs + xe) / 2)
        yc = jnp.floor((ys + ye) / 2)
        ylen = jnp.floor((ye - ys) * 1.25)
    ylen = jnp.minimum(float(w), jnp.maximum(32.0, ylen))
    yc = jnp.clip(yc, ylen // 2, (h - 1) - ylen // 2)
    xc = jnp.clip(xc, ylen // 2, (w - 1) - ylen // 2)

    # fallback box when no face pixels (face_refiner.py:77-80)
    fb_len = float(h // 32 * 8)
    yc = jnp.where(has_face, yc, float(h // 4))
    xc = jnp.where(has_face, xc, float(w // 2))
    ylen = jnp.where(has_face, ylen, fb_len)

    half = ylen // 2
    boxes = jnp.stack([yc - half, yc + half, xc - half, xc + half], axis=1)
    if crop_smaller:
        cs = float(crop_smaller)
        boxes = boxes + jnp.asarray([cs, -cs, cs, -cs])
    return boxes


def crop_face_region(cfg: Config, image, input_label: jnp.ndarray,
                     crop_smaller: int = 0, boxes=None):
    """Crop the face box (of the LAST 3 channels) and resize to face_size
    (face_refiner.py:33-40).  image may be a list.  `boxes` lets callers that
    crop/paste repeatedly reuse one box computation (the box reduction scans
    the full-res label)."""
    if isinstance(image, (list, tuple)):
        if boxes is None:
            boxes = get_face_boxes(cfg, input_label, crop_smaller)
        return [crop_face_region(cfg, im, input_label, crop_smaller, boxes)
                for im in image]
    fs = face_size_of(cfg)
    if boxes is None:
        boxes = get_face_boxes(cfg, input_label, crop_smaller)
    return crop_resize(image[..., -3:], boxes, (fs, fs))


def replace_face_region(cfg: Config, fake_image, fake_face, input_label,
                        fake_face_coarse=None, crop_smaller: int = 0,
                        boxes=None):
    """Paste the refined face back, clamped to [-1, 1] (face_refiner.py:43-51)."""
    if boxes is None:
        boxes = get_face_boxes(cfg, input_label, crop_smaller)
    face = fake_face + (fake_face_coarse if fake_face_coarse is not None else 0)
    face = jnp.clip(face, -1.0, 1.0)
    return paste_region(fake_image, face, boxes)


def refine_face_region(cfg: Config, netGf_apply, label_valid, fake_image,
                       label, ref_label_valid, ref_image, ref_label):
    """Full refinement: crop label/coarse/ref faces, run the face generator on
    the coarse result, paste back (face_refiner.py:24-29).

    netGf_apply(label_face, ref_label_face, ref_img_face, img_coarse) -> face.
    """
    boxes = get_face_boxes(cfg, label, crop_smaller=4)
    label_face, coarse_face = crop_face_region(
        cfg, [label_valid, fake_image], label, crop_smaller=4, boxes=boxes)
    ref_label_face, ref_img_face = crop_face_region(
        cfg, [ref_label_valid, ref_image], ref_label, crop_smaller=4)
    coarse_face = jax.lax.stop_gradient(coarse_face)
    fake_face = netGf_apply(label_face, ref_label_face[:, None],
                            ref_img_face[:, None], coarse_face)
    return replace_face_region(cfg, fake_image, fake_face, label,
                               coarse_face, crop_smaller=4, boxes=boxes)
