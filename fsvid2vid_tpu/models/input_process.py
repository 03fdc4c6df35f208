"""Input encoding and mask derivation (reference models/input_process.py).

All functions are jit-compatible and NHWC.  Labels with label_nc > 0 arrive as
integer maps (B, H, W, 1) and are one-hot encoded (input_process.py:25-45);
pose labels (label_nc == 0) are 6-channel float maps with the DensePose part
index in channel 2, from which foreground / body-part / face masks derive
(input_process.py:52-94).
"""
from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.ops.image_ops import max_pool, avg_pool

# DensePose 25-class part ids grouped to 9 body parts (input_process.py:65)
PART_GROUPS = [[0], [1, 2], [3, 4], [5, 6], [7, 9, 8, 10], [11, 13, 12, 14],
               [15, 17, 16, 18], [19, 21, 20, 22], [23, 24]]
FACE_PART_IDS = (23, 24)


def encode_label(cfg: Config, label: jnp.ndarray) -> jnp.ndarray:
    """One-hot encode integer label maps when label_nc > 0; passthrough else.

    label: (..., H, W, 1) int or (..., H, W, C) float."""
    if cfg.label_nc == 0:
        return label
    idx = label[..., 0].astype(jnp.int32)
    return jnp.eye(cfg.label_nc, dtype=jnp.float32)[idx]


def get_fg_mask(cfg: Config, label: jnp.ndarray) -> Optional[jnp.ndarray]:
    """Foreground (human) mask for pose, dilated by a 15x15 max-pool
    (input_process.py:52-61).  label: (B, H, W, C)."""
    if not cfg.has_fg:
        return None
    mask = label[..., 2:3] if cfg.label_nc == 0 else -label[..., 0:1]
    mask = max_pool(mask, 15, 1, 7)
    return (mask > -1).astype(jnp.float32)


def combine_fg_mask(fg_mask, ref_fg_mask, has_fg: bool):
    """Union of target and reference fg masks (input_process.py:48-49)."""
    if not has_fg:
        return 1.0
    return ((fg_mask > 0) | (ref_fg_mask > 0)).astype(jnp.float32)


def get_part_mask(pose: jnp.ndarray) -> jnp.ndarray:
    """9-part body masks from the DensePose channel (input_process.py:64-80).

    pose: (..., H, W) channel 2 of the label in [-1, 1].
    Returns (..., H, W, 9)."""
    part = (pose / 2 + 0.5) * 24
    masks = []
    for group in PART_GROUPS:
        m = jnp.zeros(pose.shape, bool)
        for j in group:
            m = m | ((part > j - 0.1) & (part < j + 0.1))
        masks.append(m)
    return jnp.stack(masks, axis=-1).astype(jnp.float32)


def get_face_mask(pose: jnp.ndarray) -> jnp.ndarray:
    """Face mask (DensePose parts 23/24, input_process.py:83-94).

    pose: (..., H, W) -> (..., H, W) float."""
    part = (pose / 2 + 0.5) * 24
    m = jnp.zeros(pose.shape, bool)
    for j in FACE_PART_IDS:
        m = m | ((part > j - 0.1) & (part < j + 0.1))
    return m.astype(jnp.float32)


def use_valid_labels(cfg: Config, pose):
    """Strip densepose channels ('open' pose type) or blank the face region
    (remove_face_labels) — input_process.py:97-113.  Accepts (B,H,W,C) or
    (B,K,H,W,C); lists are mapped."""
    if not cfg.is_pose or pose is None:
        return pose
    if isinstance(pose, (list, tuple)):
        return [use_valid_labels(cfg, p) for p in pose]
    if cfg.pose_type == "open":
        return pose[..., 3:]
    if cfg.remove_face_labels:
        face = get_face_mask(pose[..., 2])[..., None]
        dp = pose[..., :3] * (1 - face) - face
        return jnp.concatenate([dp, pose[..., 3:]], axis=-1)
    return pose


def smoothed_face_mask(pose_ch2: jnp.ndarray) -> jnp.ndarray:
    """Face mask blurred with 15x15 avg pool (loss_collector.py:177-178)."""
    face = get_face_mask(pose_ch2)[..., None]
    return avg_pool(face, 15, 1, 7)
