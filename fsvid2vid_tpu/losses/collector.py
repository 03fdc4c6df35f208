"""Loss assembly (reference models/loss_collector.py), as pure functions.

The torch LossCollector is a stateful module; here every loss is a pure
function of (config, apply-closures, arrays) so the whole assembly jits into
the train step.  Frame chunks are single frames (n_frames_per_gpu == 1, the
only value the reference supports — base_options.py:75); the temporal GAN loss
consumes channel-stacked previous frames from the prevs ring buffer.

Loss names follow loss_collector.py:42-45.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.losses.gan import (
    gan_loss, feature_matching_loss, masked_l1_loss, l1_loss)
from fsvid2vid_tpu.models.face_refiner import crop_face_region
from fsvid2vid_tpu.models.input_process import (
    combine_fg_mask, get_fg_mask, get_part_mask, smoothed_face_mask,
    use_valid_labels)
from fsvid2vid_tpu.models.vgg import VGG_LOSS_WEIGHTS
from fsvid2vid_tpu.ops.warp import flow_warp

Array = jnp.ndarray

G_LOSS_NAMES = ["G_GAN", "G_GAN_Feat", "G_VGG", "Gf_GAN", "Gf_GAN_Feat",
                "GT_GAN", "GT_GAN_Feat", "F_Flow", "F_Warp", "F_Mask"]
D_LOSS_NAMES = ["D_real", "D_fake", "Df_real", "Df_fake", "DT_real", "DT_fake"]


def divide_pred(pred):
    """Split a fake-concat-real discriminator output (base_model.py:141-147)."""
    if isinstance(pred, list):
        fake = [[t[:t.shape[0] // 2] for t in p] for p in pred]
        real = [[t[t.shape[0] // 2:] for t in p] for p in pred]
        return fake, real
    half = pred.shape[0] // 2
    return pred[:half], pred[half:]


def discriminate(cfg: Config, apply_D: Callable, tgt_label, fake_image,
                 tgt_image, ref_image, for_discriminator: bool):
    """Run D on fake‖real concat (loss_collector.py:47-68).

    Returns [D_real, D_fake] or [G_GAN, G_GAN_Feat]."""
    tgt_concat = jnp.concatenate([fake_image, tgt_image], axis=0)
    if tgt_label is not None:
        lbl = jnp.concatenate([tgt_label, tgt_label], axis=0)
        tgt_concat = jnp.concatenate([lbl, tgt_concat], axis=-1)
    ref_arg = None
    if ref_image is not None:
        ref2 = jnp.concatenate([ref_image, ref_image], axis=0)
        if cfg.concat_ref_for_D:
            tgt_concat = jnp.concatenate([ref2, tgt_concat], axis=-1)
        else:
            ref_arg = ref2
    out = apply_D(tgt_concat, ref_arg)
    pred_fake, pred_real = divide_pred(out)
    if for_discriminator:
        return [gan_loss(pred_real, True, cfg.gan_mode, True),
                gan_loss(pred_fake, False, cfg.gan_mode, True)]
    # The reference calls criterionGAN(pred_fake, True) with the DEFAULT
    # for_discriminator=True (loss_collector.py:66), so under hinge the
    # generator loss is mean(relu(1 - x)) — the saturating discriminator-real
    # hinge — NOT the SPADE-style -mean(x).  Verified against the torch
    # reference step-for-step (scripts/convergence_check.py); gradients
    # vanish for x > 1, which changes GAN dynamics, so parity requires
    # reproducing the quirk.
    loss_G = gan_loss(pred_fake, True, cfg.gan_mode, True)
    loss_feat = 0.0
    if not cfg.no_ganFeat_loss:
        loss_feat = feature_matching_loss(pred_real, pred_fake, cfg.lambda_feat)
    return [loss_G, loss_feat]


def discriminate_face(cfg: Config, apply_Df, vgg_apply, fake_image, tgt_label,
                      tgt_image, ref_label, ref_image, for_discriminator):
    """Face-region GAN (+ L1 + VGG for G) losses (loss_collector.py:70-85)."""
    if not cfg.add_face_D:
        z = jnp.float32(0.0)
        return [z, z]
    real_region, fake_region = crop_face_region(
        cfg, [tgt_image, fake_image], tgt_label)
    ref_region = crop_face_region(cfg, ref_image, ref_label)
    losses = discriminate(cfg, apply_Df, ref_region, fake_region, real_region,
                          None, for_discriminator)
    losses = [l * cfg.lambda_face for l in losses]
    if for_discriminator:
        return losses
    loss_Gf, loss_Gf_feat = losses
    loss_Gf_feat += l1_loss(fake_region, real_region) * cfg.lambda_feat
    if not cfg.no_vgg_loss and vgg_apply is not None:
        loss_Gf_feat += vgg_perceptual(vgg_apply, fake_region,
                                       real_region) * cfg.lambda_vgg
    return [loss_Gf, loss_Gf_feat]


def compute_gan_losses(cfg: Config, applies: Dict[str, Callable], tgt_label,
                       tgt_image, fake_image, ref_label, ref_image,
                       for_discriminator: bool, for_temporal: bool = False,
                       temporal_active: bool = False):
    """Main + face (or temporal) GAN losses (loss_collector.py:87-120).

    fake_image/tgt_image may be [main, raw] pairs (raw may be None); losses sum
    over the pair (loss_collector.py:92-96)."""
    if for_temporal and not temporal_active:
        z = jnp.float32(0.0)
        return [z, z]
    if isinstance(fake_image, list):
        pairs = [(f, r) for f, r in zip(fake_image, tgt_image) if f is not None]
        results = [compute_gan_losses(cfg, applies, tgt_label, r, f, ref_label,
                                      ref_image, for_discriminator,
                                      for_temporal, temporal_active)
                   for f, r in pairs]
        return [sum(item[i] for item in results) for i in range(len(results[0]))]

    input_label = ref_concat = None
    if not for_temporal:
        input_label = use_valid_labels(cfg, tgt_label)
        ref_lbl = ref_label
        if cfg.concat_fg_mask_for_D:
            fg_mask = get_fg_mask(cfg, tgt_label)
            ref_fg_mask = get_fg_mask(cfg, ref_label)
            input_label = jnp.concatenate([input_label, fg_mask], axis=-1)
            ref_lbl = jnp.concatenate([ref_lbl, ref_fg_mask], axis=-1)
        ref_concat = jnp.concatenate([ref_lbl, ref_image], axis=-1)

    apply_D = applies["DT"] if for_temporal else applies["D"]
    losses = discriminate(cfg, apply_D, input_label, fake_image, tgt_image,
                          ref_concat, for_discriminator)
    if for_temporal:
        if not for_discriminator:
            losses = [l * cfg.lambda_temp for l in losses]
        return losses
    losses_face = discriminate_face(
        cfg, applies.get("Df"), applies.get("vgg"), fake_image, tgt_label,
        tgt_image, ref_label, ref_image, for_discriminator)
    return losses + losses_face


def vgg_perceptual(vgg_apply: Callable, x: Array, y: Array) -> Array:
    """Weighted L1 over VGG activations (loss.py:107-128)."""
    x_f = vgg_apply(x)
    y_f = vgg_apply(y)
    loss = 0.0
    for w, xf, yf in zip(VGG_LOSS_WEIGHTS, x_f, y_f):
        loss += w * jnp.mean(jnp.abs(xf - jax.lax.stop_gradient(yf)))
    return loss


def compute_vgg_losses(cfg: Config, vgg_apply, fake_image, fake_raw_image,
                       tgt_image, fg_mask_union) -> Array:
    """loss_collector.py:122-130."""
    if cfg.no_vgg_loss or vgg_apply is None:
        return jnp.float32(0.0)
    loss = vgg_perceptual(vgg_apply, fake_image, tgt_image)
    if fake_raw_image is not None:
        loss += vgg_perceptual(vgg_apply, fake_raw_image,
                               tgt_image * fg_mask_union)
    return loss * cfg.lambda_vgg


def _flow_loss_single(cfg: Config, flow, warped, tgt_image, flow_gt, conf_gt,
                      fg_mask):
    """loss_collector.py:156-162."""
    z = jnp.float32(0.0)
    if flow is None or not cfg.is_train:  # gated at inference (lc.py:158)
        return z, z
    loss_flow = z
    if flow_gt is not None and cfg.n_shot == 1:
        mask = conf_gt * fg_mask if fg_mask is not None else conf_gt
        loss_flow = masked_l1_loss(flow, flow_gt, mask)
    loss_warp = l1_loss(warped, tgt_image)
    return loss_flow, loss_warp


def compute_flow_losses(cfg: Config, flow, warped_image, tgt_image, flow_gt,
                        conf_gt, fg_mask, tgt_label, ref_label):
    """Flow supervision vs the teacher + warp reconstruction + pose body-part
    warp consistency (loss_collector.py:132-154).

    flow/warped_image: [ref, prev] entries (None if absent); flow_gt/conf_gt
    likewise.  Returns (loss_flow, loss_warp, body_mask_diff)."""
    lf_r, lw_r = _flow_loss_single(cfg, flow[0], warped_image[0], tgt_image,
                                   flow_gt[0], conf_gt[0], fg_mask)
    lf_p, lw_p = _flow_loss_single(cfg, flow[1], warped_image[1], tgt_image,
                                   flow_gt[1], conf_gt[1], fg_mask)
    loss_flow = lf_r + lf_p
    loss_warp = lw_r + lw_p

    body_mask_diff = None
    if cfg.is_train and cfg.is_pose and flow[0] is not None:
        body_mask = get_part_mask(tgt_label[..., 2])
        ref_body_mask = get_part_mask(ref_label[..., 2])
        ref_body_mask_warp = flow_warp(ref_body_mask, flow[0])
        loss_warp += l1_loss(ref_body_mask_warp, body_mask)
        if cfg.has_fg:
            fg = get_fg_mask(cfg, tgt_label)
            ref_fg = get_fg_mask(cfg, ref_label)
            ref_fg_warp = flow_warp(ref_fg, flow[0])
            loss_warp += l1_loss(ref_fg_warp, fg)
        body_mask_diff = jnp.sum(jnp.abs(ref_body_mask_warp - body_mask),
                                 axis=-1, keepdims=True)
    return loss_flow * cfg.lambda_flow, loss_warp * cfg.lambda_flow, body_mask_diff


def _mask_loss_single(flow_mask, warped, tgt_image):
    """Occlusion-mask confidence loss (loss_collector.py:190-204)."""
    if flow_mask is None:
        return jnp.float32(0.0)
    img_diff = jnp.sum(jnp.abs(warped - tgt_image), axis=-1, keepdims=True)
    conf = jnp.clip(1 - img_diff, 0.0, 1.0)
    loss = masked_l1_loss(flow_mask, jnp.zeros_like(flow_mask), conf)
    loss += masked_l1_loss(flow_mask, jnp.ones_like(flow_mask), 1 - conf)
    return loss


def compute_mask_losses(cfg: Config, flow_mask, fake_image, warped_image,
                        tgt_label, tgt_image, fake_raw_image, fg_mask,
                        ref_fg_mask, body_mask_diff):
    """loss_collector.py:164-188."""
    if not cfg.is_train:  # gated at inference (loss_collector.py:192)
        return jnp.float32(0.0)
    loss = _mask_loss_single(flow_mask[0], warped_image[0], tgt_image)
    loss += _mask_loss_single(flow_mask[1], warped_image[1], tgt_image)

    if cfg.is_train and cfg.is_pose and cfg.warp_ref and flow_mask[0] is not None:
        mask_ref = flow_mask[0]
        zeros = jnp.zeros_like(mask_ref)
        ones = jnp.ones_like(mask_ref)
        face_mask = smoothed_face_mask(tgt_label[..., 2])
        # face region should come from the warped reference
        loss += masked_l1_loss(mask_ref, zeros, face_mask)
        if cfg.spade_combine:
            loss += masked_l1_loss(
                fake_image, jax.lax.stop_gradient(warped_image[0]), face_mask)
        # disocclusion should come from the hallucinated image
        fg_mask_diff = ((ref_fg_mask - fg_mask) > 0).astype(jnp.float32)
        loss += masked_l1_loss(mask_ref, ones, fg_mask_diff)
        loss += masked_l1_loss(mask_ref, ones, body_mask_diff)
    return loss * cfg.lambda_mask
