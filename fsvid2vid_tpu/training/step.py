"""Jitted alternating D/G training step (reference train.py:44-62 +
vid2vid_model.forward_generator/forward_discriminator + loss_backward).

One call processes one frame chunk (n_frames_per_gpu == 1): discriminator
update on no-grad generations, then generator update, then the detached prevs
ring-buffer advance (truncated BPTT, vid2vid_model.py:169-176).  Everything —
both forwards, all losses including the face-crop pipeline, both optimizer
updates — is one XLA program; under a sharded batch the gradient psums ride
ICI automatically.

Static flags (traced as Python bools -> separate jit specializations, two of
each at most):
  * warp_prev: temporal phase active (epoch > niter_single)
  * has_prev:  prevs buffer is populated (t > 0 within the sequence)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.losses import collector as lc
from fsvid2vid_tpu.losses.gan import kld_loss
from fsvid2vid_tpu.models.face_refiner import refine_face_region
from fsvid2vid_tpu.models.input_process import (
    combine_fg_mask, get_fg_mask, use_valid_labels)
from fsvid2vid_tpu.models.generator import pick_ref
from fsvid2vid_tpu.parallel.precision import cast_floating
from fsvid2vid_tpu.training.state import (
    ModelBundle, TrainState, make_optimizers)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class StepFlags:
    warp_prev: bool = False   # temporal phase (epoch > niter_single)
    has_prev: bool = False    # prevs populated (t > 0)
    use_pool: bool = False    # D sees replay-pool fakes (cfg.pool_size > 0);
    # batch must then carry pool_fake (B,H,W,3) + pool_mask (B,1,1,1) bool

    @property
    def temporal_active(self) -> bool:
        return self.warp_prev and self.has_prev


def init_prevs(cfg: Config, batch) -> Dict[str, Array]:
    """Zero prevs buffers: (B, H, W, (n_frames_G-1) * C) label / image stacks
    plus tD-1 frames of real/fake history for the temporal D."""
    label = batch["tgt_label"]
    b, h, w = label.shape[0], label.shape[1], label.shape[2]
    cl = _valid_label_nc(cfg, label.shape[-1] if cfg.label_nc == 0 else cfg.label_nc)
    n = cfg.n_frames_G - 1
    return {
        "label": jnp.zeros((b, h, w, cl * n), label.dtype),
        "real": jnp.zeros((b, h, w, 3 * n), jnp.float32),
        "fake": jnp.zeros((b, h, w, 3 * n), jnp.float32),
    }


def _valid_label_nc(cfg: Config, label_nc: int) -> int:
    if cfg.is_pose and cfg.pose_type == "open":
        return label_nc - 3
    return label_nc


def advance_prevs(cfg: Config, prevs, tgt_label_valid, tgt_image, fake_image):
    """Detached ring-buffer advance (concat_prev, vid2vid_model.py:169-176)."""
    def roll(buf, new):
        c = new.shape[-1]
        if buf.shape[-1] == c:  # n_frames_G == 2: buffer holds one frame
            out = new
        else:
            out = jnp.concatenate([buf[..., c:], new], axis=-1)
        return jax.lax.stop_gradient(out)
    return {
        "label": roll(prevs["label"], tgt_label_valid),
        "real": roll(prevs["real"], tgt_image),
        "fake": roll(prevs["fake"], fake_image),
    }


# ----------------------------------------------------------------------
# forward helpers
# ----------------------------------------------------------------------

def _applies_for_D(models: ModelBundle, params_D, aux_D, train: bool,
                   collect_aux: bool):
    """Build apply closures for each discriminator.  When collect_aux, mutated
    collections are gathered into the returned dict."""
    new_aux = {}

    def make(net, key):
        if net is None:
            return None
        def apply_fn(x, ref=None):
            variables = {"params": params_D[key], **aux_D.get(key, {})}
            if key == "D":
                out, mut = net.apply(variables, x, ref, train=train,
                                     mutable=["spectral", "batch_stats"])
            else:
                out, mut = net.apply(variables, x, train=train,
                                     mutable=["spectral", "batch_stats"])
            if collect_aux:
                new_aux[key] = mut
            return out
        return apply_fn
    applies = {"D": make(models.netD, "D"), "DT": make(models.netDT, "DT"),
               "Df": make(models.netDf, "Df")}
    return applies, new_aux


def _vgg_apply(models: ModelBundle, vgg_params, remat: bool = False):
    if models.vgg is None or vgg_params is None:
        return None
    def apply_fn(x):
        return models.vgg.apply({"params": vgg_params}, x)
    # frozen feature net: recomputing its activations in the backward is
    # nearly free relative to holding ~10 full-res feature maps
    return jax.checkpoint(apply_fn) if remat else apply_fn


def generate_images(cfg: Config, models: ModelBundle, params_G, aux_G,
                    batch, prevs, flags: StepFlags, train: bool,
                    rngs: Optional[Dict[str, Array]] = None):
    """One-frame generation incl. optional face refinement
    (vid2vid_model.generate_images :130-158).

    Mixed precision (replaces apex AMP): when cfg.compute_dtype is bfloat16,
    parameters and inputs are cast to bf16 at this boundary — master params
    stay f32, so gradients flow through the casts back to f32 leaves; norm
    statistics and loss accumulation remain f32.

    Returns (outputs dict, masks dict, picked refs, new_aux_G)."""
    if cfg.compute_dtype == "bfloat16":
        cdt = jnp.bfloat16
        params_G = cast_floating(params_G, cdt)
        batch = dict(batch,
                     tgt_label=batch["tgt_label"].astype(cdt),
                     tgt_image=batch["tgt_image"].astype(cdt),
                     ref_labels=batch["ref_labels"].astype(cdt),
                     ref_images=batch["ref_images"].astype(cdt))
        prevs = cast_floating(prevs, cdt)
    tgt_label = batch["tgt_label"]
    tgt_image = batch["tgt_image"]
    ref_labels = batch["ref_labels"]
    ref_images = batch["ref_images"]
    tgt_label_valid = use_valid_labels(cfg, tgt_label)
    ref_labels_valid = use_valid_labels(cfg, ref_labels)

    prev_l = prevs["label"] if flags.has_prev else None
    prev_i = prevs["fake"] if flags.has_prev else None

    variables = {"params": params_G["G"], **aux_G["G"]}
    out, mutG = models.netG.apply(
        variables, tgt_label_valid, ref_labels_valid, ref_images,
        prev_l, prev_i, warp_prev=flags.warp_prev, train=train,
        mutable=["spectral", "batch_stats"], rngs=rngs)
    new_aux_G = {"G": mutG}

    ref_idx = out["ref_idx"]
    ref_label_valid = pick_ref(ref_labels_valid, ref_idx)
    ref_label = pick_ref(ref_labels, ref_idx)
    ref_image = pick_ref(ref_images, ref_idx)

    fake_image = out["img_final"]
    if cfg.refine_face and models.netGf is not None:
        def netGf_apply(lbl_f, ref_l_f, ref_i_f, coarse):
            vf = {"params": params_G["Gf"], **aux_G["Gf"]}
            y, mutGf = models.netGf.apply(
                vf, lbl_f, ref_l_f, ref_i_f, coarse, train=train,
                mutable=["spectral", "batch_stats"],
                method=models.netGf.forward_face)
            new_aux_G["Gf"] = mutGf
            return y
        fake_image = refine_face_region(
            cfg, netGf_apply, tgt_label_valid, fake_image, tgt_label,
            ref_label_valid, ref_image, ref_label)

    fg_mask = get_fg_mask(cfg, tgt_label)
    ref_fg_mask = get_fg_mask(cfg, ref_label)
    fake_raw = out["img_raw"]
    if fake_raw is not None and cfg.has_fg:
        fake_raw = fake_raw * combine_fg_mask(fg_mask, ref_fg_mask, True)

    outputs = dict(fake_image=fake_image, fake_raw=fake_raw,
                   warped=out["img_warp"], flow=out["flow"],
                   flow_mask=out["flow_mask"], mu=out["mu"],
                   logvar=out["logvar"], atn_vis=out["atn_vis"],
                   tgt_label_valid=tgt_label_valid)
    masks = dict(fg=fg_mask, ref_fg=ref_fg_mask)
    refs = dict(label_valid=ref_label_valid, label=ref_label, image=ref_image)
    return outputs, masks, refs, new_aux_G


# ----------------------------------------------------------------------
# loss assemblies
# ----------------------------------------------------------------------

def _g_losses(cfg: Config, models: ModelBundle, params_D, aux_D, vgg_params,
              batch, prevs, flags: StepFlags, outputs, masks, refs,
              collect_aux_D: bool = False):
    """Generator-side losses as a function of the generated outputs (the
    generation itself is linearized once in train_step and shared with the
    discriminator phase).

    collect_aux_D: return the D nets' mutated collections (spectral u/v,
    batch stats) advanced by this G-phase application — used by
    train_step_faithful, where the reference's G phase advances D's power
    iteration a second time per iteration (vid2vid_model.py:62-103)."""
    applies, new_aux_D = _applies_for_D(models, params_D, aux_D, train=True,
                                        collect_aux=collect_aux_D)
    applies["vgg"] = vgg_apply = _vgg_apply(models, vgg_params,
                                            cfg.remat_scope("vgg"))

    tgt_label, tgt_image = batch["tgt_label"], batch["tgt_image"]
    fake_image, fake_raw = outputs["fake_image"], outputs["fake_raw"]

    zero = jnp.float32(0.0)
    losses = {}
    # temporal GAN loss (vid2vid_model.py:70-75)
    if cfg.lambda_temp > 0 and flags.temporal_active:
        tgt_all = jnp.concatenate([prevs["real"], tgt_image], axis=-1)
        fake_all = jnp.concatenate([prevs["fake"], fake_image], axis=-1)
        lt = lc.compute_gan_losses(cfg, applies, None, tgt_all, fake_all,
                                   None, None, for_discriminator=False,
                                   for_temporal=True, temporal_active=True)
        losses["GT_GAN"], losses["GT_GAN_Feat"] = lt
    else:
        losses["GT_GAN"] = losses["GT_GAN_Feat"] = zero

    fg_union = combine_fg_mask(masks["fg"], masks["ref_fg"], cfg.has_fg)
    fake_list = [fake_image, fake_raw]
    real_list = [tgt_image, tgt_image * fg_union]
    li = lc.compute_gan_losses(cfg, applies, tgt_label, real_list, fake_list,
                               refs["label"], refs["image"],
                               for_discriminator=False)
    losses["G_GAN"], losses["G_GAN_Feat"], losses["Gf_GAN"], losses["Gf_GAN_Feat"] = li

    losses["G_VGG"] = lc.compute_vgg_losses(cfg, vgg_apply, fake_image,
                                            fake_raw, tgt_image, fg_union)

    flow_gt = batch.get("flow_gt", [None, None])
    conf_gt = batch.get("conf_gt", [None, None])
    losses["F_Flow"], losses["F_Warp"], body_mask_diff = lc.compute_flow_losses(
        cfg, outputs["flow"], outputs["warped"], tgt_image, flow_gt, conf_gt,
        masks["fg"], tgt_label, refs["label"])
    losses["F_Mask"] = lc.compute_mask_losses(
        cfg, outputs["flow_mask"], fake_image, outputs["warped"], tgt_label,
        tgt_image, fake_raw, masks["fg"], masks["ref_fg"], body_mask_diff)

    if cfg.use_kld and outputs["mu"] is not None:
        losses["G_KLD"] = kld_loss(outputs["mu"], outputs["logvar"]) * cfg.lambda_kld

    total = sum(losses.values())
    return total, dict(losses=losses, new_aux_D=new_aux_D)


def _d_losses(cfg: Config, models: ModelBundle, params_D, aux_D, generated,
              batch, prevs, masks, refs, flags: StepFlags):
    if cfg.compute_dtype == "bfloat16":
        cdt = jnp.bfloat16
        params_D = cast_floating(params_D, cdt)
        generated = cast_floating(generated, cdt)
        batch = dict(batch,
                     tgt_label=batch["tgt_label"].astype(cdt),
                     tgt_image=batch["tgt_image"].astype(cdt))
        refs = cast_floating(refs, cdt)
        prevs = cast_floating(prevs, cdt)
    applies, new_aux_D = _applies_for_D(models, params_D, aux_D, train=True,
                                        collect_aux=True)
    applies["vgg"] = None
    tgt_label, tgt_image = batch["tgt_label"], batch["tgt_image"]
    fake_image, fake_raw = generated["fake_image"], generated["fake_raw"]

    zero = jnp.float32(0.0)
    losses = {}
    fg_union = combine_fg_mask(masks["fg"], masks["ref_fg"], cfg.has_fg)
    li = lc.compute_gan_losses(
        cfg, applies, tgt_label, [tgt_image, tgt_image * fg_union],
        [fake_image, fake_raw], refs["label"], refs["image"],
        for_discriminator=True)
    losses["D_real"], losses["D_fake"], losses["Df_real"], losses["Df_fake"] = li

    if cfg.lambda_temp > 0 and flags.temporal_active:
        tgt_all = jnp.concatenate([prevs["real"], tgt_image], axis=-1)
        fake_all = jnp.concatenate([prevs["fake"], fake_image], axis=-1)
        lt = lc.compute_gan_losses(cfg, applies, None, tgt_all, fake_all, None,
                                   None, for_discriminator=True,
                                   for_temporal=True, temporal_active=True)
        losses["DT_real"], losses["DT_fake"] = lt
    else:
        losses["DT_real"] = losses["DT_fake"] = zero

    total = sum(losses.values())
    return total, dict(new_aux_D=new_aux_D, losses=losses)


# ----------------------------------------------------------------------
# the step
# ----------------------------------------------------------------------

_DIFF_KEYS = ("fake_image", "fake_raw", "warped", "flow", "flow_mask",
              "mu", "logvar")


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def train_step(cfg: Config, models: ModelBundle, state: TrainState, batch,
               prevs, flags: StepFlags, rng: Array):
    """D update, then G update, then prevs advance.  Returns
    (new_state, new_prevs, losses dict).

    The generator forward runs ONCE per step: the reference generates twice
    (no-grad for the D update, with grads for the G update,
    vid2vid_model.py:108-110 + :130) on identical inputs — here the single
    generation is linearized with jax.vjp, its detached outputs feed the D
    update, and the G update pulls its output-cotangents back through the
    saved linearization.  Bitwise the same losses, one full generator
    forward cheaper."""
    opt_G_tx, opt_D_tx = make_optimizers(cfg)
    rngs = {"vae": rng} if cfg.use_kld else None

    # ---- single generation, linearized wrt params_G ----
    def gen_fn(params_G):
        outputs, masks, refs, new_aux_G = generate_images(
            cfg, models, params_G, state.aux_G, batch, prevs, flags,
            train=True, rngs=rngs)
        diff = {k: outputs[k] for k in _DIFF_KEYS}
        return diff, (outputs, masks, refs, new_aux_G)
    diff_out, gen_vjp, (outputs, masks, refs, gen_aux_G) = jax.vjp(
        gen_fn, state.params_G, has_aux=True)

    # ---- discriminator step (no grads through G) ----
    gen_det = jax.tree.map(
        lambda x: jax.lax.stop_gradient(x) if x is not None else None,
        dict(fake_image=diff_out["fake_image"], fake_raw=diff_out["fake_raw"]),
        is_leaf=lambda x: x is None)
    if flags.use_pool:
        # fake-image replay pool: per-sample swap of the current fake with a
        # stored one (classic GAN pool; Trainer owns the host-side buffer).
        gen_det["fake_image"] = jnp.where(
            batch["pool_mask"], batch["pool_fake"].astype(
                gen_det["fake_image"].dtype), gen_det["fake_image"])

    def d_loss_fn(params_D):
        return _d_losses(cfg, models, params_D, state.aux_D, gen_det, batch,
                         prevs, masks, refs, flags)
    (d_total, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        state.params_D)
    d_updates, new_opt_D = opt_D_tx.update(d_grads, state.opt_D, state.params_D)
    new_params_D = optax.apply_updates(state.params_D, d_updates)
    new_aux_D = {k: d_aux["new_aux_D"].get(k, v)
                 for k, v in state.aux_D.items()}

    # ---- generator step (D frozen at the just-updated params) ----
    def g_loss_fn(diff):
        outs = dict(outputs, **diff)
        return _g_losses(cfg, models, new_params_D, new_aux_D,
                         state.vgg_params, batch, prevs, flags, outs, masks,
                         refs)
    (g_total, g_aux), out_bar = jax.value_and_grad(g_loss_fn, has_aux=True)(
        diff_out)
    (g_grads,) = gen_vjp(out_bar)
    g_updates, new_opt_G = opt_G_tx.update(g_grads, state.opt_G, state.params_G)
    new_params_G = optax.apply_updates(state.params_G, g_updates)
    new_aux_G = {k: gen_aux_G.get(k, v) for k, v in state.aux_G.items()}

    new_prevs = advance_prevs(cfg, prevs, outputs["tgt_label_valid"],
                              batch["tgt_image"], outputs["fake_image"])

    new_state = state.replace(
        step=state.step + 1,
        params_G=new_params_G, params_D=new_params_D,
        aux_G=new_aux_G, aux_D=new_aux_D,
        opt_G=new_opt_G, opt_D=new_opt_D)
    losses = {**g_aux["losses"], **d_aux["losses"],
              "G_total": g_total, "D_total": d_total}
    # visual dict for display_freq image dumps (reference models/trainer.py
    # :96-111 save_all_tensors).  Arrays already live in the program; callers
    # fetch them to host only on display steps, so non-display steps pay
    # nothing beyond the extra program outputs.
    visuals = jax.tree.map(
        jax.lax.stop_gradient,
        dict(tgt_label=batch["tgt_label"], tgt_image=batch["tgt_image"],
             ref_label=refs["label"], ref_image=refs["image"],
             fake_image=outputs["fake_image"], fake_raw=outputs["fake_raw"],
             warped=outputs["warped"], flow=outputs["flow"],
             flow_mask=outputs["flow_mask"]))
    return new_state, new_prevs, losses, visuals


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def train_step_faithful(cfg: Config, models: ModelBundle, state: TrainState,
                        batch, prevs, flags: StepFlags, rng: Array):
    """Reference-faithful alternation: TWO generator forwards per iteration,
    exactly as train.py:44-62 + vid2vid_model.py:62-130 execute it.

    This is the documented convergence-parity mode (docs/CONVERGENCE.md).
    The default `train_step` shares ONE vjp-linearized generation between
    the D and G phases — bitwise the same losses at step 1 and one forward
    cheaper, but its spectral u/v estimates advance once per step where the
    reference's advance twice (once per forward), with the D phase seeing
    sigma_1 and the G phase sigma_2.  Measured over 2000 steps that
    advancement-rate difference drifts the GAN equilibrium
    (docs/CONVERGENCE.md "Drift diagnosis").  Here the alternation is
    reproduced exactly:

      D phase: no-grad generation with the step's incoming params/aux
               (advances G's u/v + batch stats once: sigma_1 fake),
               D forward with grads (advances D's u/v once), D update.
      G phase: fresh generation with grads using the D-phase-advanced aux
               (sigma_2 fake), losses against the UPDATED D (whose u/v
               advance a second time in this application), G update.

    Per step this matches the reference operation-for-operation, so whole
    trajectories track (up to float reassociation), not just step 1 —
    asserted multi-step in tests/test_convergence.py.  Use
    cfg.sn_power_iters=1 with this step (one iteration per forward, like
    torch).  The VAE rng is reused across the two phases (the reference
    draws two independent z's; face/pose/street run with use_kld=False)."""
    opt_G_tx, opt_D_tx = make_optimizers(cfg)
    rngs = {"vae": rng} if cfg.use_kld else None

    # ---- D phase: no-grad generation, sigma_1 (vid2vid_model.py:108-110) ----
    outputs_d, masks, refs, gen_aux_1 = generate_images(
        cfg, models, state.params_G, state.aux_G, batch, prevs, flags,
        train=True, rngs=rngs)
    aux_G_1 = {k: gen_aux_1.get(k, v) for k, v in state.aux_G.items()}
    gen_det = jax.tree.map(
        lambda x: jax.lax.stop_gradient(x) if x is not None else None,
        dict(fake_image=outputs_d["fake_image"],
             fake_raw=outputs_d["fake_raw"]),
        is_leaf=lambda x: x is None)
    if flags.use_pool:
        gen_det["fake_image"] = jnp.where(
            batch["pool_mask"], batch["pool_fake"].astype(
                gen_det["fake_image"].dtype), gen_det["fake_image"])

    def d_loss_fn(params_D):
        return _d_losses(cfg, models, params_D, state.aux_D, gen_det, batch,
                         prevs, masks, refs, flags)
    (d_total, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        state.params_D)
    d_updates, new_opt_D = opt_D_tx.update(d_grads, state.opt_D, state.params_D)
    new_params_D = optax.apply_updates(state.params_D, d_updates)
    aux_D_1 = {k: d_aux["new_aux_D"].get(k, v) for k, v in state.aux_D.items()}

    # ---- G phase: fresh generation with grads, sigma_2 (vid2vid_model.py:62-103) ----
    def g_loss_fn(params_G):
        outputs, masks_g, refs_g, gen_aux_2 = generate_images(
            cfg, models, params_G, aux_G_1, batch, prevs, flags,
            train=True, rngs=rngs)
        total, aux = _g_losses(cfg, models, new_params_D, aux_D_1,
                               state.vgg_params, batch, prevs, flags,
                               outputs, masks_g, refs_g, collect_aux_D=True)
        return total, (aux, outputs, gen_aux_2)
    (g_total, (g_aux, outputs_g, gen_aux_2)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True)(state.params_G)
    g_updates, new_opt_G = opt_G_tx.update(g_grads, state.opt_G, state.params_G)
    new_params_G = optax.apply_updates(state.params_G, g_updates)
    new_aux_G = {k: gen_aux_2.get(k, v) for k, v in aux_G_1.items()}
    new_aux_D = {k: g_aux["new_aux_D"].get(k, v) for k, v in aux_D_1.items()}

    new_prevs = advance_prevs(cfg, prevs, outputs_g["tgt_label_valid"],
                              batch["tgt_image"], outputs_g["fake_image"])

    new_state = state.replace(
        step=state.step + 1,
        params_G=new_params_G, params_D=new_params_D,
        aux_G=new_aux_G, aux_D=new_aux_D,
        opt_G=new_opt_G, opt_D=new_opt_D)
    losses = {**g_aux["losses"], **d_aux["losses"],
              "G_total": g_total, "D_total": d_total}
    visuals = jax.tree.map(
        jax.lax.stop_gradient,
        dict(tgt_label=batch["tgt_label"], tgt_image=batch["tgt_image"],
             ref_label=refs["label"], ref_image=refs["image"],
             fake_image=outputs_g["fake_image"],
             fake_raw=outputs_g["fake_raw"], warped=outputs_g["warped"],
             flow=outputs_g["flow"], flow_mask=outputs_g["flow_mask"]))
    return new_state, new_prevs, losses, visuals
