"""Test-time finetuning (reference Vid2VidModel.finetune,
vid2vid_model.py:207-237): before synthesizing an unseen subject, adapt a
name-filtered subset of the generator ({fc*, conv_img, up*} — matching the
substring filter of get_train_params, base_model.py:149-165) plus the
discriminators for `finetune_iters` (=100) Adam steps on randomly-rolled
copies of the reference images.

The parameter filter is an `optax.masked` wrapper, so jit signatures and the
step function are shared with training; the random roll/flip augmentation is
host-side numpy (shapes stay static)."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.training.state import (
    ModelBundle, TrainState, make_optimizers, ttur_lrs)
from fsvid2vid_tpu.training import step as step_lib

FINETUNE_NAMES = ("fc", "conv_img", "up")  # vid2vid_model.py:208


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def finetune_mask(params_G) -> Dict:
    """Bool pytree: True where any filter substring appears in the param path."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: any(n in _path_str(p) for n in FINETUNE_NAMES), params_G)


def masked_tx(inner, params_G):
    """Apply `inner` to the finetune subset and zero updates elsewhere.
    (optax.masked alone passes raw gradients through for masked-out leaves.)"""
    labels = jax.tree.map(lambda m: "train" if m else "freeze",
                          finetune_mask(params_G))
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels)


def random_roll_np(arrays, rng: np.random.RandomState):
    """Reference random_roll (util/util.py:157-168): circular shift by up to
    h//16 / w//16 in either direction + random horizontal flip.  NHWC."""
    h, w = arrays[0].shape[1:3]
    ny = rng.choice([rng.randint(max(h // 16, 1)),
                     h - rng.randint(max(h // 16, 1))])
    nx = rng.choice([rng.randint(max(w // 16, 1)),
                     w - rng.randint(max(w // 16, 1))])
    flip = rng.rand() > 0.5

    def roll(t):
        t = np.roll(np.asarray(t), (int(ny), int(nx)), axis=(1, 2))
        if flip:
            t = t[:, :, ::-1]
        return jnp.asarray(np.ascontiguousarray(t))
    return [roll(a) for a in arrays]


def finetune(cfg: Config, models: ModelBundle, state: TrainState,
             ref_labels: jnp.ndarray, ref_images: jnp.ndarray,
             seed: int = 0) -> TrainState:
    """Run the adaptation loop; returns state with adapted G ({fc,conv_img,up}
    subset) and D.  cfg should have is_train=False (flow/mask losses gate off,
    matching the reference's inference-mode loss collector)."""
    ft_cfg = cfg.replace(finetune=True)
    rng = np.random.RandomState(seed)

    # fresh optimizers (the reference re-creates them: vid2vid_model.py:210-216)
    opt_G_tx, opt_D_tx = make_optimizers(ft_cfg)
    opt_G_tx = masked_tx(opt_G_tx, state.params_G)
    state = state.replace(opt_G=opt_G_tx.init(state.params_G),
                          opt_D=opt_D_tx.init(state.params_D))

    k = ref_labels.shape[1]
    for it in range(cfg.finetune_iters):
        idx = rng.randint(k)
        tgt_label, tgt_image = random_roll_np(
            [ref_labels[:, idx], ref_images[:, idx]], rng)
        batch = dict(tgt_label=tgt_label, tgt_image=tgt_image,
                     ref_labels=ref_labels, ref_images=ref_images,
                     flow_gt=[None, None], conf_gt=[None, None])
        prevs = step_lib.init_prevs(ft_cfg, batch)
        state, _, _ = _finetune_step(ft_cfg, models, state, batch, prevs,
                                     jax.random.PRNGKey(seed * 1000 + it))
    return state


import functools


@functools.partial(jax.jit, static_argnums=(0, 1))
def _finetune_step(cfg: Config, models: ModelBundle, state: TrainState,
                   batch, prevs, rng):
    """Single-frame D+G update with the masked G optimizer."""
    opt_G_tx, opt_D_tx = make_optimizers(cfg)
    flags = step_lib.StepFlags(warp_prev=False, has_prev=False)
    rngs = {"vae": rng} if cfg.use_kld else None

    # Single generation linearized wrt params_G, shared by the D and G
    # updates (same structure as step_lib.train_step).
    def gen_fn(params_G):
        outputs, masks, refs, new_aux_G = step_lib.generate_images(
            cfg, models, params_G, state.aux_G, batch, prevs, flags,
            train=True, rngs=rngs)
        diff = {k: outputs[k] for k in step_lib._DIFF_KEYS}
        return diff, (outputs, masks, refs, new_aux_G)
    diff_out, gen_vjp, (outputs, masks, refs, gen_aux_G) = jax.vjp(
        gen_fn, state.params_G, has_aux=True)
    gen_det = jax.tree.map(
        lambda x: jax.lax.stop_gradient(x) if x is not None else None,
        dict(fake_image=diff_out["fake_image"], fake_raw=diff_out["fake_raw"]),
        is_leaf=lambda x: x is None)

    def d_loss_fn(params_D):
        return step_lib._d_losses(cfg, models, params_D, state.aux_D, gen_det,
                                  batch, prevs, masks, refs, flags)
    (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        state.params_D)
    d_updates, new_opt_D = opt_D_tx.update(d_grads, state.opt_D, state.params_D)
    new_params_D = optax.apply_updates(state.params_D, d_updates)
    new_aux_D = {k: d_aux["new_aux_D"].get(k, v)
                 for k, v in state.aux_D.items()}

    def g_loss_fn(diff):
        outs = dict(outputs, **diff)
        return step_lib._g_losses(cfg, models, new_params_D, new_aux_D,
                                  state.vgg_params, batch, prevs, flags,
                                  outs, masks, refs)
    (_, g_aux), out_bar = jax.value_and_grad(g_loss_fn, has_aux=True)(
        diff_out)
    (g_grads,) = gen_vjp(out_bar)
    masked_opt = masked_tx(opt_G_tx, state.params_G)
    g_updates, new_opt_G = masked_opt.update(g_grads, state.opt_G,
                                             state.params_G)
    new_params_G = optax.apply_updates(state.params_G, g_updates)
    new_aux_G = {k: gen_aux_G.get(k, v) for k, v in state.aux_G.items()}

    new_state = state.replace(
        step=state.step + 1, params_G=new_params_G, params_D=new_params_D,
        aux_G=new_aux_G, aux_D=new_aux_D, opt_G=new_opt_G, opt_D=new_opt_D)
    return new_state, prevs, {**g_aux["losses"], **d_aux["losses"]}
