"""Train state: model bundle, parameters, mutable collections, optimizers.

Replaces models/models.py create_model + base_model.define_networks.  All
networks that can ever be needed (including the temporal flow branch and the
temporal discriminator) are created up front and gated by call-time flags, so
jit signatures and optimizer pytrees stay stable across the single-frame ->
temporal curriculum switch (the reference mutates the architecture and
rebuilds optimizers mid-run, base_model.py:259-279 — a non-starter under XLA).

Optimizers: Adam with TTUR (G lr/2 beta=(0,0.999); D lr*2) per
base_model.py:39-48, with the linear post-`niter` decay
(base_model.py:245-257) applied by injecting the learning rate each epoch.
Optimizer state IS checkpointed (the reference drops Adam moments on resume —
SURVEY §5).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.models.generator import FewShotGenerator
from fsvid2vid_tpu.models.discriminator import MultiscaleDiscriminator
from fsvid2vid_tpu.models.vgg import Vgg19Features


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """Static module definitions (not a pytree)."""
    cfg: Config
    netG: FewShotGenerator
    netD: Optional[MultiscaleDiscriminator]
    netDT: Optional[MultiscaleDiscriminator]
    netDf: Optional[MultiscaleDiscriminator]
    netGf: Optional[FewShotGenerator]
    vgg: Optional[Vgg19Features]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_G: Any          # {'G': ..., 'Gf': ...}
    params_D: Any          # {'D': ..., 'DT': ..., 'Df': ...}
    aux_G: Any             # mutable collections (spectral/batch_stats) per net
    aux_D: Any
    opt_G: Any
    opt_D: Any
    vgg_params: Any        # frozen perceptual-net params (not optimized)


def face_refiner_config(cfg: Config) -> Config:
    """opt_face derivation (base_model.py:175-181)."""
    face_size = int(cfg.fine_size / cfg.aspect_ratio) // 4
    return cfg.replace(
        n_downsample_G=cfg.n_downsample_G - 1,
        n_adaptive_layers=(cfg.n_adaptive_layers - 1
                           if cfg.n_adaptive_layers > 0 else cfg.n_adaptive_layers),
        input_nc=cfg.output_nc, fine_size=face_size, load_size=face_size,
        aspect_ratio=1.0)


def build_models(cfg: Config) -> ModelBundle:
    from fsvid2vid_tpu.ops.spectral_norm import set_power_iters
    set_power_iters(cfg.sn_power_iters)
    netG = FewShotGenerator(cfg)
    netGf = None
    if cfg.refine_face:
        netGf = FewShotGenerator(face_refiner_config(cfg), for_face=True)
    netD = netDT = netDf = None
    if cfg.is_train or cfg.finetune:
        netD = MultiscaleDiscriminator(
            cfg, cfg.netD_input_nc, cfg.ndf, cfg.n_layers_D, cfg.norm_D,
            cfg.netD_subarch, cfg.num_D, not cfg.no_ganFeat_loss)
        if cfg.n_frames_G > 1:
            # temporal D over output_nc * tD stacked frames (base_model.py:272)
            netDT = MultiscaleDiscriminator(
                cfg, cfg.output_nc * cfg.tD, cfg.ndf, cfg.n_layers_D,
                cfg.norm_D, "n_layers", 1, not cfg.no_ganFeat_loss)
        if cfg.add_face_D:
            netDf = MultiscaleDiscriminator(
                cfg, cfg.output_nc * 2, cfg.ndf, cfg.n_layers_D, cfg.norm_D,
                "n_layers", 1, not cfg.no_ganFeat_loss)
    vgg = None
    if not cfg.no_vgg_loss and (cfg.is_train or cfg.finetune):
        vgg = Vgg19Features()
    return ModelBundle(cfg, netG, netD, netDT, netDf, netGf, vgg)


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    """Base LR with linear decay after `niter` (base_model.py:245-250)."""
    if epoch <= cfg.niter:
        return cfg.lr
    return cfg.lr * (1 - (epoch - cfg.niter) / (cfg.niter_decay + 1))


def ttur_lrs(cfg: Config, base_lr: float):
    if cfg.no_TTUR:
        return base_lr, base_lr
    return base_lr / 2, base_lr * 2


def make_optimizers(cfg: Config):
    if cfg.no_TTUR:
        b1, b2 = cfg.beta1, 0.999
    else:
        b1, b2 = 0.0, cfg.beta2
    g_lr, d_lr = ttur_lrs(cfg, cfg.lr)
    opt_G = optax.inject_hyperparams(optax.adam)(learning_rate=g_lr, b1=b1, b2=b2)
    opt_D = optax.inject_hyperparams(optax.adam)(learning_rate=d_lr, b1=b1, b2=b2)
    return opt_G, opt_D


def _split_collections(variables) -> Dict[str, Any]:
    """Separate trainable params from mutable aux collections."""
    variables = dict(variables)
    params = variables.pop("params", {})
    return params, variables


def init_state(cfg: Config, models: ModelBundle, rng: jax.Array,
               sample_batch: Dict[str, jnp.ndarray]) -> TrainState:
    """Initialize all parameters from a sample batch (shapes only matter)."""
    keys = jax.random.split(rng, 8)
    label = sample_batch["tgt_label"]
    image = sample_batch["tgt_image"]
    ref_labels = sample_batch["ref_labels"]
    ref_images = sample_batch["ref_images"]
    b, h, w = label.shape[0], label.shape[1], label.shape[2]
    cl = label.shape[-1] if cfg.label_nc == 0 else cfg.label_nc
    prev_l = jnp.zeros((b, h, w, cl * (cfg.n_frames_G - 1)))
    prev_i = jnp.zeros((b, h, w, 3 * (cfg.n_frames_G - 1)))

    vG = models.netG.init(keys[0], label, ref_labels, ref_images,
                          prev_l, prev_i, warp_prev=cfg.n_frames_G > 1,
                          train=True)
    pG, auxG = _split_collections(vG)
    params_G = {"G": pG}
    aux_G = {"G": auxG}
    if models.netGf is not None:
        fcfg = models.netGf.cfg
        fs = fcfg.fine_size
        f_label = jnp.zeros((b, fs, fs, 3))
        f_refs_l = jnp.zeros((b, 1, fs, fs, 3))
        f_refs_i = jnp.zeros((b, 1, fs, fs, 3))
        f_coarse = jnp.zeros((b, fs, fs, 3))
        vGf = models.netGf.init(keys[1], f_label, f_refs_l, f_refs_i, f_coarse,
                                train=True, method=models.netGf.forward_face)
        p, a = _split_collections(vGf)
        params_G["Gf"] = p
        aux_G["Gf"] = a

    params_D: Dict[str, Any] = {}
    aux_D: Dict[str, Any] = {}
    if models.netD is not None:
        xD = jnp.zeros((2 * b, h, w, cfg.netD_input_nc))
        ref_arg = None
        if cfg.netD_subarch == "adaptive":
            ref_arg = jnp.zeros((2 * b, h, w, cfg.netD_input_nc))
        vD = models.netD.init(keys[2], xD, ref_arg, train=True)
        params_D["D"], aux_D["D"] = _split_collections(vD)
    if models.netDT is not None:
        xDT = jnp.zeros((2 * b, h, w, cfg.output_nc * cfg.tD))
        vDT = models.netDT.init(keys[3], xDT, train=True)
        params_D["DT"], aux_D["DT"] = _split_collections(vDT)
    if models.netDf is not None:
        fs = int(cfg.fine_size / cfg.aspect_ratio) // 4
        xDf = jnp.zeros((2 * b, fs, fs, cfg.output_nc * 2))
        vDf = models.netDf.init(keys[4], xDf, train=True)
        params_D["Df"], aux_D["Df"] = _split_collections(vDf)

    vgg_params = None
    if models.vgg is not None:
        vgg_params = models.vgg.init(keys[5], jnp.zeros((1, h, w, 3)))["params"]

    opt_G, opt_D = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_G=params_G, params_D=params_D, aux_G=aux_G, aux_D=aux_D,
        opt_G=opt_G.init(params_G), opt_D=opt_D.init(params_D),
        vgg_params=vgg_params)


def set_epoch_lr(cfg: Config, state: TrainState, epoch: int) -> TrainState:
    """Inject the epoch's decayed TTUR learning rates into both optimizers."""
    g_lr, d_lr = ttur_lrs(cfg, lr_for_epoch(cfg, epoch))
    opt_G = state.opt_G._replace(hyperparams={
        **state.opt_G.hyperparams,
        "learning_rate": jnp.asarray(g_lr, jnp.float32)})
    opt_D = state.opt_D._replace(hyperparams={
        **state.opt_D.hyperparams,
        "learning_rate": jnp.asarray(d_lr, jnp.float32)})
    return state.replace(opt_G=opt_G, opt_D=opt_D)
