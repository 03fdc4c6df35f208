"""Sequential inference pipeline (reference test.py:20-53 +
Vid2VidModel.inference vid2vid_model.py:179-205).

The torch reference holds recurrent state (prevs ring buffer, cached adaptive
weights) as attributes on the model object and the dataset object; here state
is an explicit pytree carried across jitted frame steps:

  pipe = InferencePipeline(cfg, models, params, aux)
  pipe.reset(ref_labels, ref_images)       # t=0: encode refs once (cached)
  frame = pipe.step(label)                 # jitted synthesize + prevs advance

For n_shot == 1 the per-frame step skips the whole reference encoder (the
reference recomputes the encoder downs every frame, generator.py:354-357).
For n_shot > 1 the attention depends on the current label, so the full
forward runs each frame (matching generator.py:403).

`run_sequence` offers a `lax.scan` path that compiles the whole clip into one
XLA program for benchmark-grade throughput.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.inference.fold import fold_spectral_norm
from fsvid2vid_tpu.models.face_refiner import refine_face_region
from fsvid2vid_tpu.models.generator import FewShotGenerator, pick_ref
from fsvid2vid_tpu.models.input_process import use_valid_labels
from fsvid2vid_tpu.training.state import ModelBundle

Array = jnp.ndarray


@functools.partial(jax.jit, static_argnums=(0, 1))
def encode_reference_jit(cfg: Config, models: ModelBundle, params_G, aux_G,
                         ref_labels, ref_images, first_label):
    ref_labels_valid = use_valid_labels(cfg, ref_labels)
    label_valid = use_valid_labels(cfg, first_label)
    variables = {"params": params_G["G"], **aux_G["G"]}
    cache = models.netG.apply(variables, ref_labels_valid, ref_images,
                              label_valid, method=models.netG.encode_reference,
                              mutable=False)
    return cache


@functools.partial(jax.jit, static_argnums=(0, 1))
def encode_reference_multi_jit(cfg: Config, models: ModelBundle, params_G,
                               aux_G, ref_labels, ref_images):
    """K>1: cache the label-independent reference-encoder prefix."""
    ref_labels_valid = use_valid_labels(cfg, ref_labels)
    variables = {"params": params_G["G"], **aux_G["G"]}
    return models.netG.apply(variables, ref_labels_valid, ref_images,
                             method=models.netG.encode_reference_multi,
                             mutable=False)


@functools.partial(jax.jit, static_argnums=(0, 1, 7))
def frame_step_jit(cfg: Config, models: ModelBundle, params_G, aux_G, cache,
                   batch, prevs, has_prev: bool):
    """One inference frame.  batch: label + refs; prevs: label/fake stacks."""
    label = batch["label"]
    ref_labels, ref_images = batch["ref_labels"], batch["ref_images"]
    label_valid = use_valid_labels(cfg, label)
    ref_labels_valid = use_valid_labels(cfg, ref_labels)
    prev_l = prevs["label"] if has_prev else None
    prev_i = prevs["fake"] if has_prev else None
    warp_prev = has_prev and cfg.n_frames_G > 1

    variables = {"params": params_G["G"], **aux_G["G"]}
    if cfg.n_shot == 1 and cache is not None:
        out = models.netG.apply(
            variables, label_valid, ref_labels_valid, ref_images, cache,
            prev_l, prev_i, warp_prev=warp_prev,
            method=models.netG.synthesize, mutable=False)
        ref_idx = None
    else:
        out = models.netG.apply(
            variables, label_valid, ref_labels_valid, ref_images,
            prev_l, prev_i, warp_prev=warp_prev, train=False, mutable=False,
            prefix=cache)
        ref_idx = out["ref_idx"]

    fake_image = out["img_final"]
    if cfg.refine_face and models.netGf is not None:
        ref_label_valid = pick_ref(ref_labels_valid, ref_idx)
        ref_label = pick_ref(ref_labels, ref_idx)
        ref_image = pick_ref(ref_images, ref_idx)

        def netGf_apply(lbl_f, ref_l_f, ref_i_f, coarse):
            vf = {"params": params_G["Gf"], **aux_G["Gf"]}
            return models.netGf.apply(vf, lbl_f, ref_l_f, ref_i_f, coarse,
                                      train=False, mutable=False,
                                      method=models.netGf.forward_face)
        fake_image = refine_face_region(
            cfg, netGf_apply, label_valid, fake_image, label,
            ref_label_valid, ref_image, ref_label)

    # prevs ring-buffer advance (vid2vid_model.py:203)
    def roll(buf, new):
        c = new.shape[-1]
        if buf.shape[-1] == c:
            return new
        return jnp.concatenate([buf[..., c:], new], axis=-1)
    new_prevs = {"label": roll(prevs["label"], label_valid),
                 "fake": roll(prevs["fake"], fake_image)}
    result = dict(fake_image=fake_image, flow=out["flow"],
                  flow_mask=out["flow_mask"], img_raw=out.get("img_raw"),
                  warped=out["img_warp"])
    return result, new_prevs


class InferencePipeline:
    """Stateful convenience wrapper around the jitted frame step."""

    def __init__(self, cfg: Config, models: ModelBundle, params_G, aux_G):
        self.cfg = cfg
        self.models = models
        # Fold eval-time spectral-norm sigmas into the kernels once (see
        # inference/fold.py) — per-model variable dicts share the same keys.
        folded = {k: fold_spectral_norm({"params": params_G[k], **aux_G[k]})
                  for k in params_G}
        self.params_G = {k: v["params"] for k, v in folded.items()}
        self.aux_G = {k: {c: vv for c, vv in v.items() if c != "params"}
                      for k, v in folded.items()}
        self.cache = None
        self.prevs = None
        self.t = 0
        self._refs = None

    def reset(self, ref_labels: Array, ref_images: Array,
              first_label: Optional[Array] = None):
        """t=0 setup: cache reference encoding (n_shot == 1)."""
        cfg = self.cfg
        self._refs = (ref_labels, ref_images)
        if first_label is None:
            first_label = jnp.zeros(
                ref_labels.shape[:1] + ref_labels.shape[2:], ref_labels.dtype)
        if cfg.n_shot == 1:
            self.cache = encode_reference_jit(
                cfg, self.models, self.params_G, self.aux_G, ref_labels,
                ref_images, first_label)
        else:
            self.cache = encode_reference_multi_jit(
                cfg, self.models, self.params_G, self.aux_G, ref_labels,
                ref_images)
        b, _, h, w, _ = ref_labels.shape
        cl = use_valid_labels(cfg, ref_labels).shape[-1]
        n = max(1, cfg.n_frames_G - 1)
        self.prevs = {
            "label": jnp.zeros((b, h, w, cl * n), jnp.float32),
            "fake": jnp.zeros((b, h, w, 3 * n), jnp.float32),
        }
        self.t = 0

    def step(self, label: Array) -> Dict[str, Array]:
        assert self._refs is not None, "call reset() first"
        ref_labels, ref_images = self._refs
        batch = dict(label=label, ref_labels=ref_labels, ref_images=ref_images)
        result, self.prevs = frame_step_jit(
            self.cfg, self.models, self.params_G, self.aux_G, self.cache,
            batch, self.prevs, self.t > 0)
        self.t += 1
        return result


@functools.partial(jax.jit, static_argnums=(0, 1))
def run_sequence(cfg: Config, models: ModelBundle, params_G, aux_G,
                 labels: Array, ref_labels: Array, ref_images: Array):
    """Whole-clip inference as one lax.scan program.

    labels: (T, B, H, W, C).  Returns (T, B, H, W, 3) frames.  Frame 0 runs
    without prevs (blended only with the warped reference); subsequent frames
    carry the prevs ring buffer through the scan.
    """
    first_label = labels[0]
    ref_labels_valid = use_valid_labels(cfg, ref_labels)
    label_valid0 = use_valid_labels(cfg, first_label)
    variables = {"params": params_G["G"], **aux_G["G"]}

    if cfg.n_shot == 1:
        cache = models.netG.apply(variables, ref_labels_valid, ref_images,
                                  label_valid0,
                                  method=models.netG.encode_reference,
                                  mutable=False)
    else:
        cache = models.netG.apply(variables, ref_labels_valid, ref_images,
                                  method=models.netG.encode_reference_multi,
                                  mutable=False)

    def synth(label_valid, prev_l, prev_i, warp_prev):
        if cfg.n_shot == 1:
            return models.netG.apply(
                variables, label_valid, ref_labels_valid, ref_images, cache,
                prev_l, prev_i, warp_prev=warp_prev,
                method=models.netG.synthesize, mutable=False)
        return models.netG.apply(
            variables, label_valid, ref_labels_valid, ref_images,
            prev_l, prev_i, warp_prev=warp_prev, train=False, mutable=False,
            prefix=cache)

    # frame 0 (no prevs)
    out0 = synth(label_valid0, None, None, False)
    b, h, w, _ = out0["img_final"].shape
    cl = label_valid0.shape[-1]
    n = max(1, cfg.n_frames_G - 1)

    def tile(x, c):
        return jnp.concatenate([x] * n, axis=-1) if n > 1 else x
    prevs0 = (tile(label_valid0, cl), tile(out0["img_final"], 3))

    def body(carry, label):
        prev_l, prev_i = carry
        label_valid = use_valid_labels(cfg, label)
        out = synth(label_valid, prev_l, prev_i, cfg.n_frames_G > 1)
        fake = out["img_final"]

        def roll(buf, new):
            if buf.shape[-1] == new.shape[-1]:
                return new
            return jnp.concatenate([buf[..., new.shape[-1]:], new], axis=-1)
        return (roll(prev_l, label_valid), roll(prev_i, fake)), fake

    _, frames = jax.lax.scan(body, prevs0, labels[1:])
    return jnp.concatenate([out0["img_final"][None], frames], axis=0)
