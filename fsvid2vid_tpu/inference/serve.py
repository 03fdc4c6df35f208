"""AOT serving export for the inference pipeline.

The reference deploys by shipping the training repo and running test.py
(test.py:20-53) — model code, options parsing, and checkpoints all required
at serving time.  Here the three inference programs are exported as
serialized StableHLO artifacts (jax.export) plus a single params blob, so a
server can run them without the framework or model code on the import path:

  artifacts/
    encode.hlo   reference encoding (t=0, n_shot==1 cache)
    step0.hlo    first frame (no prevs; composed with warped ref only)
    step.hlo     steady-state frame (prevs ring buffer in/out)
    params.msgpack   spectral-norm-folded bf16 variables
    serving.json     shapes + config provenance

Programs take the variables as a runtime argument (not baked into the
executable), so one artifact serves any checkpoint of the same architecture.
Exports are made for the platform present at export time (TPU); jax.export
artifacts are loadable by `load_serving` on any host with the same backend.

Beyond-reference capability; the per-frame semantics are identical to
InferencePipeline.step (inference/pipeline.py), asserted by
tests/test_serve.py.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.inference.fold import fold_spectral_norm
from fsvid2vid_tpu.models.input_process import use_valid_labels
from fsvid2vid_tpu.parallel.precision import bf16_params, cast_floating

Array = jnp.ndarray

_FILES = ("encode.hlo", "step0.hlo", "step.hlo")


def _build_programs(cfg: Config, netG):
    """The three serving programs as pure functions of (variables, inputs)."""

    def encode(variables, ref_labels, ref_images, first_label):
        ref_valid = use_valid_labels(cfg, ref_labels)
        label_valid = use_valid_labels(cfg, first_label)
        if cfg.n_shot == 1:
            return netG.apply(variables, ref_valid, ref_images, label_valid,
                              method=netG.encode_reference, mutable=False)
        return netG.apply(variables, ref_valid, ref_images,
                          method=netG.encode_reference_multi, mutable=False)

    def _synth(variables, cache, label, ref_labels, ref_images,
               prev_l, prev_i, warp_prev):
        label_valid = use_valid_labels(cfg, label)
        ref_valid = use_valid_labels(cfg, ref_labels)
        if cfg.n_shot == 1:
            out = netG.apply(variables, label_valid, ref_valid, ref_images,
                             cache, prev_l, prev_i, warp_prev=warp_prev,
                             method=netG.synthesize, mutable=False)
        else:
            # K>1: attention depends on the current label so the full cache
            # cannot be precomputed (generator.py:403), but the per-ref
            # encoder prefix can (encode_reference_multi)
            out = netG.apply(variables, label_valid, ref_valid, ref_images,
                             prev_l, prev_i, warp_prev=warp_prev,
                             train=False, mutable=False, prefix=cache)
        return out["img_final"], label_valid

    def step0(variables, cache, label, ref_labels, ref_images):
        frame, label_valid = _synth(variables, cache, label, ref_labels,
                                    ref_images, None, None, False)
        n = max(1, cfg.n_frames_G - 1)

        def tile(x):
            return jnp.concatenate([x] * n, axis=-1) if n > 1 else x
        return frame, {"label": tile(label_valid), "fake": tile(frame)}

    def step(variables, cache, label, ref_labels, ref_images, prevs):
        frame, label_valid = _synth(variables, cache, label, ref_labels,
                                    ref_images, prevs["label"], prevs["fake"],
                                    cfg.n_frames_G > 1)

        def roll(buf, new):
            if buf.shape[-1] == new.shape[-1]:
                return new
            return jnp.concatenate([buf[..., new.shape[-1]:], new], axis=-1)
        return frame, {"label": roll(prevs["label"], label_valid),
                       "fake": roll(prevs["fake"], frame)}

    return encode, step0, step


def _example_inputs(cfg: Config, dtype=jnp.bfloat16):
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
    b, k = 1, cfg.n_shot
    label = jnp.zeros((b, h, w, cl), dtype)
    ref_l = jnp.zeros((b, k, h, w, cl), dtype)
    ref_i = jnp.zeros((b, k, h, w, 3), dtype)
    cl_valid = use_valid_labels(cfg, ref_l).shape[-1]
    n = max(1, cfg.n_frames_G - 1)
    prevs = {"label": jnp.zeros((b, h, w, cl_valid * n), dtype),
             "fake": jnp.zeros((b, h, w, 3 * n), dtype)}
    return label, ref_l, ref_i, prevs


def export_serving(cfg: Config, netG, variables, out_dir: str,
                   dtype=jnp.bfloat16) -> Dict[str, int]:
    """Export the three programs + folded params.  Returns artifact sizes."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    variables = bf16_params(fold_spectral_norm(variables))
    encode, step0, step = _build_programs(cfg, netG)
    label, ref_l, ref_i, prevs = _example_inputs(cfg, dtype)

    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables)
    cache = jax.eval_shape(encode, var_spec, ref_l, ref_i, label)

    sizes = {}
    for name, fn, args in (
            ("encode", encode, (var_spec, ref_l, ref_i, label)),
            ("step0", step0, (var_spec, cache, label, ref_l, ref_i)),
            ("step", step, (var_spec, cache, label, ref_l, ref_i, prevs))):
        exported = jexport.export(jax.jit(fn))(*args)
        blob = exported.serialize()
        with open(os.path.join(out_dir, f"{name}.hlo"), "wb") as f:
            f.write(blob)
        sizes[f"{name}.hlo"] = len(blob)

    pbytes = serialization.to_bytes(variables)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(pbytes)
    sizes["params.msgpack"] = len(pbytes)

    with open(os.path.join(out_dir, "serving.json"), "w") as f:
        json.dump({
            "config": cfg.to_json(),
            "dtype": jnp.dtype(dtype).name,
            "platform": jax.default_backend(),
            "shapes": {"label": list(label.shape), "ref_l": list(ref_l.shape),
                       "ref_i": list(ref_i.shape)},
        }, f, indent=2)
    return sizes


class ServingSession:
    """Drives the exported artifacts: reset(refs) then step(label) per frame.

    Mirrors InferencePipeline's surface but runs the deserialized programs —
    no model code needed.  Template variables are rehydrated from the params
    blob once and donated to every call.
    """

    def __init__(self, out_dir: str):
        from jax import export as jexport

        with open(os.path.join(out_dir, "serving.json")) as f:
            self.meta = json.load(f)
        self.programs = {}
        for name in _FILES:
            with open(os.path.join(out_dir, name), "rb") as f:
                self.programs[name.split(".")[0]] = jexport.deserialize(
                    f.read())
        # rehydrate variables: the exported in_tree carries the target
        # structure; params.msgpack stores the leaves
        encode_args = jax.tree.unflatten(
            self.programs["encode"].in_tree,
            list(self.programs["encode"].in_avals))
        var_template = jax.tree.map(
            lambda a: np.zeros(a.shape, a.dtype), encode_args[0][0])
        with open(os.path.join(out_dir, "params.msgpack"), "rb") as f:
            self.variables = jax.tree.map(
                jnp.asarray, serialization.from_bytes(var_template, f.read()))
        self._calls = {k: jax.jit(v.call) for k, v in self.programs.items()}
        self.dtype = jnp.dtype(self.meta["dtype"])
        self.cache = None
        self.prevs = None
        self._refs = None
        self.t = 0

    def reset(self, ref_labels, ref_images, first_label=None):
        ref_labels, ref_images = cast_floating(
            (jnp.asarray(ref_labels), jnp.asarray(ref_images)), self.dtype)
        if first_label is None:
            shp = self.meta["shapes"]["label"]
            first_label = jnp.zeros(shp, self.dtype)
        self._refs = (ref_labels, ref_images)
        self.cache = self._calls["encode"](
            self.variables, ref_labels, ref_images,
            jnp.asarray(first_label, self.dtype))
        self.prevs = None
        self.t = 0

    def step(self, label) -> Array:
        assert self._refs is not None, "call reset() first"
        label = jnp.asarray(label, self.dtype)
        ref_l, ref_i = self._refs
        if self.t == 0:
            frame, self.prevs = self._calls["step0"](
                self.variables, self.cache, label, ref_l, ref_i)
        else:
            frame, self.prevs = self._calls["step"](
                self.variables, self.cache, label, ref_l, ref_i, self.prevs)
        self.t += 1
        return frame


def load_serving(out_dir: str) -> ServingSession:
    return ServingSession(out_dir)
