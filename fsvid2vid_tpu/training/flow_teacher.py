"""Pseudo-ground-truth flow teacher (reference models/flownet.py).

Wraps the frozen FlowNet2 port: per training iteration computes
  * prev-frame flow (only after niter_single — flownet.py:42-44), and
  * reference flow ref->now when warp_ref (flownet.py:46-47),
on the first 3 channels of the label (pose) or the real image (face/street)
(train.py:48-49), with confidence = (||im1 - warp(im2, flow)||^2 < 0.02)
(flownet.py:75).  Images are bilinearly resized to /64 multiples for the
network and flows rescaled back (flownet.py:67-79).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.models.flownet.flownet2 import FlowNet2
from fsvid2vid_tpu.ops.image_ops import resize_bilinear
from fsvid2vid_tpu.ops.warp import flow_warp


class FlowTeacher:
    """Callable with the Trainer flow_teacher interface:
    teacher(cfg, seq, epoch) -> (flow_gt [ref, prev], conf_gt [ref, prev]),
    each entry (B, T, H, W, {2|1}) or None."""

    def __init__(self, cfg: Config, params=None, rng: Optional[jax.Array] = None):
        self.model = FlowNet2()
        if params is None:
            h = w = 64
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            params = self.model.init(rng, jnp.zeros((1, h, w, 3)),
                                     jnp.zeros((1, h, w, 3)))["params"]
        self.params = jax.tree.map(jax.lax.stop_gradient, params)

    def load_torch_checkpoint(self, path: str):
        from fsvid2vid_tpu.utils.torch_port import import_flownet2
        self.params = import_flownet2(jax.device_get(self.params), path)

    # ------------------------------------------------------------------
    def __call__(self, cfg: Config, seq: Dict, epoch: int):
        src = seq["tgt_label"] if cfg.is_pose else seq["tgt_image"]
        ref_src = seq["ref_labels"] if cfg.is_pose else seq["ref_images"]
        image_now = jnp.asarray(src[..., :3])           # (B, T, H, W, 3)
        image_ref = jnp.asarray(ref_src[:, 0, ..., :3])  # first reference

        flow_prev = conf_prev = flow_ref = conf_ref = None
        if not cfg.is_train or epoch > cfg.niter_single:
            image_prev = jnp.concatenate(
                [image_now[:, 0:1], image_now[:, :-1]], axis=1)
            flow_prev, conf_prev = self._flow_seq(image_now, image_prev)
        if cfg.warp_ref:
            ref_rep = jnp.broadcast_to(image_ref[:, None], image_now.shape)
            flow_ref, conf_ref = self._flow_seq(image_now, ref_rep)
        return [flow_ref, flow_prev], [conf_ref, conf_prev]

    def _flow_seq(self, a, b):
        bsz, t = a.shape[:2]
        flat_a = a.reshape((-1,) + a.shape[2:])
        flat_b = b.reshape((-1,) + b.shape[2:])
        flow, conf = compute_flow_and_conf(self.model, self.params, flat_a,
                                           flat_b)
        return (flow.reshape((bsz, t) + flow.shape[1:]),
                conf.reshape((bsz, t) + conf.shape[1:]))


@functools.partial(jax.jit, static_argnums=(0,))
def compute_flow_and_conf(model: FlowNet2, params, im1, im2):
    """flownet.py:64-79 semantics on NHWC [-1,1]-ish images."""
    b, h, w, _ = im1.shape
    nh, nw = h // 64 * 64, w // 64 * 64
    im1r, im2r = im1, im2
    if (nh, nw) != (h, w):
        im1r = resize_bilinear(im1, (nh, nw))
        im2r = resize_bilinear(im2, (nh, nw))
    flow = model.apply({"params": params}, im1r, im2r)
    err = im1r - flow_warp(im2r, flow)
    conf = (jnp.sum(err * err, axis=-1, keepdims=True) < 0.02).astype(jnp.float32)
    if (nh, nw) != (h, w):
        flow = resize_bilinear(flow, (h, w)) * (h / nh)
        conf = resize_bilinear(conf, (h, w))
    return jax.lax.stop_gradient(flow), jax.lax.stop_gradient(conf)
