"""Training driver: epoch loop, temporal curriculum, checkpoint cadence,
loss logging (reference train.py:19-68 + models/trainer.py + the schedule
helpers in models/models.py:64-76).

Curriculum (SURVEY §5):
  * epochs 1..niter_single: single-frame phase (warp_prev=False, sequences of
    length n_frames_total=2 but only independent frames matter);
  * epoch niter_single+1: temporal phase starts (warp_prev=True) — here a pure
    flag flip, no architecture mutation; if the temporal flow net is separate
    (sep_flow_prev / n_frames_G > 2) its params are copied from the reference
    branch (generator.py:176 load_pretrained_net);
  * every niter_step epochs the sampled sequence length doubles up to 30
    (base_dataset.py:22-27) — shapes stay static: sequences stream through the
    per-frame step, so only the Python loop length changes;
  * LR decays linearly after `niter` epochs.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.parallel.mesh import make_mesh, shard_batch
from fsvid2vid_tpu.training import checkpoint as ckpt_lib
from fsvid2vid_tpu.training.state import (
    ModelBundle, TrainState, build_models, init_state, set_epoch_lr)
from fsvid2vid_tpu.training.step import StepFlags, init_prevs, train_step


def n_frames_total_for_epoch(cfg: Config, epoch: int) -> int:
    """Sequence-length curriculum: double every niter_step epochs past
    niter_single, capped at 30 (models/models.py:72-76, base_dataset.py:22-27)."""
    if epoch <= cfg.niter_single:
        return 1
    n_doublings = (epoch - cfg.niter_single - 1) // cfg.niter_step + 1
    return min(cfg.n_frames_total * (2 ** max(0, n_doublings - 1)), 30)


def copy_temporal_params(cfg: Config, state: TrainState) -> TrainState:
    """At the temporal transition, initialize the separate prev-flow network
    and prev-embedding from their reference-branch twins
    (generator.py:162-177 init_temporal_network)."""
    params = jax.device_get(state.params_G)
    g = dict(params["G"])
    def copy_matching(src_name, dst_name):
        if src_name in g and dst_name in g:
            src, dst = g[src_name], g[dst_name]
            g[dst_name] = jax.tree.map(
                lambda s, d: s if s.shape == d.shape else d, src, dst)
    if not cfg.flow_temp_is_shared and cfg.warp_ref:
        copy_matching("flow_network_ref", "flow_network_temp")
    if cfg.spade_combine and not cfg.prev_embedding_is_shared and cfg.warp_ref:
        copy_matching("img_ref_embedding", "img_prev_embedding")
    params = dict(params)
    params["G"] = g
    return state.replace(params_G=params)


class Trainer:
    def __init__(self, cfg: Config, models: Optional[ModelBundle] = None,
                 log_fn: Callable[[str], None] = print):
        self.cfg = cfg
        self.models = models or build_models(cfg)
        self.log = log_fn
        # DP mesh over the largest device count that divides the local batch
        n_dev = jax.device_count()
        local_batch = max(1, cfg.batch_size // max(jax.process_count(), 1))
        while n_dev > 1 and local_batch % n_dev != 0:
            n_dev -= 1
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        self.state: Optional[TrainState] = None
        self.start_epoch = 1
        self.epoch_iter = 0
        self._temporal_initialized = False

    # ------------------------------------------------------------------
    def setup(self, sample_batch: Dict[str, jnp.ndarray],
              rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        self.state = init_state(self.cfg, self.models, rng, sample_batch)
        restored, epoch, it = ckpt_lib.restore(self.cfg, self.state)
        if restored is not None:
            self.state = restored
            self.start_epoch, self.epoch_iter = epoch, it
            self.log(f"resumed from epoch {epoch} iter {it}")
        return self.state

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, data_iter: Iterable[Dict],
                    flow_teacher=None) -> Dict[str, float]:
        """Run one epoch.  data_iter yields sequence batches:
        {tgt_label (B,T,H,W,C), tgt_image (B,T,H,W,3), ref_labels, ref_images}.
        """
        cfg = self.cfg
        self.state = set_epoch_lr(cfg, self.state, epoch)
        warp_prev = epoch > cfg.niter_single and cfg.n_frames_G > 1
        if warp_prev and not self._temporal_initialized:
            self.state = copy_temporal_params(cfg, self.state)
            self._temporal_initialized = True
            self.log("---------- temporal phase begins ----------")

        losses_accum: Dict[str, float] = {}
        count = 0
        t0 = time.time()
        rng = jax.random.PRNGKey(cfg.seed * 100003 + epoch)
        for idx, seq in enumerate(data_iter):
            T = seq["tgt_label"].shape[1]
            # teacher pseudo-GT flow for the whole sequence
            flow_gt_seq = conf_gt_seq = None
            if flow_teacher is not None and not cfg.no_flow_gt:
                flow_gt_seq, conf_gt_seq = flow_teacher(cfg, seq, epoch)

            prevs = None
            seq_losses: Dict[str, jnp.ndarray] = {}
            for t in range(T):
                batch_t = {
                    "tgt_label": seq["tgt_label"][:, t],
                    "tgt_image": seq["tgt_image"][:, t],
                    "ref_labels": seq["ref_labels"],
                    "ref_images": seq["ref_images"],
                    "flow_gt": ([f[:, t] if f is not None else None
                                 for f in flow_gt_seq]
                                if flow_gt_seq is not None else [None, None]),
                    "conf_gt": ([c[:, t] if c is not None else None
                                 for c in conf_gt_seq]
                                if conf_gt_seq is not None else [None, None]),
                }
                if self.mesh is not None:
                    batch_t = shard_batch(self.mesh, batch_t)
                if prevs is None:
                    prevs = init_prevs(cfg, batch_t)
                    if self.mesh is not None:
                        prevs = shard_batch(self.mesh, prevs)
                flags = StepFlags(warp_prev=warp_prev,
                                  has_prev=warp_prev and t > 0)
                rng, step_rng = jax.random.split(rng)
                self.state, prevs, losses = train_step(
                    cfg, self.models, self.state, batch_t, prevs, flags,
                    step_rng)
                # accumulate on-device; averaged over ALL frames of the
                # sequence (not just the last) when logged below
                for k, v in losses.items():
                    seq_losses[k] = seq_losses.get(k, 0.0) + v
            for k, v in seq_losses.items():
                losses_accum[k] = losses_accum.get(k, 0.0) + float(v) / T
            count += 1
            if cfg.print_freq and (idx + 1) % max(1, cfg.print_freq // max(cfg.batch_size, 1)) == 0:
                dt = (time.time() - t0) / max(count, 1)
                msg = " ".join(f"{k}:{v / count:.3f}"
                               for k, v in sorted(losses_accum.items()))
                self.log(f"epoch {epoch} iter {idx + 1} ({dt:.2f}s/it) {msg}")
        ckpt_lib.save_epoch(cfg, self.state, epoch)
        return {k: v / max(count, 1) for k, v in losses_accum.items()}

    # ------------------------------------------------------------------
    def fit(self, make_data_iter: Callable[[int, int], Iterable],
            flow_teacher=None):
        """Full schedule: make_data_iter(epoch, n_frames_total) -> iterable."""
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.niter + cfg.niter_decay + 1):
            nft = n_frames_total_for_epoch(cfg, epoch)
            metrics = self.train_epoch(epoch, make_data_iter(epoch, nft),
                                       flow_teacher)
            self.log(f"epoch {epoch} done: " + " ".join(
                f"{k}:{v:.3f}" for k, v in sorted(metrics.items())))
        return self.state
