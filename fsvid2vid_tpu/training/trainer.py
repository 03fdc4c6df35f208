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
from fsvid2vid_tpu.training.step import (
    StepFlags, init_prevs, train_step, train_step_faithful)


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
                 log_fn: Callable[[str], None] = print, visualizer=None):
        self.cfg = cfg
        self.models = models or build_models(cfg)
        self.log = log_fn
        self.vis = visualizer  # utils.visualizer.Visualizer or None
        # DP mesh over the largest device count that divides the local batch
        n_dev = jax.device_count()
        local_batch = max(1, cfg.batch_size // max(jax.process_count(), 1))
        while n_dev > 1 and local_batch % n_dev != 0:
            n_dev -= 1
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        self.state: Optional[TrainState] = None
        self.start_epoch = 1
        self.epoch_iter = 0
        self.global_step = 0  # TB curve x-axis (survives resume via cursor)
        self._temporal_initialized = False
        self.pool = None
        if cfg.pool_size > 0:
            from fsvid2vid_tpu.utils.image_pool import ImagePool
            self.pool = ImagePool(cfg.pool_size, seed=cfg.seed)

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
        elif self.cfg.load_pretrain:
            # --load_pretrain: warm-start the network weights (and norm/
            # spectral collections) from another experiment's checkpoint dir;
            # optimizers and the schedule start fresh (train_options.py:16,
            # base_model.py:57-66).
            pre, _, _ = ckpt_lib.restore(self.cfg, self.state,
                                         base_dir=self.cfg.load_pretrain)
            if pre is not None:
                self.state = self.state.replace(
                    params_G=pre.params_G, params_D=pre.params_D,
                    aux_G=pre.aux_G, aux_D=pre.aux_D)
                self.log(f"warm-started weights from {self.cfg.load_pretrain}")
            else:
                self.log(f"WARNING: --load_pretrain dir "
                         f"{self.cfg.load_pretrain} has no 'latest' checkpoint")
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

        # mid-epoch resume: skip through the iterations already done before
        # the crash (reference trainer.py:27-30 + iter.txt cursor)
        start_iter = self.epoch_iter if epoch == self.start_epoch else 0
        if start_iter:
            self.log(f"skipping {start_iter} already-completed iters "
                     f"of epoch {epoch}")

        losses_accum: Dict[str, float] = {}
        count = 0
        t0 = time.time()
        rng = jax.random.PRNGKey(cfg.seed * 100003 + epoch)
        for idx, seq in enumerate(data_iter):
            if idx < start_iter:
                continue
            T = seq["tgt_label"].shape[1]
            # teacher pseudo-GT flow for the whole sequence
            flow_gt_seq = conf_gt_seq = None
            if flow_teacher is not None and not cfg.no_flow_gt:
                flow_gt_seq, conf_gt_seq = flow_teacher(cfg, seq, epoch)

            prevs = None
            seq_losses: Dict[str, jnp.ndarray] = {}
            visuals = None
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
                if self.pool is not None:
                    b, h, w = batch_t["tgt_image"].shape[:3]
                    pf, pm = self.pool.begin_step(b, (h, w, 3))
                    batch_t["pool_fake"] = jnp.asarray(pf)
                    batch_t["pool_mask"] = jnp.asarray(pm)
                if self.mesh is not None:
                    batch_t = shard_batch(self.mesh, batch_t)
                if prevs is None:
                    prevs = init_prevs(cfg, batch_t)
                    if self.mesh is not None:
                        prevs = shard_batch(self.mesh, prevs)
                flags = StepFlags(warp_prev=warp_prev,
                                  has_prev=warp_prev and t > 0,
                                  use_pool=self.pool is not None)
                rng, step_rng = jax.random.split(rng)
                step_fn = (train_step_faithful
                           if cfg.step_mode == "faithful" else train_step)
                self.state, prevs, losses, visuals = step_fn(
                    cfg, self.models, self.state, batch_t, prevs, flags,
                    step_rng)
                if self.pool is not None:
                    self.pool.commit(
                        np.asarray(jax.device_get(visuals["fake_image"]),
                                   np.float32))
                # accumulate on-device; averaged over ALL frames of the
                # sequence (not just the last) when logged below
                for k, v in losses.items():
                    seq_losses[k] = seq_losses.get(k, 0.0) + v
            for k, v in seq_losses.items():
                losses_accum[k] = losses_accum.get(k, 0.0) + float(v) / T
            count += 1
            self.global_step += 1
            iters_done = idx + 1
            bs = max(cfg.batch_size, 1)
            if cfg.print_freq and iters_done % max(1, cfg.print_freq // bs) == 0:
                dt = (time.time() - t0) / max(count, 1)
                avg = {k: v / count for k, v in losses_accum.items()}
                if self.vis is not None:
                    self.vis.print_current_errors(epoch, iters_done, avg, dt)
                    self.vis.plot_current_errors(avg, self.global_step)
                else:
                    msg = " ".join(f"{k}:{v:.3f}"
                                   for k, v in sorted(avg.items()))
                    self.log(f"epoch {epoch} iter {iters_done} "
                             f"({dt:.2f}s/it) {msg}")
            # display_freq image dumps (reference trainer.py:53-56 +
            # save_all_tensors :96-111): last frame of this sequence
            if (self.vis is not None and cfg.display_freq
                    and iters_done % max(1, cfg.display_freq // bs) == 0):
                from fsvid2vid_tpu.utils.visualizer import display_visuals
                self.vis.save_images(display_visuals(cfg, visuals),
                                     epoch, iters_done)
            # mid-epoch 'latest' checkpoint with the iter cursor (reference
            # save_latest_freq, models/models.py:48-62)
            if (cfg.save_latest_freq
                    and iters_done % max(1, cfg.save_latest_freq // bs) == 0):
                ckpt_lib.save(cfg, self.state, epoch, epoch_iter=iters_done,
                              label="latest")
                self.log(f"saved latest (epoch {epoch}, iter {iters_done})")
        self.epoch_iter = 0  # epoch completed; next epoch starts clean
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
