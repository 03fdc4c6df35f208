"""Checkpoint save/restore via orbax (reference base_model.py:51-93 +
models/models.py:48-62).

Improvements over the reference (SURVEY §5): the FULL train state is saved —
generator(s), discriminators, spectral/batch_stats collections, AND both Adam
optimizer states (the torch code drops optimizer moments on resume) — plus the
(epoch, iter) cursor that replaces `iter.txt`.  Layout mirrors the reference:
`<ckpt_dir>/<name>/{latest,epoch_N}` with a `latest` alias.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.training.state import TrainState


def ckpt_dir(cfg: Config) -> str:
    return os.path.abspath(os.path.join(cfg.checkpoints_dir, cfg.name))


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save(cfg: Config, state: TrainState, epoch: int, epoch_iter: int = 0,
         label: Optional[str] = None) -> str:
    """Save under `label` (default 'latest'); also saves cfg JSON once."""
    base = ckpt_dir(cfg)
    os.makedirs(base, exist_ok=True)
    cfg_path = os.path.join(base, "config.json")
    if not os.path.exists(cfg_path):
        cfg.save(cfg_path)
    payload = {"state": jax.device_get(state),
               "cursor": {"epoch": epoch, "epoch_iter": epoch_iter}}
    path = os.path.join(base, label or "latest")
    _checkpointer().save(path, payload, force=True)
    return path


def save_epoch(cfg: Config, state: TrainState, epoch: int) -> None:
    """latest + per-epoch snapshot (models/models.py:48-62)."""
    save(cfg, state, epoch, label="latest")
    if cfg.save_epoch_freq and epoch % cfg.save_epoch_freq == 0:
        save(cfg, state, epoch, label=f"epoch_{epoch}")


def restore(cfg: Config, template: TrainState,
            label: str = "latest") -> Tuple[Optional[TrainState], int, int]:
    """Returns (state, epoch, epoch_iter); (None, 1, 0) if no checkpoint."""
    path = os.path.join(ckpt_dir(cfg), label)
    if not os.path.exists(path):
        return None, 1, 0
    payload = _checkpointer().restore(
        path, item={"state": template,
                    "cursor": {"epoch": 0, "epoch_iter": 0}})
    cur = payload["cursor"]
    return payload["state"], int(cur["epoch"]), int(cur["epoch_iter"])
