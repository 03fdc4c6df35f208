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
    """latest + per-epoch snapshot.  The cursor records (epoch+1, 0) — the
    epoch is COMPLETE, resume starts the next one (models/models.py:61
    `np.savetxt(iter_path, (epoch+1, 0))`)."""
    save(cfg, state, epoch + 1, epoch_iter=0, label="latest")
    if cfg.save_epoch_freq and epoch % cfg.save_epoch_freq == 0:
        save(cfg, state, epoch + 1, epoch_iter=0, label=f"epoch_{epoch}")


def restore(cfg: Config, template: TrainState, label: str = "latest",
            base_dir: Optional[str] = None,
            ) -> Tuple[Optional[TrainState], int, int]:
    """Returns (state, epoch, epoch_iter); (None, 1, 0) if no checkpoint.

    Restore is structural-subset tolerant in both directions (mirroring the
    reference's layered partial-load fallbacks, base_model.py:68-93): stored
    trees may contain networks the current phase doesn't build (e.g. loading
    a train checkpoint for inference drops the discriminators), and template
    leaves missing from the checkpoint keep their initialized values.

    `base_dir` overrides the checkpoint directory — used by --load_pretrain
    (train_options.py:16, base_model.py:57-66) to warm-start from another
    experiment's weights."""
    path = os.path.join(base_dir or ckpt_dir(cfg), label)
    if not os.path.exists(path):
        return None, 1, 0
    stored = _checkpointer().restore(path)

    import jax

    def merge(tmpl, st):
        if isinstance(tmpl, dict) or hasattr(tmpl, "items"):
            if not (isinstance(st, dict) or hasattr(st, "items")):
                return tmpl
            return type(tmpl)(
                {k: merge(v, st[k]) if k in st else v
                 for k, v in tmpl.items()})
        if st is None:
            return tmpl
        arr = jax.numpy.asarray(st)
        if hasattr(tmpl, "shape") and tuple(tmpl.shape) != tuple(arr.shape):
            return tmpl  # size-mismatch fallback (base_model.py:84-85)
        return arr.astype(tmpl.dtype) if hasattr(tmpl, "dtype") else arr

    # opt states are NamedTuple pytrees: restore via flattening when shapes match
    def merge_opt(tmpl_opt, st_opt):
        if st_opt is None:
            return tmpl_opt
        tmpl_leaves, treedef = jax.tree_util.tree_flatten(tmpl_opt)
        st_leaves = jax.tree_util.tree_leaves(st_opt)
        if len(tmpl_leaves) != len(st_leaves):
            return tmpl_opt
        new_leaves = [jax.numpy.asarray(s) if hasattr(t, "shape")
                      and tuple(t.shape) == tuple(jax.numpy.shape(s)) else t
                      for t, s in zip(tmpl_leaves, st_leaves)]
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    state = template.replace(
        step=jax.numpy.asarray(stored["state"].get("step", template.step)),
        params_G=merge(template.params_G, stored["state"].get("params_G", {})),
        params_D=merge(template.params_D, stored["state"].get("params_D", {})),
        aux_G=merge(template.aux_G, stored["state"].get("aux_G", {})),
        aux_D=merge(template.aux_D, stored["state"].get("aux_D", {})),
        opt_G=merge_opt(template.opt_G, stored["state"].get("opt_G")),
        opt_D=merge_opt(template.opt_D, stored["state"].get("opt_D")),
        vgg_params=(merge(template.vgg_params,
                          stored["state"].get("vgg_params"))
                    if template.vgg_params is not None else None),
    )
    cur = stored["cursor"]
    return state, int(cur["epoch"]), int(cur["epoch_iter"])
