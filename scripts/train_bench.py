"""Measure the full alternating D+G train step on one TPU chip.

Uses the same scan-amortized harness as profile_frame.py (the remote relay
costs ~28 ms per dispatch, so K steps run inside one jitted lax.scan carrying
the train state; distinct batches per iteration prevent CSE).

Usage: python scripts/train_bench.py [face|pose|face512] [batch] [K] [scopes]

`scopes` (pose only): comma subset of blocks,flow,embed,vgg — the remat
granularity to benchmark (cfg.remat_scopes); "none" disables remat entirely.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fsvid2vid_tpu.cache import enable_compilation_cache
from fsvid2vid_tpu.config import face_config, pose_config
from fsvid2vid_tpu.training.state import build_models, init_state
from fsvid2vid_tpu.training.step import StepFlags, init_prevs, train_step

WHICH = sys.argv[1] if len(sys.argv) > 1 else "face"
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K = int(sys.argv[3]) if len(sys.argv) > 3 else 4
SCOPES = sys.argv[4] if len(sys.argv) > 4 else None
RUNS = 3


def make_cfg():
    extra = {}
    if SCOPES == "none":
        extra = dict(remat=False)
    elif SCOPES:
        extra = dict(remat=True, remat_scopes=SCOPES)
    if WHICH == "pose":
        # full pose training config (BASELINE.json config 5): face D +
        # refiner + 6ch maps at H=512,W=256 (scripts/pose/train_g8.sh)
        return pose_config(batch_size=BS, fine_size=256, load_size=256,
                           refine_face=True, compute_dtype="bfloat16",
                           **extra)
    if WHICH == "face_novgg":
        # round-1 comparison point (BASELINE.md measured no-VGG fp32/bf16)
        return face_config(batch_size=BS, fine_size=256, load_size=256,
                           no_vgg_loss=True, compute_dtype="bfloat16")
    if WHICH == "face512":
        return face_config(batch_size=BS, fine_size=512, load_size=512,
                           num_D=2, compute_dtype="bfloat16")
    return face_config(batch_size=BS, fine_size=256, load_size=256,
                       compute_dtype="bfloat16")


def main():
    enable_compilation_cache()
    cfg = make_cfg()
    models = build_models(cfg)
    rng = np.random.RandomState(0)
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc

    def batch_of(seed):
        r = np.random.RandomState(seed)
        return {
            "tgt_label": jnp.asarray(r.randn(BS, h, w, cl).astype(np.float32)),
            "tgt_image": jnp.asarray(
                np.tanh(r.randn(BS, h, w, 3)).astype(np.float32)),
            "ref_labels": jnp.asarray(
                r.randn(BS, 1, h, w, cl).astype(np.float32)),
            "ref_images": jnp.asarray(
                np.tanh(r.randn(BS, 1, h, w, 3)).astype(np.float32)),
            "flow_gt": [None, None],
            "conf_gt": [None, None],
        }

    batch0 = batch_of(0)
    t0 = time.perf_counter()
    state = jax.jit(lambda k, b: init_state(cfg, models, k, b),
                    static_argnums=())(jax.random.PRNGKey(0), batch0)
    jax.block_until_ready(state.params_G)
    print(f"[init: {time.perf_counter() - t0:.1f}s]", file=sys.stderr,
          flush=True)
    prevs0 = init_prevs(cfg, batch0)
    if cfg.compute_dtype == "bfloat16":
        # advance_prevs carries bf16 label/fake in steady state
        prevs0 = dict(prevs0,
                      label=prevs0["label"].astype(jnp.bfloat16),
                      fake=prevs0["fake"].astype(jnp.bfloat16))
    flags = StepFlags(warp_prev=True, has_prev=True)

    ARRAY_KEYS = ("tgt_label", "tgt_image", "ref_labels", "ref_images")

    def stack_batches(lo):
        bs = [batch_of(100 * lo + i) for i in range(K)]
        return {k: jnp.stack([b[k] for b in bs]) for k in ARRAY_KEYS}

    def body(carry, batch):
        st, pv = carry
        batch = dict(batch, flow_gt=[None, None], conf_gt=[None, None])
        st, pv2, losses, _vis = train_step(cfg, models, st, batch, pv, flags,
                                     jax.random.PRNGKey(0))
        # keep the carry dtype stable across configs (refiner paths emit f32)
        pv2 = {k: v.astype(pv[k].dtype) for k, v in pv2.items()}
        return (st, pv2), losses["G_total"]

    @jax.jit
    def run(st, pv, batches):
        (st, pv), tot = jax.lax.scan(body, (st, pv), batches)
        return st.step, jnp.sum(tot)

    sets = [stack_batches(i) for i in range(RUNS + 1)]
    t0 = time.perf_counter()
    s, tot = run(state, prevs0, sets[0])
    print(f"[compile+warm: {time.perf_counter() - t0:.1f}s "
          f"steps={int(s)} G_total={float(tot):.3f}]", file=sys.stderr,
          flush=True)
    best = float("inf")
    for st_b in sets[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(run(state, prevs0, st_b))
        best = min(best, time.perf_counter() - t0)
    # ~28 ms relay dispatch overhead, negligible vs K full steps; report raw
    per = best / K
    print(f"{WHICH} bs{BS} {cfg.height}x{cfg.width} "
          f"{cfg.compute_dtype}: {per * 1000:.1f} ms/step "
          f"({BS / per:.2f} samples/s/chip)", flush=True)


if __name__ == "__main__":
    main()
