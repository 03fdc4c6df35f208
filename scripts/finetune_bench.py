"""Measure test-time finetune feasibility at K references (verdict r4 #5).

The pose serving protocol adapts {fc, conv_img, up} + D for 100 Adam steps on
the reference set before synthesis (reference vid2vid_model.py:207-237; ours
inference/finetune.py).  At K=8 512px the generator's multi-reference
attention runs in train mode — the chunked XLA path, not the Pallas flash
kernel (which has no VJP) — so this measures whether the protocol fits one
chip and what it costs end-to-end.

Times ONE jitted _finetune_step via the scan-amortized harness (distinct
target indices per iteration), then reports the projected 100-iter wall time.

Usage: python scripts/finetune_bench.py [K] [SIZE] [ITERS_SCAN]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fsvid2vid_tpu.cache import enable_compilation_cache
from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.inference.finetune import _finetune_step, masked_tx
from fsvid2vid_tpu.training.state import (
    build_models, init_state, make_optimizers)
from fsvid2vid_tpu.training import step as step_lib

K_REF = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
NSCAN = int(sys.argv[3]) if len(sys.argv) > 3 else 4
RUNS = 3


def main():
    enable_compilation_cache()
    # inference-protocol config (is_train=False gates flow/mask losses off,
    # matching the reference's finetune loss collector) + bf16 compute
    cfg = face_config(batch_size=1, is_train=False, fine_size=SIZE,
                      load_size=SIZE, n_shot=K_REF,
                      compute_dtype="bfloat16").replace(finetune=True)
    models = build_models(cfg)
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
    rng = np.random.RandomState(0)
    ref_l = jnp.asarray(rng.randn(1, K_REF, h, w, cl).astype(np.float32))
    ref_i = jnp.asarray(
        np.tanh(rng.randn(1, K_REF, h, w, 3)).astype(np.float32))

    batch0 = dict(tgt_label=ref_l[:, 0], tgt_image=ref_i[:, 0],
                  ref_labels=ref_l, ref_images=ref_i,
                  flow_gt=[None, None], conf_gt=[None, None])
    t0 = time.perf_counter()
    state = jax.jit(lambda k, b: init_state(cfg, models, k, b))(
        jax.random.PRNGKey(0), batch0)
    jax.block_until_ready(state.params_G)
    print(f"[init: {time.perf_counter() - t0:.1f}s]", file=sys.stderr,
          flush=True)
    opt_G_tx, _opt_D = make_optimizers(cfg)
    state = state.replace(
        opt_G=masked_tx(opt_G_tx, state.params_G).init(state.params_G))
    prevs = step_lib.init_prevs(cfg, batch0)

    def body(carry, idx):
        st = carry
        tgt_l = jax.lax.dynamic_index_in_dim(ref_l, idx, 1, keepdims=False)
        tgt_i = jax.lax.dynamic_index_in_dim(ref_i, idx, 1, keepdims=False)
        b = dict(tgt_label=tgt_l, tgt_image=tgt_i, ref_labels=ref_l,
                 ref_images=ref_i, flow_gt=[None, None], conf_gt=[None, None])
        st, _, losses = _finetune_step(cfg, models, st, b, prevs,
                                       jax.random.PRNGKey(0))
        return st, losses["G_GAN"]

    @jax.jit
    def run(st, idxs):
        st, g = jax.lax.scan(body, st, idxs)
        return st.step, jnp.sum(g)

    idx_sets = [jnp.asarray(np.random.RandomState(i).randint(
        0, K_REF, NSCAN).astype(np.int32)) for i in range(RUNS + 1)]
    t0 = time.perf_counter()
    s, g = run(state, idx_sets[0])
    print(f"[compile+warm: {time.perf_counter() - t0:.1f}s steps={int(s)} "
          f"sumG={float(g):.3f}]", file=sys.stderr, flush=True)
    best = float("inf")
    for ids in idx_sets[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(run(state, ids))
        best = min(best, time.perf_counter() - t0)
    per = best / NSCAN
    print(f"finetune step K={K_REF} {h}x{w} bf16: {per * 1000:.1f} ms/iter "
          f"-> 100-iter adaptation {per * 100:.1f} s", flush=True)


if __name__ == "__main__":
    main()
