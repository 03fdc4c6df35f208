"""Segment-level profile of the 512px inference frame step on one TPU chip.

Times each stage of FewShotGenerator.synthesize as its own jitted program and
reports wall-clock plus XLA cost analysis (FLOPs, HBM bytes), so optimization
effort goes where the time actually is (VERDICT r1: 34.6 ms vs ~15.5 ms HBM
floor).  Run: python scripts/profile_frame.py [--size 512]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
from fsvid2vid_tpu.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.training.state import build_models
from fsvid2vid_tpu.parallel.precision import bf16_params, cast_floating
from fsvid2vid_tpu.models.input_process import use_valid_labels

REPS = 6


def timed(name, fn, make_args, static_args=()):
    """Compile fn(*make_args(i)), time REPS distinct-input calls (the remote
    tunnel memoizes identical executions), report ms + cost analysis."""
    jfn = jax.jit(fn)
    args0 = make_args(0)
    lowered = jfn.lower(*args0)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", 0.0)
    byts = sum(v for k, v in cost.items() if k.startswith("bytes accessed"))
    # warmup
    r = jfn(*args0)
    _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(1, REPS + 1):
        r = jfn(*make_args(i))
        _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:28s} {dt:8.2f} ms   {flops/1e9:8.1f} GFLOP   "
          f"{byts/1e9:7.2f} GB HBM   "
          f"(bw-floor {byts/819e9*1000:5.2f} ms, mxu-floor {flops/197e12*1000:5.2f} ms)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    size = args.size

    cfg = face_config(batch_size=1, is_train=False, fine_size=size,
                      load_size=size)
    models = build_models(cfg)
    netG = models.netG
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
    rng = np.random.RandomState(0)

    label = jnp.asarray(rng.randn(1, h, w, cl).astype(np.float32))
    ref_l = jnp.asarray(rng.randn(1, 1, h, w, cl).astype(np.float32))
    ref_i = jnp.asarray(np.tanh(rng.randn(1, 1, h, w, 3)).astype(np.float32))
    n_prev = cfg.n_frames_G - 1
    prev_l = jnp.zeros((1, h, w, cl * n_prev), jnp.float32)
    prev_i = jnp.zeros((1, h, w, 3 * n_prev), jnp.float32)
    variables = netG.init(jax.random.PRNGKey(0), label, ref_l, ref_i,
                          prev_l, prev_i, warp_prev=cfg.n_frames_G > 1,
                          train=False)
    variables = bf16_params(variables)
    params = variables["params"]
    aux = {k: v for k, v in variables.items() if k != "params"}
    vfull = {"params": params, **aux}

    bf16 = jnp.bfloat16
    label, ref_l, ref_i, prev_l, prev_i = cast_floating(
        (label, ref_l, ref_i, prev_l, prev_i), bf16)

    def randin(i, shape):
        r = np.random.RandomState(1000 + i)
        return jnp.asarray(r.randn(*shape).astype(np.float32)).astype(bf16)

    # --- reference cache (computed once at t=0, off the per-frame path) ---
    lv = use_valid_labels(cfg, label)
    rlv = use_valid_labels(cfg, ref_l)
    cache = jax.jit(lambda l, rl, ri: netG.apply(
        vfull, rl, ri, l, method=netG.encode_reference, mutable=False))(
        label, ref_l, ref_i)

    # ---- segment: label embedding ----
    def seg_label_embed(lbl):
        return netG.apply(vfull, lbl,
                          weights=cache["embedding_weights"],
                          train=False, mutable=False,
                          method=lambda m, lbl, weights, train: m.label_embedding(
                              lbl, weights=weights, train=train))
    timed("label_embedding", seg_label_embed,
          lambda i: (randin(i, (1, h, w, cl)),))

    # ---- segment: one flow network invocation ----
    def seg_flow(lbl, pl, pi):
        return netG.apply(vfull, lbl, pl, pi, train=False, mutable=False,
                          method=lambda m, a, b, c, train: m.flow_network_ref(
                              a, b, c, train=train))
    timed("flow_network (x1)", seg_flow,
          lambda i: (randin(i, (1, h, w, cl)), randin(i + 50, (1, h, w, cl)),
                     randin(i + 100, (1, h, w, 3))))

    # ---- segment: full flow_generation (both branches + warps) ----
    def seg_flowgen(lbl, rl, ri, pl, pi):
        return netG.apply(vfull, lbl, rl, ri, pl, pi, None, True, False,
                          mutable=False,
                          method=lambda m, a, b, c, d, e, f, g, t: m.flow_generation(
                              a, b, c, d, e, f, warp_prev=g, train=t))
    timed("flow_generation (both)", seg_flowgen,
          lambda i: (randin(i, (1, h, w, cl)), randin(i + 50, (1, 1, h, w, cl)),
                     randin(i + 100, (1, 1, h, w, 3)),
                     randin(i + 150, (1, h, w, cl * n_prev)),
                     randin(i + 200, (1, h, w, 3 * n_prev))))

    # ---- segment: spade-combine embedders (x2) ----
    def seg_sc(ds0, ds1):
        return netG.apply(vfull, [ds0, ds1], False, mutable=False,
                          method=lambda m, ds, t: m._spade_combine(
                              [jnp.zeros((1, h // (2 ** k), w // (2 ** k), 1),
                                         bf16) for k in range(cfg.n_downsample_G + 1)][::-1]
                              if False else
                              [None] * (cfg.n_downsample_G + 1), ds, t))
    # _spade_combine needs encoded_label list; simpler: time embedders directly
    def seg_embedders(ds0, ds1):
        def run(m, a, b, t):
            e0 = m.img_ref_embedding(a, train=t)
            e1 = (m.img_ref_embedding if m.cfg.prev_embedding_is_shared
                  else m.img_prev_embedding)(b, train=t)
            return e0, e1
        return netG.apply(vfull, ds0, ds1, False, mutable=False, method=run)
    timed("sc embedders (x2)", seg_embedders,
          lambda i: (randin(i, (1, h, w, 4)), randin(i + 50, (1, h, w, 4))))

    # ---- segment: main branch ----
    enc_l = jax.jit(seg_label_embed)(label)
    ds0 = randin(7, (1, h, w, 4))
    ds1 = randin(8, (1, h, w, 4))
    def seg_main(x_kld, enc, d0, d1):
        def run(m, x, e, a, b, t):
            e = m._spade_combine(list(e), [a, b], t)
            gen = dict(conv_weights=cache["conv_weights"],
                       norm_weights=cache["norm_weights"])
            return m._main_branch(x, e, gen, None, t)
        return netG.apply(vfull, x_kld, enc, d0, d1, False, mutable=False,
                          method=run)
    timed("main branch (+sc embed)", seg_main,
          lambda i: (cache["x_kld"] + 0 * i, enc_l, randin(i, (1, h, w, 4)),
                     randin(i + 50, (1, h, w, 4))))

    # ---- full synthesize ----
    def seg_full(lbl, rl, ri, pl, pi):
        lv = use_valid_labels(cfg, lbl)
        rlv = use_valid_labels(cfg, rl)
        return netG.apply(vfull, lv, rlv, ri, cache, pl, pi,
                          warp_prev=True, method=netG.synthesize,
                          mutable=False)["img_final"]
    timed("FULL synthesize", seg_full,
          lambda i: (randin(i, (1, h, w, cl)), randin(i + 50, (1, 1, h, w, cl)),
                     randin(i + 100, (1, 1, h, w, 3)),
                     randin(i + 150, (1, h, w, cl * n_prev)),
                     randin(i + 200, (1, h, w, 3 * n_prev))))


if __name__ == "__main__":
    main()
