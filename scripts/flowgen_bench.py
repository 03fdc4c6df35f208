"""Isolate flow_generation cost at 512px: flow nets vs warps vs embeds."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.inference.fold import fold_spectral_norm
from fsvid2vid_tpu.training.state import build_models
from fsvid2vid_tpu.parallel.precision import bf16_params, cast_floating
from fsvid2vid_tpu.ops.warp import flow_warp

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = 10
RUNS = 3


def make_scan(fn):
    def body(c, lbl):
        out = fn(lbl)
        return c + sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(out)), None

    @jax.jit
    def run(labels):
        c, _ = jax.lax.scan(body, jnp.float32(0), labels)
        return c
    return run


def _t(run, s):
    t0 = time.perf_counter()
    float(run(s))
    return time.perf_counter() - t0


def timeit(name, fn, sets, overhead):
    run = make_scan(fn)
    t0 = time.perf_counter()
    float(run(sets[0]))
    print(f"[compile {name}: {time.perf_counter()-t0:.1f}s]", file=sys.stderr,
          flush=True)
    best = min(_t(run, s) for s in sets[1:])
    print(f"{name:40s} {(best-overhead)/K*1000:8.2f} ms", flush=True)


def main():
    cfg = face_config(batch_size=1, is_train=False, fine_size=SIZE,
                      load_size=SIZE)
    models = build_models(cfg)
    netG = models.netG
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
    rng = np.random.RandomState(0)
    label = jnp.asarray(rng.randn(1, h, w, cl).astype(np.float32))
    ref_l = jnp.asarray(rng.randn(1, 1, h, w, cl).astype(np.float32))
    ref_i = jnp.asarray(np.tanh(rng.randn(1, 1, h, w, 3)).astype(np.float32))
    n_prev = cfg.n_frames_G - 1
    prev_l = jnp.asarray(rng.randn(1, h, w, cl * n_prev).astype(np.float32))
    prev_i = jnp.asarray(
        np.tanh(rng.randn(1, h, w, 3 * n_prev)).astype(np.float32))
    variables = jax.jit(lambda k: netG.init(
        k, label, ref_l, ref_i, prev_l, prev_i, warp_prev=True,
        train=False))(jax.random.PRNGKey(0))
    var_all = bf16_params(fold_spectral_norm(variables))
    label, ref_l, ref_i, prev_l, prev_i = cast_floating(
        (label, ref_l, ref_i, prev_l, prev_i), jnp.bfloat16)

    sets = [cast_floating(jnp.asarray(
        rng.randn(K, 1, h, w, cl).astype(np.float32)), jnp.bfloat16)
        for _ in range(RUNS + 1)]

    over = make_scan(lambda lbl: jnp.float32(0)[None])
    float(over(sets[0]))
    overhead = min(_t(over, s) for s in sets[1:])
    print(f"[overhead {overhead*1000:.1f} ms]", file=sys.stderr, flush=True)

    def fg_full(lbl):
        def m(g, lb):
            out = g.flow_generation(lb, ref_l, ref_i, prev_l, prev_i, None,
                                    True, False)
            return [x for grp in out for x in grp if x is not None]
        return netG.apply(var_all, lbl, method=m, mutable=False)

    def fg_flows_only(lbl):
        def m(g, lb):
            flow, mask, _, _ = g.flow_generation(lb, ref_l, ref_i, prev_l,
                                                 prev_i, None, True, False)
            return [x for x in flow + mask if x is not None]
        return netG.apply(var_all, lbl, method=m, mutable=False)

    def net2b(lbl, probe=None):
        def m(g, lb):
            return g.flow_network_ref(
                jnp.concatenate([lb, lb], 0),
                jnp.concatenate([ref_l[:, 0], prev_l], 0),
                jnp.concatenate([ref_i[:, 0], prev_i], 0), train=False,
                probe=probe)
        return netG.apply(var_all, lbl, method=m, mutable=False)

    img2 = jnp.concatenate([ref_i[:, 0], prev_i], 0)

    def warp2b(lbl):
        fl = jnp.concatenate([lbl[..., :1], lbl[..., :1]], -1)
        fl = jnp.concatenate([fl, fl], 0) * 10
        return flow_warp(img2, fl)

    print(f"=== flow_generation ablation {SIZE}px ===", flush=True)
    timeit("flow_generation (full)", fg_full, sets, overhead)
    timeit("flow_generation (flows only, warp DCEd)", fg_flows_only, sets,
           overhead)
    timeit("flow net on 2B batch", net2b, sets, overhead)
    timeit("flow net 2B (trunk only)", lambda l: net2b(l, "trunk"), sets,
           overhead)
    timeit("flow net 2B (trunk+res)", lambda l: net2b(l, "res"), sets,
           overhead)
    timeit("flow_warp on 2B images", warp2b, sets, overhead)


if __name__ == "__main__":
    main()
