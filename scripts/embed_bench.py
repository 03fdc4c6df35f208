"""Per-stage cost of the SPADE-combine (warped-image) embedder at 512px.

The two SC embedder invocations cost ~5 ms of the 23 ms frame step (round-3
profile) against a ~1 ms bandwidth floor; this bench attributes the cost to
encoder / coarse-decoder / fine-decoder stages via the LabelEmbedder `probe`
argument (bench-only early exits).

Usage: python scripts/embed_bench.py [SIZE]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.inference.fold import fold_spectral_norm
from fsvid2vid_tpu.training.state import build_models
from fsvid2vid_tpu.parallel.precision import bf16_params, cast_floating

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = 10
RUNS = 3


def make_scan(fn):
    def body(c, x):
        out = fn(x)
        return c + sum(jnp.sum(v.astype(jnp.float32))
                       for v in jax.tree.leaves(out)), None

    @jax.jit
    def run(stack):
        c, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return c
    return run


def _t(run, s):
    t0 = time.perf_counter()
    float(run(s))
    return time.perf_counter() - t0


def timed(name, fn, stacks, overhead):
    run = make_scan(fn)
    t0 = time.perf_counter()
    float(run(stacks[0]))
    print(f"[compile {name}: {time.perf_counter()-t0:.1f}s]", file=sys.stderr,
          flush=True)
    best = min(_t(run, s) for s in stacks[1:1 + RUNS])
    print(f"{name:44s} {(best-overhead)/K*1000:8.2f} ms", flush=True)


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

    # SC embedder input: (2B, H, W, 4) warped image + mask, like
    # _spade_combine's batched eval path
    sets = [cast_floating(jnp.asarray(
        rng.randn(K, 2, h, w, 4).astype(np.float32)), jnp.bfloat16)
        for _ in range(RUNS + 1)]

    over = make_scan(lambda x: jnp.float32(0))
    float(over(sets[0]))
    overhead = min(_t(over, s) for s in sets[1:])
    print(f"[overhead {overhead*1000:.1f} ms]", file=sys.stderr, flush=True)
    print(f"=== SC embedder ablation {SIZE}px (2B batch) "
          f"{jax.devices()[0].device_kind} ===", flush=True)

    def run_probe(probe):
        def fn(x):
            def m(g, xx):
                return g.img_ref_embedding(xx, None, False, probe=probe)
            return netG.apply(var_all, x, method=m, mutable=False)
        return fn

    timed("sc embedder 2B (full)", run_probe(None), sets, overhead)
    timed("sc embedder 2B (encoder only)", run_probe("down"), sets, overhead)
    timed("sc embedder 2B (enc + coarse dec)", run_probe("coarse"), sets,
          overhead)


if __name__ == "__main__":
    main()
