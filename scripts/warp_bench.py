"""Benchmark flow_warp formulations on TPU.

The round-2 profile showed flow_generation = 37 ms of the 52 ms frame step at
512px, dominated by the 4 take_along_axis gathers in ops/warp.py.  TPU point
gathers are index-bound; candidates:
  A current: 4x take_along_axis over flat (B, HW, C)
  B fused:   ONE take_along_axis with 4*HW stacked indices
  C onehot:  separable bilinear as two one-hot contractions (MXU/VPU work
             instead of index work), chunked over output rows
  D dynslice: per-row dynamic-slice scan (vertical) — reference point

Timing uses the amortized lax.scan harness (profile_frame.py) to hide the
~25 ms relay dispatch overhead.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fsvid2vid_tpu.ops.warp import flow_warp

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = 10
RUNS = 3


def warp_fused_gather(image, flow):
    b, h, w, c = image.shape
    fl = flow.astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    x = jnp.clip(xs + fl[..., 0], 0.0, w - 1.0)
    y = jnp.clip(ys + fl[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    fx = x - x0; fy = y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1); y1i = jnp.minimum(y0i + 1, h - 1)
    flat = image.reshape(b, h * w, c)
    idx = jnp.stack([y0i * w + x0i, y0i * w + x1i,
                     y1i * w + x0i, y1i * w + x1i], axis=1)  # (b,4,h,w)
    idx = idx.reshape(b, 4 * h * w, 1)
    v = jnp.take_along_axis(flat, idx, axis=1).reshape(b, 4, h, w, c)
    fx = fx[..., None].astype(image.dtype)
    fy = fy[..., None].astype(image.dtype)
    one = jnp.asarray(1.0, image.dtype)
    return ((one - fy) * ((one - fx) * v[:, 0] + fx * v[:, 1])
            + fy * ((one - fx) * v[:, 2] + fx * v[:, 3]))


def warp_onehot(image, flow, chunk=64):
    """Separable bilinear warp as two one-hot contractions."""
    b, h, w, c = image.shape
    dtype = image.dtype
    fl = flow.astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    x = jnp.clip(xs + fl[..., 0], 0.0, w - 1.0)
    y = jnp.clip(ys + fl[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    fx = (x - x0).astype(dtype); fy = (y - y0).astype(dtype)
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1); y1i = jnp.minimum(y0i + 1, h - 1)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, h), 3)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3)

    def chunk_fn(args):
        y0c, y1c, fyc, x0c, x1c, fxc = args
        # vertical: M (b, hc, w, s); T = sum_s M * I[s, x, c] batched over x
        m = ((s_iota == y0c[..., None]).astype(dtype) * (1 - fyc[..., None])
             + (s_iota == y1c[..., None]).astype(dtype) * fyc[..., None])
        t = jnp.einsum("byxs,bsxc->byxc", m, image)
        # horizontal: N (b, hc, w, t); out = sum_t N * T[y, t, c] batch y
        n = ((t_iota == x0c[..., None]).astype(dtype) * (1 - fxc[..., None])
             + (t_iota == x1c[..., None]).astype(dtype) * fxc[..., None])
        return jnp.einsum("byxt,bytc->byxc", n, t)

    n_chunks = h // chunk
    def resh(a):
        return a.reshape(b, n_chunks, chunk, w).transpose(1, 0, 2, 3)
    outs = jax.lax.map(chunk_fn, (resh(y0i), resh(y1i), resh(fy),
                                  resh(x0i), resh(x1i), resh(fx)))
    return outs.transpose(1, 0, 2, 3, 4).reshape(b, h, w, c)


def make_scan(fn, image):
    def body(carry, fl):
        out = fn(image, fl)
        return carry + jnp.sum(out.astype(jnp.float32)), None

    @jax.jit
    def run(flows):
        c, _ = jax.lax.scan(body, jnp.float32(0), flows)
        return c
    return run


def main():
    h = w = SIZE
    rng = np.random.RandomState(0)
    image = jnp.asarray(np.tanh(rng.randn(1, h, w, 3)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    flow_sets = [jnp.asarray((rng.randn(K, 1, h, w, 2) * 10).astype(np.float32)
                             ).astype(jnp.bfloat16) for _ in range(RUNS + 1)]

    # overhead
    over = make_scan(lambda im, fl: jnp.float32(0)[None, None, None, None],
                     image)
    float(over(flow_sets[0]))
    overhead = min(_t(over, s) for s in flow_sets[1:])
    print(f"[overhead {overhead*1000:.1f} ms]", file=sys.stderr, flush=True)

    # correctness vs current (f32)
    im32 = image.astype(jnp.float32)
    fl32 = flow_sets[0][0].astype(jnp.float32)
    ref = np.asarray(flow_warp(im32, fl32))
    for name, fn in [("fused", warp_fused_gather), ("onehot", warp_onehot)]:
        got = np.asarray(fn(im32, fl32))
        err = np.abs(got - ref).max()
        print(f"{name} max err vs current: {err:.2e}", flush=True)

    for name, fn in [("A current", flow_warp),
                     ("B fused", warp_fused_gather),
                     ("C onehot", warp_onehot)]:
        run = make_scan(fn, image)
        t0 = time.perf_counter()
        float(run(flow_sets[0]))
        print(f"[compile {name}: {time.perf_counter()-t0:.1f}s]",
              file=sys.stderr, flush=True)
        best = min(_t(run, s) for s in flow_sets[1:])
        print(f"{name:12s} {(best - overhead) / K * 1000:8.2f} ms", flush=True)


def _t(run, s):
    t0 = time.perf_counter()
    float(run(s))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
