"""Round 2 of warp formulations: correct variants only, timed at 2B batch.

V0 current:    4x take_along_axis on (B, HW, C)   [28.5 ms at B=2, 512px]
V1 flatglobal: flatten batch into the index, ONE gather per corner on
               (B*HW, C) with axis-0 take
V2 fused1:     V1 but all 4 corners in one take (4*B*HW indices)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fsvid2vid_tpu.ops.warp import flow_warp

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = 2
K = 10
RUNS = 3


def _coords(image, flow):
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
    return x0i, x1i, y0i, y1i, fx, fy


def warp_flatglobal(image, flow):
    b, h, w, c = image.shape
    x0i, x1i, y0i, y1i, fx, fy = _coords(image, flow)
    base = (jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 0) * (h * w))
    flat = image.reshape(b * h * w, c)

    def g(yi, xi):
        idx = (base + yi * w + xi).reshape(-1)
        return jnp.take(flat, idx, axis=0,
                        indices_are_sorted=False).reshape(b, h, w, c)

    v00, v01, v10, v11 = g(y0i, x0i), g(y0i, x1i), g(y1i, x0i), g(y1i, x1i)
    dt = image.dtype
    fx = fx[..., None].astype(dt); fy = fy[..., None].astype(dt)
    one = jnp.asarray(1.0, dt)
    return ((one - fy) * ((one - fx) * v00 + fx * v01)
            + fy * ((one - fx) * v10 + fx * v11))


def warp_fusedglobal(image, flow):
    b, h, w, c = image.shape
    x0i, x1i, y0i, y1i, fx, fy = _coords(image, flow)
    base = (jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 0) * (h * w))
    flat = image.reshape(b * h * w, c)
    idx = jnp.stack([base + y0i * w + x0i, base + y0i * w + x1i,
                     base + y1i * w + x0i, base + y1i * w + x1i], 0)
    v = jnp.take(flat, idx.reshape(-1), axis=0).reshape(4, b, h, w, c)
    dt = image.dtype
    fx = fx[..., None].astype(dt); fy = fy[..., None].astype(dt)
    one = jnp.asarray(1.0, dt)
    return ((one - fy) * ((one - fx) * v[0] + fx * v[1])
            + fy * ((one - fx) * v[2] + fx * v[3]))


def make_scan(fn, image):
    def body(carry, fl):
        return carry + jnp.sum(fn(image, fl).astype(jnp.float32)), None

    @jax.jit
    def run(flows):
        c, _ = jax.lax.scan(body, jnp.float32(0), flows)
        return c
    return run


def _t(run, s):
    t0 = time.perf_counter()
    float(run(s))
    return time.perf_counter() - t0


def main():
    h = w = SIZE
    rng = np.random.RandomState(0)
    image = jnp.asarray(np.tanh(rng.randn(B, h, w, 3)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    flow_sets = [jnp.asarray(
        (rng.randn(K, B, h, w, 2) * 10).astype(np.float32)
        ).astype(jnp.bfloat16) for _ in range(RUNS + 1)]

    im32 = image.astype(jnp.float32)
    fl32 = flow_sets[0][0].astype(jnp.float32)
    ref = np.asarray(jax.jit(flow_warp)(im32, fl32))
    for name, fn in [("flatglobal", warp_flatglobal),
                     ("fusedglobal", warp_fusedglobal)]:
        got = np.asarray(jax.jit(fn)(im32, fl32))
        print(f"{name} max err: {np.abs(got-ref).max():.2e}", flush=True)

    over = make_scan(lambda im, fl: jnp.float32(0)[None, None, None, None],
                     image)
    float(over(flow_sets[0]))
    overhead = min(_t(over, s) for s in flow_sets[1:])
    print(f"[overhead {overhead*1000:.1f} ms]", file=sys.stderr, flush=True)

    for name, fn in [("V0 current", flow_warp),
                     ("V1 flatglobal", warp_flatglobal),
                     ("V2 fusedglobal", warp_fusedglobal)]:
        run = make_scan(fn, image)
        t0 = time.perf_counter()
        float(run(flow_sets[0]))
        print(f"[compile {name}: {time.perf_counter()-t0:.1f}s]",
              file=sys.stderr, flush=True)
        best = min(_t(run, s) for s in flow_sets[1:])
        print(f"{name:16s} {(best-overhead)/K*1000:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
