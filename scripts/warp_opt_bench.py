"""Isolate the non-gather overhead of flow_warp and test variants (round 4).

flow_warp measures 10.4 ns/row end-to-end vs 6.0 ns/row for the raw
take_along_axis it contains (scripts/warp_floor.py) — 40% overhead in the
patch-table build, index math, and bilinear blend, all of which are
bandwidth-trivial.  This bench times dissected stages and rewrite candidates
to find which formulation lets XLA keep the non-gather work off the
critical path.

Usage: python scripts/warp_opt_bench.py [SIZE] [B]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from fsvid2vid_tpu.ops.warp import flow_warp

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
K = 10
RUNS = 3
C = 3


def make_scan(fn, static):
    def body(c, per_iter):
        out = fn(static, per_iter)
        return c + sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(out)), None

    @jax.jit
    def run(stack):
        c, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return c
    return run


def _t(run, s):
    t0 = time.perf_counter()
    float(run(s))
    return time.perf_counter() - t0


def timed(name, fn, static, stacks, overhead, rows):
    run = make_scan(fn, static)
    t0 = time.perf_counter()
    float(run(stacks[0]))
    print(f"[compile {name}: {time.perf_counter()-t0:.1f}s]",
          file=sys.stderr, flush=True)
    best = min(_t(run, s) for s in stacks[1:1 + RUNS])
    ms = (best - overhead) / K * 1000
    print(f"{name:44s} {ms:8.3f} ms   {ms*1e6/rows:6.2f} ns/row", flush=True)
    return ms


def build_patches(image):
    b, h, w, c = image.shape
    right = jnp.concatenate([image[:, :, 1:], image[:, :, -1:]], axis=2)
    row0 = jnp.concatenate([image, right], axis=-1)
    row1 = jnp.concatenate([row0[:, 1:], row0[:, -1:]], axis=1)
    return jnp.concatenate([row0, row1], axis=-1).reshape(b, h * w, 4 * c)


def idx_weights(flow, h, w):
    b = flow.shape[0]
    fl = flow.astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    x = jnp.clip(xs + fl[..., 0], 0.0, w - 1.0)
    y = jnp.clip(ys + fl[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    idx = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32)).reshape(b, h * w, 1)
    return idx, (x - x0), (y - y0)


def main():
    h = w = SIZE
    n = B * h * w
    rng = np.random.RandomState(0)
    image = jnp.asarray(np.tanh(rng.randn(B, h, w, C)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    fstacks = [jnp.asarray((rng.randn(K, B, h, w, 2) * 10).astype(np.float32)
                           ).astype(jnp.bfloat16) for _ in range(RUNS + 1)]

    over = make_scan(lambda im, fl: jnp.float32(0), None)
    float(over(fstacks[0]))
    overhead = min(_t(over, s) for s in fstacks[1:])
    print(f"[overhead {overhead*1000:.1f} ms]", file=sys.stderr, flush=True)
    print(f"=== warp variants {SIZE}px B={B} ({n} rows) "
          f"{jax.devices()[0].device_kind} ===", flush=True)

    # 0. current implementation
    timed("flow_warp (current)", flow_warp, image, fstacks, overhead, n)

    # 1. patch table prebuilt outside the timed fn (isolates table build)
    patches = build_patches(image)

    def warp_prebuilt(tab, flow):
        idx, fx, fy = idx_weights(flow, h, w)
        v = jnp.take_along_axis(tab, idx, axis=1).reshape(B, h, w, 4, C)
        fx = fx[..., None].astype(tab.dtype)
        fy = fy[..., None].astype(tab.dtype)
        one = jnp.asarray(1.0, tab.dtype)
        return ((one - fy) * ((one - fx) * v[..., 0, :] + fx * v[..., 1, :])
                + fy * ((one - fx) * v[..., 2, :] + fx * v[..., 3, :]))

    timed("prebuilt patch table", warp_prebuilt, patches, fstacks, overhead, n)

    # 2. gather + blend with channel-slice instead of 5D reshape
    def warp_chanslice(tab, flow):
        idx, fx, fy = idx_weights(flow, h, w)
        v = jnp.take_along_axis(tab, idx, axis=1).reshape(B, h, w, 4 * C)
        fx = fx[..., None].astype(tab.dtype)
        fy = fy[..., None].astype(tab.dtype)
        one = jnp.asarray(1.0, tab.dtype)
        top = (one - fx) * v[..., 0:C] + fx * v[..., C:2 * C]
        bot = (one - fx) * v[..., 2 * C:3 * C] + fx * v[..., 3 * C:]
        return (one - fy) * top + fy * bot

    timed("prebuilt + chan-slice blend", warp_chanslice, patches, fstacks,
          overhead, n)

    # 3. idx/weights precomputed too: pure gather + blend
    idx0, fx0, fy0 = idx_weights(
        jnp.asarray((rng.randn(B, h, w, 2) * 10).astype(np.float32)), h, w)
    istacks = [jnp.broadcast_to(idx0, (K,) + idx0.shape) for _ in range(RUNS + 1)]

    def gather_blend(tab, idx):
        v = jnp.take_along_axis(tab, idx, axis=1).reshape(B, h, w, 4 * C)
        fx = fx0[..., None].astype(tab.dtype)
        fy = fy0[..., None].astype(tab.dtype)
        one = jnp.asarray(1.0, tab.dtype)
        top = (one - fx) * v[..., 0:C] + fx * v[..., C:2 * C]
        bot = (one - fx) * v[..., 2 * C:3 * C] + fx * v[..., 3 * C:]
        return (one - fy) * top + fy * bot

    timed("pure gather + blend (idx precomputed)", gather_blend, patches,
          istacks, overhead, n)

    # 4. pure gather alone (floor cross-check at this B)
    def gather_only(tab, idx):
        return jnp.take_along_axis(tab, idx, axis=1)

    timed("pure gather alone", gather_only, patches, istacks, overhead, n)

    # 5. fp32 weights blend (skip bf16 cast of weights)
    def warp_f32blend(tab, flow):
        idx, fx, fy = idx_weights(flow, h, w)
        v = jnp.take_along_axis(tab, idx, axis=1).reshape(
            B, h, w, 4 * C).astype(jnp.float32)
        fx = fx[..., None]
        fy = fy[..., None]
        top = (1 - fx) * v[..., 0:C] + fx * v[..., C:2 * C]
        bot = (1 - fx) * v[..., 2 * C:3 * C] + fx * v[..., 3 * C:]
        return ((1 - fy) * top + fy * bot).astype(tab.dtype)

    timed("prebuilt + f32 blend", warp_f32blend, patches, fstacks,
          overhead, n)

    # 6. weights packed INTO the gather output row: gather from a table of
    #    4C+? no — instead fold the blend into 2 gathers of 2C? (more rows,
    #    expect worse; sanity point)
    def warp_2gather(im, flow):
        b, hh, ww, c = im.shape
        fl = flow.astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(jnp.float32, (b, hh, ww), 2)
        ys = jax.lax.broadcasted_iota(jnp.float32, (b, hh, ww), 1)
        x = jnp.clip(xs + fl[..., 0], 0.0, ww - 1.0)
        y = jnp.clip(ys + fl[..., 1], 0.0, hh - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None].astype(im.dtype)
        fy = (y - y0)[..., None].astype(im.dtype)
        right = jnp.concatenate([im[:, :, 1:], im[:, :, -1:]], axis=2)
        row0 = jnp.concatenate([im, right], axis=-1).reshape(b, hh * ww, 2 * c)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, hh - 1)
        i0 = (y0i * ww + x0i).reshape(b, hh * ww, 1)
        i1 = (y1i * ww + x0i).reshape(b, hh * ww, 1)
        v0 = jnp.take_along_axis(row0, i0, axis=1).reshape(b, hh, ww, 2 * c)
        v1 = jnp.take_along_axis(row0, i1, axis=1).reshape(b, hh, ww, 2 * c)
        one = jnp.asarray(1.0, im.dtype)
        top = (one - fx) * v0[..., :c] + fx * v0[..., c:]
        bot = (one - fx) * v1[..., :c] + fx * v1[..., c:]
        return (one - fy) * top + fy * bot

    timed("2-gather rows (sanity: more rows)", warp_2gather, image, fstacks,
          overhead, n)

    # 7. flatten the batch into ONE B=1 gather (rows offset by b*h*w):
    #    tests whether XLA's gather pays a per-batch overhead at B=2
    def warp_flatbatch(im, flow):
        b, hh, ww, c = im.shape
        tab = build_patches(im).reshape(1, b * hh * ww, 4 * c)
        idx, fx, fy = idx_weights(flow, hh, ww)
        off = (jnp.arange(b, dtype=jnp.int32) * (hh * ww)).reshape(
            b, 1, 1)
        idx = (idx + off).reshape(1, b * hh * ww, 1)
        v = jnp.take_along_axis(tab, idx, axis=1).reshape(b, hh, ww, 4 * c)
        fx = fx[..., None].astype(im.dtype)
        fy = fy[..., None].astype(im.dtype)
        one = jnp.asarray(1.0, im.dtype)
        top = (one - fx) * v[..., 0:c] + fx * v[..., c:2 * c]
        bot = (one - fx) * v[..., 2 * c:3 * c] + fx * v[..., 3 * c:]
        return (one - fy) * top + fy * bot

    timed("flat-batch single gather", warp_flatbatch, image, fstacks,
          overhead, n)

    # 8. B sequential B=1 warps: per-row gather cost was measured LOWER at
    #    B=1 (6.0 ns) than flattened 2B (9.5) — is that a table-size effect
    #    the compiler preserves when the program issues B smaller gathers?
    def warp_split(im, flow):
        outs = [flow_warp(im[i:i + 1], flow[i:i + 1])
                for i in range(im.shape[0])]
        return jnp.concatenate(outs, 0)

    timed("B separate B=1 warps", warp_split, image, fstacks, overhead, n)

    # 9. split + int32-packed table: pack the 4C bf16 patch row (24 B at C=3)
    #    unchanged but gather fewer, wider rows by pairing adjacent pixels?
    #    cannot (indices differ per pixel).  Instead: gather from a HALF-row
    #    table (2C, top row) + second gather for bottom row, per image.
    def warp_split_2g(im, flow):
        outs = []
        for i in range(im.shape[0]):
            outs.append(warp_2gather(im[i:i + 1], flow[i:i + 1]))
        return jnp.concatenate(outs, 0)

    timed("B separate, 2-gather rows each", warp_split_2g, image, fstacks,
          overhead, n)


if __name__ == "__main__":
    main()
