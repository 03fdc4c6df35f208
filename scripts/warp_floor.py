"""Measure the XLA gather floor for the flow-warp, for BASELINE.md.

The warp in ops/warp.py is one take_along_axis fetching HW rows of a
(HW, 4C) patch table — the minimum possible row count for exact bilinear
resampling with arbitrary flow (every output pixel needs a fetch from an
independent, data-dependent address; the 2x2-patch packing already collapsed
the four corner fetches into one).  This script establishes the per-row cost
floor on the actual chip by timing raw take_along_axis against:

  * random indices (the warp's access pattern),
  * identity indices (perfectly local access: isolates issue rate from
    memory locality),
  * several row widths (checks width-independence of the per-row cost),
  * a plain elementwise copy of the same logical bytes (the DMA bound an
    oracle gather engine could reach).

If random==identity and width doesn't matter, the gather is *issue-bound* at
the measured ns/row and no XLA-expressible exact warp can beat
rows x ns/row; ops/warp.py performs exactly `rows` fetches, i.e. it sits on
that floor.  (A Mosaic kernel is not an escape hatch on this toolchain:
tpu.dynamic_gather only lowers single-vreg tables, and per-row DMA composition
costs more per descriptor than 13 ns — see docs/ROOFLINE notes.)

Usage: python scripts/warp_floor.py [SIZE]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = 10
RUNS = 3


def make_scan(fn, static):
    def body(c, per_iter):
        out = fn(static, per_iter)
        return c + jnp.sum(out.astype(jnp.float32)), None

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
    print(f"{name:34s} {ms:8.3f} ms   {ms*1e6/rows:6.2f} ns/row", flush=True)
    return ms


def main():
    h = w = SIZE
    n = h * w
    rng = np.random.RandomState(0)

    def idx_stacks(kind):
        outs = []
        for _ in range(RUNS + 1):
            if kind == "random":
                a = rng.randint(0, n, size=(K, 1, n, 1))
            else:
                a = np.broadcast_to(np.arange(n)[None, None, :, None],
                                    (K, 1, n, 1)).copy()
            outs.append(jnp.asarray(a.astype(np.int32)))
        return outs

    over = make_scan(lambda tab, idx: jnp.float32(0), None)
    rs = idx_stacks("random")
    float(over(rs[0]))
    overhead = min(_t(over, s) for s in rs[1:])
    print(f"[dispatch overhead: {overhead*1000:.1f} ms]", file=sys.stderr,
          flush=True)
    print(f"=== gather floor, {SIZE}x{SIZE} ({n} rows), bf16, "
          f"{jax.devices()[0].device_kind} ===", flush=True)

    def gather(tab, idx):
        return jnp.take_along_axis(tab, idx, axis=1)

    for width in (12, 128):
        tab = jnp.asarray(rng.randn(1, n, width).astype(np.float32)
                          ).astype(jnp.bfloat16)
        timed(f"gather rows w={width} random", gather, tab,
              idx_stacks("random"), overhead, n)
        if width == 12:
            timed(f"gather rows w={width} identity", gather, tab,
                  idx_stacks("identity"), overhead, n)

    # small-table control: same index count, 4x smaller table — if per-row
    # cost is unchanged, the cost is fetch issue, not table size
    tab_small = jnp.asarray(rng.randn(1, n // 4, 12).astype(np.float32)
                            ).astype(jnp.bfloat16)
    small_stacks = [jnp.asarray(
        rng.randint(0, n // 4, size=(K, 1, n, 1)).astype(np.int32))
        for _ in range(RUNS + 1)]
    timed("gather w=12 from n/4-row table", gather, tab_small, small_stacks,
          overhead, n)

    # DMA bound: stream the same logical bytes with no indexing
    tab12 = jnp.asarray(rng.randn(1, n, 12).astype(np.float32)
                        ).astype(jnp.bfloat16)
    scale_stacks = [jnp.asarray(rng.randn(K).astype(np.float32))
                    for _ in range(RUNS + 1)]
    over2 = make_scan(lambda tab, s: jnp.float32(0), None)
    float(over2(scale_stacks[0]))
    oh2 = min(_t(over2, s) for s in scale_stacks[1:])
    timed("streaming copy of same bytes", lambda tab, s: tab * s, tab12,
          scale_stacks, oh2, n)

    # the actual warp for cross-reference, plus a 128-lane-padded variant
    # (w=128 rows gather ~2 ns/row faster above; test end-to-end)
    from fsvid2vid_tpu.ops.warp import flow_warp
    image = jnp.asarray(np.tanh(rng.randn(1, h, w, 3)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    fstacks = [jnp.asarray((rng.randn(K, 1, h, w, 2) * 10).astype(np.float32)
                           ).astype(jnp.bfloat16) for _ in range(RUNS + 1)]
    over3 = make_scan(lambda im, fl: jnp.float32(0), None)
    float(over3(fstacks[0]))
    oh3 = min(_t(over3, s) for s in fstacks[1:])
    timed("flow_warp (full op)", flow_warp, image, fstacks, oh3, n)

    def flow_warp_pad128(img, fl):
        b, hh, ww, c = img.shape
        img = jnp.concatenate(
            [img, jnp.zeros((b, hh, ww, 32 - c), img.dtype)], -1)
        return flow_warp(img, fl)[..., :c]

    timed("flow_warp patch rows padded 128", flow_warp_pad128, image,
          fstacks, oh3, n)


if __name__ == "__main__":
    main()
