"""Pallas TPU kernel for the FlowNetC correlation cost volume.

The XLA shift-and-reduce reference (ops/cost_volume.py) reads the padded f2
from HBM once per displacement — 441 passes over the feature map.  This kernel
DMAs one haloed f2 row-band into VMEM per grid cell and loops the 441
displacements over the resident tile, turning the op from HBM-bandwidth-bound
to VPU-bound.

Grid: (B, H / TILE_H).  Per cell:
  f1 tile:   (TILE_H, W, C)                  VMEM via BlockSpec
  f2 band:   (TILE_H + 2*md, W + 2*md, C)    VMEM scratch, manual DMA (halo
                                             rows overlap between cells, which
                                             BlockSpec blocking can't express)
  out tile:  (D, D, TILE_H, W)               VMEM via BlockSpec

TPU layout constraints shape the loop nest: dynamic offsets on the sublane
dimension must be 8-aligned, so the stride-2 dy shift indexes the *untiled*
leading dim of the band (dynamic fori_loop) while the dx shift is a static
python unroll; each (dy, dx) result stores to untiled leading dims of the
output.  The (dy, dx) axes move to the rear channel position with one XLA
transpose outside the kernel.

Output channel order matches correlation_cuda_kernel.cu:139-141
(dy-major: k = dy_idx * D + dx_idx); values are channel means (acc / C).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(f2p_hbm, f1_ref, out_ref, *, md, stride, c, tile_h):
    d = 2 * (md // stride) + 1

    def body(f2_vmem, sem):
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        copy = pltpu.make_async_copy(
            f2p_hbm.at[bi, pl.ds(hi * tile_h, tile_h + 2 * md)],
            f2_vmem, sem)
        copy.start()
        copy.wait()

        f1 = f1_ref[0].astype(jnp.float32)
        inv_c = 1.0 / c
        w = f1.shape[1]

        def dy_loop(dy_idx, _):
            band = f2_vmem[pl.ds(dy_idx * stride, tile_h)]
            for dx_idx in range(d):
                shifted = band[:, dx_idx * stride: dx_idx * stride + w, :]
                prod = (f1 * shifted.astype(jnp.float32)).sum(-1) * inv_c
                out_ref[0, dy_idx, dx_idx, :, :] = prod.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, d, dy_loop, 0)

    pl.run_scoped(
        body,
        pltpu.VMEM((tile_h + 2 * md, f2p_hbm.shape[2], c), f2p_hbm.dtype),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnames=("max_displacement", "stride",
                                             "tile_h", "interpret"))
def cost_volume_pallas(f1: jnp.ndarray, f2: jnp.ndarray,
                       max_displacement: int = 20, stride: int = 2,
                       tile_h: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.cost_volume.cost_volume (forward).

    f1, f2: (B, H, W, C); returns (B, H, W, D*D)."""
    b, h, w, c = f1.shape
    md = max_displacement
    d = 2 * (md // stride) + 1
    tile_h = min(tile_h, h)
    assert h % tile_h == 0, f"H={h} not divisible by tile_h={tile_h}"

    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))

    out5 = pl.pallas_call(
        functools.partial(_kernel, md=md, stride=stride, c=c, tile_h=tile_h),
        out_shape=jax.ShapeDtypeStruct((b, d, d, h, w), f1.dtype),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # f2p stays in HBM
            pl.BlockSpec((1, tile_h, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, d, tile_h, w),
                               lambda bi, hi: (bi, 0, 0, hi, 0),
                               memory_space=pltpu.VMEM),
        # The kernel uses TPU-dialect primitives (run_scoped + manual DMA), so
        # CPU emulation needs the TPU interpreter, not the generic one.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(f2p, f1)
    # (B, dy, dx, H, W) -> (B, H, W, dy*dx)
    return jnp.transpose(out5, (0, 3, 4, 1, 2)).reshape(b, h, w, d * d)
