"""Space-to-depth (STD) conv reformulation for small-channel full-res stages.

TPU vector lanes are 128 wide: an NHWC tensor with C=32 is padded 4x in HBM
and VMEM (measured: a 512x512x32 k3 conv runs 2.5x faster when expressed at
256x256x128).  These helpers re-express stride-1/2 3x3 convs on an
(H, W, C) grid as convs on the (H/2, W/2, 4C) phase-packed grid with
EXACTLY the same math — the kernel is scattered into a larger kernel whose
taps realize the original spatial offsets across phases.  Semantics
(zero padding=1, stride, channel order) match `lax.conv_general_dilated`
bit-for-bit up to float reassociation; parity is asserted in
tests/test_ops.py::TestSpd.

Phase order: X[..., (a*2+b)*C + c] = x[2i+a, 2j+b, c].

Replaces nothing in the reference (a pure TPU-layout device optimization);
used by FlowGenerator's inference path (models/flow_generator.py).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase blocks ordered (a, b)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    b, hh, ww, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hh, ww, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hh * 2, ww * 2, c)


def _scatter_kernel(kernel, mapping, taps, cin_blocks, cout_blocks):
    """Build the STD kernel from `kernel` (kh,kw,ci,co) given a mapping
    (a,b,dy,dx) -> (oy, ox, a', b') and tap count per spatial dim."""
    kh, kw, ci, co = kernel.shape
    out = jnp.zeros((taps, taps, cin_blocks * ci, cout_blocks * co),
                    kernel.dtype)
    for (a, b, dy, dx), (oy, ox, ap, bp) in mapping.items():
        blk_in = ap * 2 + bp
        blk_out = a * 2 + b
        out = out.at[oy, ox,
                     blk_in * ci:(blk_in + 1) * ci,
                     blk_out * co:(blk_out + 1) * co].add(kernel[dy, dx])
    return out


def spd_kernel_s1(kernel: jnp.ndarray) -> jnp.ndarray:
    """k3 s1 pad1 conv on the original grid == k3 s1 pad1 conv of this
    kernel on the STD grid (output also in STD layout).

    Derivation: out(2i+a, 2j+b) reads rows y = 2i + (a+dy-1); writing
    y = 2(i+oy') + a' gives (oy', a') = divmod(a+dy-1, 2), oy' in {-1,0,1}.
    """
    mapping = {}
    for a in (0, 1):
        for b in (0, 1):
            for dy in range(3):
                oy, ap = divmod(a + dy - 1, 2)
                for dx in range(3):
                    ox, bp = divmod(b + dx - 1, 2)
                    mapping[(a, b, dy, dx)] = (oy + 1, ox + 1, ap, bp)
    return _scatter_kernel(kernel, mapping, 3, 4, 4)


def spd_kernel_s2(kernel: jnp.ndarray) -> jnp.ndarray:
    """k3 s2 pad1 conv on the original grid == k3 s2 pad1 conv of this
    kernel on the STD grid, output in the NEXT level's STD layout.

    out level pixels (2I+A, 2J+B) read original rows y = 2(2I+A)+dy-1;
    in STD rows r = 2I + (2A+dy-1)//2 with phase (2A+dy-1)%2."""
    mapping = {}
    for A in (0, 1):
        for B in (0, 1):
            for dy in range(3):
                oy, ap = divmod(2 * A + dy - 1, 2)
                for dx in range(3):
                    ox, bp = divmod(2 * B + dx - 1, 2)
                    mapping[(A, B, dy, dx)] = (oy + 1, ox + 1, ap, bp)
    return _scatter_kernel(kernel, mapping, 3, 4, 4)


def spd_kernel_s2_exit(kernel: jnp.ndarray) -> jnp.ndarray:
    """k3 s2 pad1 conv on the original grid, STD input -> NORMAL-layout
    output (same spatial size as the STD grid).

    out(i, j) reads original rows y = 2i+dy-1 -> STD rows i + (dy-1)//2
    phase (dy-1)%2: taps at offsets {-1, 0} -> 2-tap kernel, pad (1, 0)."""
    kh, kw, ci, co = kernel.shape
    out = jnp.zeros((2, 2, 4 * ci, co), kernel.dtype)
    for dy in range(3):
        oy, ap = divmod(dy - 1, 2)
        for dx in range(3):
            ox, bp = divmod(dx - 1, 2)
            blk_in = ap * 2 + bp
            out = out.at[oy + 1, ox + 1,
                         blk_in * ci:(blk_in + 1) * ci, :].add(kernel[dy, dx])
    return out


def spd_conv(x_std: jnp.ndarray, kernel: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Apply an original-grid k3 conv to an STD-layout input.

    mode: 's1' (stride 1, STD out), 's2' (stride 2, next-level STD out),
    's2_exit' (stride 2, normal-layout out)."""
    if mode == "s1":
        k = spd_kernel_s1(kernel)
        return lax.conv_general_dilated(
            x_std, k.astype(x_std.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if mode == "s2":
        k = spd_kernel_s2(kernel)
        return lax.conv_general_dilated(
            x_std, k.astype(x_std.dtype), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if mode == "s2_exit":
        k = spd_kernel_s2_exit(kernel)
        return lax.conv_general_dilated(
            x_std, k.astype(x_std.dtype), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if mode == "k1":
        k = spd_kernel_k1_grouped(kernel, 1)
        return lax.conv_general_dilated(
            x_std, k.astype(x_std.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if mode == "s1_up":
        # x_std here is the PRE-upsample tensor in normal layout; the output
        # is the STD layout of conv(nearest_upsample(x), kernel).
        k = spd_kernel_s1_up(kernel)
        return lax.conv_general_dilated(
            x_std, k.astype(x_std.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    raise ValueError(mode)


def spd_kernel_k1_grouped(kernel: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    """1x1 conv kernel (1,1,ci,co) -> its STD equivalent (1,1,4ci,groups*4co').

    A 1x1 conv is pointwise, so every STD phase applies the SAME kernel: the
    STD kernel is block-diagonal over the 4 phase blocks.  When the original
    kernel fuses `groups` logical outputs along its out-channel axis (e.g. the
    Spade gamma/beta convs, co = 2*nc), the STD output is laid out as `groups`
    contiguous STD blocks — out column m*4co' + q*co' + o — so splitting the
    groups after the conv is a free contiguous slice.
    """
    _, _, ci, co = kernel.shape
    cg = co // groups
    w = kernel[0, 0].reshape(ci, groups, cg)
    eye = jnp.eye(4, dtype=kernel.dtype)
    k = jnp.einsum("pq,img->pimqg", eye, w)      # (4, ci, groups, 4, cg)
    return k.reshape(1, 1, 4 * ci, groups * 4 * cg)


def spd_batch_kernel_k1_grouped(weight: jnp.ndarray,
                                groups: int = 1) -> jnp.ndarray:
    """Per-sample variant for batch_conv: (B,1,1,ci,co) -> (B,1,1,4ci,g*4co')."""
    b, _, _, ci, co = weight.shape
    cg = co // groups
    w = weight[:, 0, 0].reshape(b, ci, groups, cg)
    eye = jnp.eye(4, dtype=weight.dtype)
    k = jnp.einsum("pq,bimg->bpimqg", eye, w)
    return k.reshape(b, 1, 1, 4 * ci, groups * 4 * cg)


def spd_upsample_enter(x: jnp.ndarray) -> jnp.ndarray:
    """STD representation of nearest-upsample(x, 2): all four phases equal
    x, so the STD tensor is a channel-tiling of x (no data movement in HBM
    beyond the broadcast).

    Prefer spd_kernel_s1_up + a direct conv where the very next op is an
    s1 STD conv: the tiling makes that conv read 4 identical copies (4x the
    FLOPs and input bytes); summing the kernel's input-phase blocks computes
    the identical result from the untiled tensor."""
    return jnp.concatenate([x, x, x, x], axis=-1)


def spd_kernel_s1_up(kernel: jnp.ndarray) -> jnp.ndarray:
    """Fused nearest-upsample(2x) + k3 s1 pad1 conv, STD output.

    Equals spd_kernel_s1(kernel) applied to spd_upsample_enter(x), folded:
    conv(tile4(x), K) == conv(x, K_summed) with
    K_summed[:, :, c, :] = sum_p K[:, :, p*ci + c, :] — exact algebra, so
    the (3,3,ci,co) kernel lifts to (3,3,ci,4co) instead of (3,3,4ci,4co):
    4x fewer MXU FLOPs and input bytes for bit-identical output (up to float
    summation order of at most 4 terms that were previously separate
    dot-products; parity asserted in tests/test_ops.py::TestSpd)."""
    k = spd_kernel_s1(kernel)
    kh, kw, ci4, co4 = k.shape
    ci = ci4 // 4
    return k.reshape(kh, kw, 4, ci, co4).sum(axis=2)


def spd_tile_channel(p: jnp.ndarray) -> jnp.ndarray:
    """Per-channel affine/norm parameter tiled over the 4 phase blocks."""
    return jnp.concatenate([p, p, p, p], axis=0)


def spd_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat of two STD tensors == STD of the channel-concat:
    interleave per phase block (plain concat would group all of a's phases
    before b's)."""
    ca = a.shape[-1] // 4
    cb = b.shape[-1] // 4
    parts = []
    for p in range(4):
        parts.append(a[..., p * ca:(p + 1) * ca])
        parts.append(b[..., p * cb:(p + 1) * cb])
    return jnp.concatenate(parts, axis=-1)
