"""Pallas TPU flash-attention kernel for multi-reference spatial attention.

The generator's K>1 attention (models/generator.py::_attention_module,
reference generator.py:298-316) is softmax attention with N = K*hw keys and
hw queries over c channels, plus two value contractions (the reference
features and their label twins) and a per-reference attention-mass output.
The XLA chunked-streaming path materializes (N, q_chunk) energy slabs in HBM
— at K=8, 512px the energy matrix totals 2.1e9 elements, so regardless of
chunking the energy alone costs ~17 GB of HBM write+read traffic, and the
explicit f32 upcast runs the MXU at its f32 rate (~4x below bf16 peak).

This kernel is the standard flash-attention formulation: the energy block
lives only in VMEM, a running (m, l) streaming softmax rescales f32
accumulators across key blocks, and both value contractions ride the MXU in
the input dtype with f32 accumulation.  An extra (qb, K) accumulator tracks
the per-reference attention mass (the `a4.sum(2)` of the XLA path):

  out_x[b,q,:] = sum_n softmax_n(key[b,n,:] . query[b,q,:]) * xf[b,n,:]
  out_l[b,q,:] = same with lf
  vis[b,q,k]   = sum_{n in ref k} softmax_n(...)         (n-blocks are
                 aligned to reference boundaries: kb divides hw_key)

Grid (B, hw/qb, N/kb), key blocks innermost ("arbitrary" — sequential on one
core so the VMEM accumulators carry across key blocks; the q/b dimensions are
parallel).  HBM traffic: query/outputs once, key/xf/lf once per q block —
~1.6 GB at K=8 512px vs ~25 GB for the chunked XLA path.

Gradients: the kernel is forward-only; the generator dispatches to it only at
eval (train=True keeps the XLA chunked path, which test-time finetuning
uses), so no custom VJP is attached — differentiating through the eval path
fails at trace time with a Pallas error rather than silently diverging.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(total: int, target: int) -> int:
    """Largest divisor of `total` that is <= target and a multiple of 8.

    The sublane dimension of every VMEM block must be 8-aligned for Mosaic;
    callers guarantee total % 8 == 0, so 8 itself is always available even
    when `total` has odd cofactors (e.g. hw = 8 * 353 -> 706 is a divisor
    but not 8-aligned; this returns 8)."""
    b = min(target, total)
    b -= b % 8
    while b > 8 and total % b:
        b -= 8
    return max(b, 8)


def _vmem_bytes(qb: int, kb: int, c: int, n_refs: int, has_lf: bool,
                in_bytes: int) -> int:
    """Upper-bound the kernel's per-core VMEM working set for a block choice:
    pipelined input/output blocks (x2 for double buffering), the f32 energy
    (s and p coexist), the concatenated-value matmul operands, and the f32
    scratch accumulators."""
    nv = 3 if has_lf else 2                       # key + value streams
    io = 2 * (qb * c + nv * kb * c + (2 if has_lf else 1) * qb * c) * in_bytes
    energy = 2 * qb * kb * 4                      # s + p
    cat = (kb * 2 * c * in_bytes + qb * 2 * c * 4) if has_lf else qb * c * 4
    scr = (qb * (2 + n_refs) + qb * c * (2 if has_lf else 1)) * 4
    return io + energy + cat + scr + 2 * qb * n_refs * 4


def _choose_blocks(hw: int, hw_key: int, c: int, n_refs: int, has_lf: bool,
                   in_bytes: int, q_target: int, k_target: int,
                   budget: int = 12 << 20):
    """Largest 8-aligned (qb, kb) divisors within the targets whose estimated
    working set fits the VMEM budget (~12 MB of the ~16 MB/core, leaving
    headroom for Mosaic's own buffers).  Shrinks the larger block first;
    floor is (8, 8), which always fits for c <= 512."""
    qb = _pick_block(hw, q_target)
    kb = _pick_block(hw_key, k_target)
    while _vmem_bytes(qb, kb, c, n_refs, has_lf, in_bytes) > budget:
        if qb >= kb and qb > 8:
            qb = _pick_block(hw, qb // 2)
        elif kb > 8:
            kb = _pick_block(hw_key, kb // 2)
        else:
            break
    return qb, kb


def _kernel(refs, *, n_refs, kb, hw_key, has_lf):
    if has_lf:
        (q_ref, k_ref, x_ref, lf_ref, ox_ref, ol_ref, vis_ref,
         m_scr, l_scr, ax_scr, al_scr, av_scr) = refs
    else:
        (q_ref, k_ref, x_ref, ox_ref, vis_ref,
         m_scr, l_scr, ax_scr, av_scr) = refs
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        ax_scr[:] = jnp.zeros_like(ax_scr)
        if has_lf:
            al_scr[:] = jnp.zeros_like(al_scr)
        av_scr[:] = jnp.zeros_like(av_scr)

    q = q_ref[0]                                   # (qb, c)
    k = k_ref[0]                                   # (kb, c)
    # softmax in the exp2 domain: log2(e) folded into the energy matmul so
    # the 2.1e9 per-frame exponentials hit the VPU's native 2^x (exp(x) =
    # 2^(x*log2e); the softmax is scale-invariant so the result is the same)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * 1.4426950408889634  # (qb, kb)

    m_prev = m_scr[:]                              # (qb, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)               # (qb, 1)
    p = jnp.exp2(s - m_new)                        # (qb, kb) f32

    m_scr[:] = m_new
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)

    pv = p.astype(x_ref.dtype)
    if has_lf:
        # one MXU call over the channel-concatenated values: same FLOPs as
        # two dots but a single pass of P through the MXU pipeline
        xl = jnp.concatenate([x_ref[0], lf_ref[0]], axis=1)
        both = jnp.dot(pv, xl, preferred_element_type=jnp.float32)
        c = x_ref.shape[2]
        ax_scr[:] = alpha * ax_scr[:] + both[:, :c]
        al_scr[:] = alpha * al_scr[:] + both[:, c:]
    else:
        ax_scr[:] = alpha * ax_scr[:] + jnp.dot(
            pv, x_ref[0], preferred_element_type=jnp.float32)

    # reference index of this key block (kb divides hw_key, so the block
    # lies entirely inside one reference); one-hot scatter onto the lane axis
    r = (ki * kb) // hw_key
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, n_refs), 1)
              == r).astype(jnp.float32)
    av_scr[:] = alpha * av_scr[:] + jnp.sum(p, axis=1, keepdims=True) * onehot

    @pl.when(ki == nk - 1)
    def _finish():
        inv_l = 1.0 / l_scr[:]
        ox_ref[0] = (ax_scr[:] * inv_l).astype(ox_ref.dtype)
        if has_lf:
            ol_ref[0] = (al_scr[:] * inv_l).astype(ol_ref.dtype)
        vis_ref[0] = (av_scr[:] * inv_l).astype(vis_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_refs", "q_block", "k_block",
                                             "interpret"))
def flash_ref_attention(query: jnp.ndarray, key: jnp.ndarray,
                        xf: jnp.ndarray, lf: jnp.ndarray | None,
                        n_refs: int, q_block: int = 1024, k_block: int = 1024,
                        interpret: bool = False):
    """Streaming-softmax multi-reference attention (forward only).

    Args:
      query: (B, hw, c); key/xf/lf: (B, N, c) with N = n_refs * hw_key.
      lf: optional label-feature values (mul_label_ref path) or None.
      n_refs: number of references K; key blocks are aligned to the per-
        reference span so the attention-mass output can be attributed.

    Returns (out_x (B,hw,c), out_l (B,hw,c) or None, vis (B,hw,n_refs) f32).
    Accumulation is f32; the value matmuls run in the input dtype (bf16 at
    serving — the softmax weights are rounded to the input dtype, the same
    trade every flash-attention implementation makes).
    """
    b, hw, c = query.shape
    n = key.shape[1]
    hw_key = n // n_refs
    has_lf = lf is not None
    qb, kb = _choose_blocks(hw, hw_key, c, n_refs, has_lf,
                            jnp.dtype(xf.dtype).itemsize, q_block, k_block)
    grid = (b, hw // qb, n // kb)

    q_spec = pl.BlockSpec((1, qb, c), lambda bi, qi, ki: (bi, qi, 0))
    kv_spec = pl.BlockSpec((1, kb, c), lambda bi, qi, ki: (bi, ki, 0))
    o_spec = pl.BlockSpec((1, qb, c), lambda bi, qi, ki: (bi, qi, 0))
    v_spec = pl.BlockSpec((1, qb, n_refs), lambda bi, qi, ki: (bi, qi, 0))

    in_specs = [q_spec, kv_spec, kv_spec]
    inputs = [query, key, xf]
    out_specs = [o_spec]
    out_shapes = [jax.ShapeDtypeStruct((b, hw, c), xf.dtype)]
    scratch = [
        pltpu.VMEM((qb, 1), jnp.float32),        # running max
        pltpu.VMEM((qb, 1), jnp.float32),        # running sum
        pltpu.VMEM((qb, c), jnp.float32),        # x accumulator
    ]
    if has_lf:
        in_specs.append(kv_spec)
        inputs.append(lf)
        out_specs.append(o_spec)
        out_shapes.append(jax.ShapeDtypeStruct((b, hw, c), xf.dtype))
        scratch.append(pltpu.VMEM((qb, c), jnp.float32))  # label accumulator
    out_specs.append(v_spec)
    out_shapes.append(jax.ShapeDtypeStruct((b, hw, n_refs), jnp.float32))
    scratch.append(pltpu.VMEM((qb, n_refs), jnp.float32))  # per-ref mass

    def kernel(*refs):
        _kernel(refs, n_refs=n_refs, kb=kb, hw_key=hw_key, has_lf=has_lf)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    if has_lf:
        out_x, out_l, vis = outs
    else:
        (out_x, vis), out_l = outs, None
    return out_x, out_l, vis
