"""Ablation profile of the inference frame step on one TPU chip.

The remote-device relay costs O(100 ms) per program dispatch, so a component
cannot be timed by looping host-side calls.  Instead each component runs K
times inside ONE jitted lax.scan over K distinct labels (distinct inputs so
CSE cannot collapse the iterations), and the per-iteration time is
(t_scan - t_dispatch_overhead) / K with the overhead measured from an empty
scan of the same shape.

Usage: python scripts/profile_frame.py [SIZE] [comp1,comp2,...] [B] [K]
Components: full embed flow1 flow2 sc main nosc
K>1 adds:   kfull (full __call__ with prefix cache), attn (attention module
            from cached keys), wgen (weight_generation with prefix)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fsvid2vid_tpu.cache import enable_compilation_cache
from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.inference.fold import fold_spectral_norm
from fsvid2vid_tpu.training.state import build_models
from fsvid2vid_tpu.parallel.precision import bf16_params, cast_floating

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WHICH = sys.argv[2].split(",") if len(sys.argv) > 2 else None
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1  # parallel streams
NSHOT = int(sys.argv[4]) if len(sys.argv) > 4 else 1  # references (K>1: attention)
K = int(os.environ.get("PROF_K", "10"))       # scan iterations per program
RUNS = int(os.environ.get("PROF_RUNS", "3"))  # timed dispatches (min taken)


def make_scan(fn, caps=None):
    """fn: (label[, caps]) -> pytree.  Returns jitted labels(K,...) -> scalar.

    `caps`: pytree of arrays the component closes over (params, refs, cache).
    Passed as a jit ARGUMENT, not a closure capture — captures are baked
    into the HLO as constants, which blows past the remote-compile request
    limit at K=8 512px."""
    def body(c, lbl_caps):
        lbl, cp = lbl_caps
        out = fn(lbl) if caps is None else fn(lbl, cp)
        leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)]
        return c + sum(leaves), None

    @jax.jit
    def run(labels, cp):
        c, _ = jax.lax.scan(
            lambda c, lbl: body(c, (lbl, cp)), jnp.float32(0), labels)
        return c

    def call(labels):
        return run(labels, caps)
    call.lower = lambda labels: run.lower(labels, caps)
    return call


def timeit(name, fn, labels_sets, overhead_s, caps=None):
    run = make_scan(fn, caps)
    t0 = time.perf_counter()
    float(run(labels_sets[0]))
    print(f"[compile {name}: {time.perf_counter() - t0:.1f}s]",
          file=sys.stderr, flush=True)
    flops = byts = 0.0
    try:
        cost = run.lower(labels_sets[0]).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", 0.0) / K
        byts = sum(v for kk, v in cost.items()
                   if kk.startswith("bytes accessed")) / K
    except Exception as e:  # cost analysis is best-effort on this backend
        print(f"[cost_analysis failed: {e}]", file=sys.stderr, flush=True)
    best = float("inf")
    for s in labels_sets[1:1 + RUNS]:
        t0 = time.perf_counter()
        float(run(s))
        best = min(best, time.perf_counter() - t0)
    dt = (best - overhead_s) / K * 1000
    print(f"{name:32s} {dt:8.2f} ms  {flops/1e9:7.1f} GF  {byts/1e9:6.2f} GB"
          f"  (bw {byts/819e9*1e3:5.2f} ms, mxu {flops/197e12*1e3:5.2f} ms)",
          flush=True)
    return dt


def main():
    enable_compilation_cache()
    cfg = face_config(batch_size=B, is_train=False, fine_size=SIZE,
                      load_size=SIZE, n_shot=NSHOT)
    models = build_models(cfg)
    netG = models.netG
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc

    rng = np.random.RandomState(0)
    label = jnp.asarray(rng.randn(B, h, w, cl).astype(np.float32))
    ref_l = jnp.asarray(rng.randn(B, NSHOT, h, w, cl).astype(np.float32))
    ref_i = jnp.asarray(
        np.tanh(rng.randn(B, NSHOT, h, w, 3)).astype(np.float32))
    n_prev = cfg.n_frames_G - 1
    prev_l = jnp.asarray(rng.randn(B, h, w, cl * n_prev).astype(np.float32))
    prev_i = jnp.asarray(
        np.tanh(rng.randn(B, h, w, 3 * n_prev)).astype(np.float32))
    variables = jax.jit(lambda k: netG.init(
        k, label, ref_l, ref_i, prev_l, prev_i, warp_prev=True,
        train=False))(jax.random.PRNGKey(0))
    variables = bf16_params(fold_spectral_norm(variables))
    var_all = variables

    label, ref_l, ref_i, prev_l, prev_i = cast_floating(
        (label, ref_l, ref_i, prev_l, prev_i), jnp.bfloat16)
    labels_sets = [
        cast_floating(jnp.asarray(
            rng.randn(K, B, h, w, cl).astype(np.float32)), jnp.bfloat16)
        for _ in range(RUNS + 1)]

    if NSHOT == 1:
        cache = jax.jit(lambda rl, ri, lb: netG.apply(
            var_all, rl, ri, lb, method=netG.encode_reference,
            mutable=False))(ref_l, ref_i, label)
    else:
        cache = jax.jit(lambda rl, ri: netG.apply(
            var_all, rl, ri, method=netG.encode_reference_multi,
            mutable=False))(ref_l, ref_i)

    # everything a component touches rides in CAPS (a jit argument — see
    # make_scan: closure captures become HLO constants and overflow the
    # remote-compile request at K=8 512px)
    CAPS = dict(var=var_all, ref_l=ref_l, ref_i=ref_i, prev_l=prev_l,
                prev_i=prev_i, cache=cache,
                ref_l_flat=ref_l.reshape((B * NSHOT,) + ref_l.shape[2:]))

    def full_step(lbl, cp):
        return netG.apply(cp["var"], lbl, cp["ref_l"], cp["ref_i"],
                          cp["cache"], cp["prev_l"], cp["prev_i"],
                          warp_prev=True,
                          method=netG.synthesize, mutable=False)["img_final"]

    def embed_only(lbl, cp):
        def m(g, lb):
            return g.label_embedding(
                lb, weights=cp["cache"]["embedding_weights"], train=False)
        return netG.apply(cp["var"], lbl, method=m, mutable=False)

    def flow_ref_only(lbl, cp):
        def m(g, lb):
            return g.flow_network_ref(lb, cp["ref_l"][:, 0],
                                      cp["ref_i"][:, 0], train=False)
        return netG.apply(cp["var"], lbl, method=m, mutable=False)

    def flow_both(lbl, cp):
        def m(g, lb):
            return g.flow_generation(lb, cp["ref_l"], cp["ref_i"],
                                     cp["prev_l"], cp["prev_i"], None,
                                     True, False)
        out = netG.apply(cp["var"], lbl, method=m, mutable=False)
        return [x for x in out[0] + out[1] + out[2] if x is not None]

    def sc_embed_only(lbl, cp):
        def m(g, lb):
            ds = jnp.concatenate([cp["ref_i"][:, 0], lb[..., :1]], axis=-1)
            return g.img_ref_embedding(ds, train=False)
        return netG.apply(cp["var"], lbl, method=m, mutable=False)

    def main_branch_only(lbl, cp):
        def m(g, lb):
            cache = cp["cache"]
            enc = g.label_embedding(
                lb, weights=cache["embedding_weights"], train=False)
            gen = dict(conv_weights=cache["conv_weights"],
                       norm_weights=cache["norm_weights"])
            return g._main_branch(cache["x_kld"], enc, gen, None, False)[0]
        return netG.apply(cp["var"], lbl, method=m, mutable=False)

    def nosc_step(lbl, cp):
        """synthesize minus the two SC-embedder pyramids: modulate with the
        label pyramid only (subtractive ablation for the glue cost)."""
        def m(g, lb):
            cache = cp["cache"]
            enc = g.label_embedding(
                lb, weights=cache["embedding_weights"], train=False)
            flow, fmask, warp, _ = g.flow_generation(
                lb, cp["ref_l"], cp["ref_i"], cp["prev_l"], cp["prev_i"],
                None, True, False)
            gen = dict(conv_weights=cache["conv_weights"],
                       norm_weights=cache["norm_weights"])
            img = g._main_branch(cache["x_kld"], enc, gen, None, False)[0]
            img = img * fmask[0] + warp[0] * (1 - fmask[0])
            return img * fmask[1] + warp[1] * (1 - fmask[1])
        return netG.apply(cp["var"], lbl, method=m, mutable=False)

    def flow_net2b_only(lbl, cp):
        """The shared flow net as ONE 2B-batched call (no warps) — the
        network half of flow_generation's batched-eval path."""
        def m(g, lb):
            lab2 = jnp.concatenate([lb, lb], 0)
            tgt2 = jnp.concatenate([cp["ref_l"][:, 0], cp["prev_l"]], 0)
            img2 = jnp.concatenate([cp["ref_i"][:, 0], cp["prev_i"]], 0)
            return g.flow_network_ref(lab2, tgt2, img2, False)
        return netG.apply(cp["var"], lbl, method=m, mutable=False)

    def warp_only(lbl, cp):
        """The batched 2-warp alone, flow derived cheaply from the label so
        each scan iteration gathers at different indices (no CSE)."""
        img2 = jnp.concatenate([cp["ref_i"][:, 0], cp["prev_i"][..., -3:]], 0)
        f1 = jnp.concatenate([lbl[..., :1], lbl[..., :1] * 0.5], -1) * 8.0
        flow2 = jnp.concatenate([f1, f1 * -0.7], 0).astype(img2.dtype)
        from fsvid2vid_tpu.ops.warp import flow_warp
        return flow_warp(img2, flow2)

    # ---- K>1 components: the prefix-cached full __call__ and its pieces ----
    def kfull_step(lbl, cp):
        out = netG.apply(cp["var"], lbl, cp["ref_l"], cp["ref_i"],
                         cp["prev_l"], cp["prev_i"], warp_prev=True,
                         train=False, prefix=cp["cache"], mutable=False)
        return out["img_final"]

    def attn_only(lbl, cp):
        def m(g, lb):
            cache = cp["cache"]
            return g._attention_module(
                cache["x"], cache["x_label"], lb, cp["ref_l_flat"],
                train=False, key=cache["key"])[:2]
        return netG.apply(cp["var"], lbl, method=m, mutable=False)

    def wgen_only(lbl, cp):
        def m(g, lb):
            x, gen = g.weight_generation(cp["ref_i"], cp["ref_l"], lb,
                                         train=False, prefix=cp["cache"])
            return [x] + [t for t in jax.tree.leaves(
                (gen["conv_weights"], gen["norm_weights"],
                 gen["embedding_weights"]))]
        return netG.apply(cp["var"], lbl, method=m, mutable=False)

    # dispatch overhead: empty scan over the same label stack
    over_run = make_scan(lambda lbl, cp: jnp.float32(0), CAPS)
    float(over_run(labels_sets[0]))
    overhead = min(_timed(over_run, s) for s in labels_sets[1:])
    print(f"[dispatch overhead: {overhead * 1000:.1f} ms]", file=sys.stderr,
          flush=True)

    print(f"=== {SIZE}px B={B} K={NSHOT} frame-step ablation, bf16, "
          f"{jax.devices()[0].device_kind}, scan={K} ===", flush=True)
    parts = {
        "full": ("full synthesize step", full_step),
        "embed": ("label_embedding", embed_only),
        "flow1": ("flow net (ref only)", flow_ref_only),
        "flow2": ("flow_generation (both)", flow_both),
        "sc": ("spade-combine embed (one)", sc_embed_only),
        "main": ("main branch (+embed)", main_branch_only),
        "nosc": ("synthesize minus sc embedders", nosc_step),
        "flownet2b": ("flow net 2B-batched (no warp)", flow_net2b_only),
        "warponly": ("flat-batch 2-warp only", warp_only),
        "kfull": ("full __call__ (prefix cache)", kfull_step),
        "attn": ("attention module (cached keys)", attn_only),
        "wgen": ("weight_generation (prefix)", wgen_only),
    }
    for key, (name, fn) in parts.items():
        if WHICH is None or key in WHICH:
            timeit(name, fn, labels_sets, overhead, CAPS)


def _timed(run, s):
    t0 = time.perf_counter()
    float(run(s))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
