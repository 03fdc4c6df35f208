"""Per-stage cost attribution of the TRAINING step on one TPU chip —
the training twin of profile_frame.py (round-5 verdict ask #1).

Each stage runs K times inside ONE jitted lax.scan over K distinct batches
(distinct inputs defeat CSE; the remote relay costs ~28 ms/dispatch so
host-side loops cannot time components).  Reported per-stage numbers are
(t_scan - t_empty_scan) / K, with XLA cost-analysis FLOPs/bytes where the
backend provides them.

Stages (reference workload train.py:44-62; our step training/step.py):
  full        whole train_step (D update + G update + prevs advance)
  gen_fwd     generation forward alone, train=True (vid2vid_model.py:108)
  gen_fwdbwd  generation forward + full parameter backward (the vjp cost)
  d_phase     D losses fwd+bwd + Adam update, generated images precomputed
  g_loss_fwd  generator-side losses alone given outputs (GAN+feat+VGG+flow)
  g_phase     losses-through-generation fwd+bwd + Adam update (the G step)
  vgg_fwdbwd  perceptual branch alone: VGG(fake)+VGG(real) + L1, fwd+bwd
  flow_fwdbwd flow_generation (both nets + warps) alone, fwd+bwd
  opt_only    both Adam updates on cached grads (optimizer overhead)

Usage: python scripts/profile_train.py [face|pose|face512] [bs] [stages] [scopes]
  scopes: comma subset of blocks,flow,embed,vgg (cfg.remat_scopes), or
  "none" to disable remat — mirrors train_bench.py.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fsvid2vid_tpu.cache import enable_compilation_cache
from fsvid2vid_tpu.config import face_config, pose_config
from fsvid2vid_tpu.training.state import (
    build_models, init_state, make_optimizers)
from fsvid2vid_tpu.training.step import (
    StepFlags, _d_losses, _g_losses, generate_images, init_prevs, train_step)

WHICH = sys.argv[1] if len(sys.argv) > 1 else "pose"
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
STAGES = sys.argv[3].split(",") if len(sys.argv) > 3 else None
SCOPES = sys.argv[4] if len(sys.argv) > 4 else None
K = int(os.environ.get("PROF_K", "4"))
RUNS = int(os.environ.get("PROF_RUNS", "3"))


def make_cfg():
    extra = {}
    if SCOPES == "none":
        extra = dict(remat=False)
    elif SCOPES:
        extra = dict(remat=True, remat_scopes=SCOPES)
    if WHICH == "pose":
        return pose_config(batch_size=BS, fine_size=256, load_size=256,
                           refine_face=True, compute_dtype="bfloat16",
                           **extra)
    if WHICH == "face512":
        return face_config(batch_size=BS, fine_size=512, load_size=512,
                           num_D=2, compute_dtype="bfloat16", **extra)
    return face_config(batch_size=BS, fine_size=256, load_size=256,
                       compute_dtype="bfloat16", **extra)


def main():
    enable_compilation_cache()
    cfg = make_cfg()
    models = build_models(cfg)
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
    flags = StepFlags(warp_prev=True, has_prev=True)

    def batch_of(seed):
        r = np.random.RandomState(seed)
        return {
            "tgt_label": r.randn(BS, h, w, cl).astype(np.float32),
            "tgt_image": np.tanh(r.randn(BS, h, w, 3)).astype(np.float32),
            "ref_labels": r.randn(BS, 1, h, w, cl).astype(np.float32),
            "ref_images": np.tanh(r.randn(BS, 1, h, w, 3)).astype(np.float32),
        }

    batch0 = {k: jnp.asarray(v) for k, v in batch_of(0).items()}
    batch0 = dict(batch0, flow_gt=[None, None], conf_gt=[None, None])
    state = jax.jit(lambda k, b: init_state(cfg, models, k, b))(
        jax.random.PRNGKey(0), batch0)
    jax.block_until_ready(state.params_G)
    prevs = init_prevs(cfg, batch0)
    if cfg.compute_dtype == "bfloat16":
        prevs = dict(prevs, label=prevs["label"].astype(jnp.bfloat16),
                     fake=prevs["fake"].astype(jnp.bfloat16))
    opt_G_tx, opt_D_tx = make_optimizers(cfg)

    ARRAY_KEYS = ("tgt_label", "tgt_image", "ref_labels", "ref_images")

    def stack(lo):
        bs = [batch_of(100 * lo + i) for i in range(K)]
        return {k: jnp.stack([jnp.asarray(b[k]) for b in bs])
                for k in ARRAY_KEYS}

    sets = [stack(i) for i in range(RUNS + 1)]

    def wrap(b):
        return dict(b, flow_gt=[None, None], conf_gt=[None, None])

    # precomputed generation outputs for the stages that take them as given
    outputs0, masks0, refs0, _auxG = jax.jit(
        lambda st, b, pv: generate_images(cfg, models, st.params_G, st.aux_G,
                                          b, pv, flags, train=True)[:4]
    )(state, batch0, prevs)
    outputs0 = jax.tree.map(jax.lax.stop_gradient, outputs0)
    gen_det = dict(fake_image=outputs0["fake_image"],
                   fake_raw=outputs0["fake_raw"])

    # cached grads for opt_only (zeros-like params work for Adam timing)
    zg_G = jax.tree.map(jnp.zeros_like, state.params_G)
    zg_D = jax.tree.map(jnp.zeros_like, state.params_D)

    # everything a stage touches rides in CAPS (a jit ARGUMENT, not a
    # closure capture — captures are baked into the HLO as constants and
    # overflow the remote-compile request: profile_frame.py:40-43)
    CAPS = dict(state=state, prevs=prevs, outputs0=outputs0, masks0=masks0,
                refs0=refs0, gen_det=gen_det, zg_G=zg_G, zg_D=zg_D)

    # ---- stage functions: (batch, caps) -> pytree ----
    def full_fn(b, cp):
        st2, pv2, losses, _vis = train_step(cfg, models, cp["state"], wrap(b),
                                            cp["prevs"], flags,
                                            jax.random.PRNGKey(0))
        # return the UPDATED params, not just the loss scalars: the loss
        # values depend only on the forwards, so returning losses alone lets
        # XLA dead-code-eliminate the entire backward + optimizer
        return (st2.params_G, st2.params_D,
                losses["G_total"] + losses["D_total"])

    def gen_fwd_fn(b, cp):
        st = cp["state"]
        out, _, _, _ = generate_images(cfg, models, st.params_G,
                                       st.aux_G, wrap(b), cp["prevs"], flags,
                                       train=True)
        return [v for v in out.values()
                if v is not None and hasattr(v, "dtype")]

    def gen_fwdbwd_fn(b, cp):
        st = cp["state"]
        def f(pg):
            out, _, _, _ = generate_images(cfg, models, pg, st.aux_G,
                                           wrap(b), cp["prevs"], flags,
                                           train=True)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values()
                       if v is not None and hasattr(v, "dtype"))
        return jax.grad(f)(st.params_G)

    def d_phase_fn(b, cp):
        st = cp["state"]
        def f(pd):
            tot, aux = _d_losses(cfg, models, pd, st.aux_D, cp["gen_det"],
                                 wrap(b), cp["prevs"], cp["masks0"],
                                 cp["refs0"], flags)
            return tot
        grads = jax.grad(f)(st.params_D)
        upd, _ = opt_D_tx.update(grads, st.opt_D, st.params_D)
        return optax.apply_updates(st.params_D, upd)

    def g_loss_fwd_fn(b, cp):
        st = cp["state"]
        tot, aux = _g_losses(cfg, models, st.params_D, st.aux_D,
                             st.vgg_params, wrap(b), cp["prevs"], flags,
                             cp["outputs0"], cp["masks0"], cp["refs0"])
        return tot

    def g_phase_fn(b, cp):
        st = cp["state"]
        def f(pg):
            out, msk, rfs, _ = generate_images(cfg, models, pg, st.aux_G,
                                               wrap(b), cp["prevs"], flags,
                                               train=True)
            tot, _aux = _g_losses(cfg, models, st.params_D, st.aux_D,
                                  st.vgg_params, wrap(b), cp["prevs"], flags,
                                  out, msk, rfs)
            return tot
        grads = jax.grad(f)(st.params_G)
        upd, _ = opt_G_tx.update(grads, st.opt_G, st.params_G)
        return optax.apply_updates(st.params_G, upd)

    def vgg_fwdbwd_fn(b, cp):
        from fsvid2vid_tpu.losses import collector as lc
        from fsvid2vid_tpu.training.step import _vgg_apply
        vgg_apply = _vgg_apply(models, cp["state"].vgg_params,
                               cfg.remat_scope("vgg"))
        if vgg_apply is None:
            return jnp.float32(0)
        def f(fake):
            return lc.compute_vgg_losses(cfg, vgg_apply, fake, None,
                                         b["tgt_image"], None)
        return jax.grad(f)(b["tgt_image"] * 0.9)

    def flow_fwdbwd_fn(b, cp):
        netG = models.netG
        st = cp["state"]
        def f(pg):
            def m(g, lb):
                out = g.flow_generation(lb, b["ref_labels"], b["ref_images"],
                                        cp["prevs"]["label"],
                                        cp["prevs"]["fake"], None,
                                        True, True)
                return sum(jnp.sum(t.astype(jnp.float32))
                           for part in out[:3] for t in (part or [])
                           if t is not None)
            out, _ = netG.apply({"params": pg["G"], **st.aux_G["G"]},
                                b["tgt_label"].astype(jnp.bfloat16),
                                method=m,
                                mutable=["spectral", "batch_stats"])
            return out
        from fsvid2vid_tpu.parallel.precision import cast_floating
        return jax.grad(lambda pg: f(cast_floating(pg, jnp.bfloat16)))(
            st.params_G)

    # ---- train-mode per-subnet forward probes (where do gen_fwd's bytes
    # go?).  Each applies one sub-network with train=True through netG.apply
    # (mutable spectral/batch_stats discarded — cost identical).
    def _apply_m(cp, m, *args):
        st = cp["state"]
        out, _ = models.netG.apply(
            {"params": st.params_G["G"], **st.aux_G["G"]}, *args, method=m,
            mutable=["spectral", "batch_stats"])
        return out

    def wgen_fwd_fn(b, cp):
        def m(g, lb):
            x, gen = g.weight_generation(
                b["ref_images"].astype(jnp.bfloat16),
                b["ref_labels"].astype(jnp.bfloat16), lb, train=True)
            return [x] + [t for t in jax.tree.leaves(
                (gen["conv_weights"], gen["norm_weights"],
                 gen["embedding_weights"]))]
        return _apply_m(cp, m, b["tgt_label"].astype(jnp.bfloat16))

    def wgen_fwdbwd_fn(b, cp):
        st = cp["state"]
        from fsvid2vid_tpu.parallel.precision import cast_floating
        def f(pg):
            def m(g, lb):
                x, gen = g.weight_generation(
                    b["ref_images"].astype(jnp.bfloat16),
                    b["ref_labels"].astype(jnp.bfloat16), lb, train=True)
                return sum(jnp.sum(t.astype(jnp.float32))
                           for t in [x] + jax.tree.leaves(
                               (gen["conv_weights"], gen["norm_weights"],
                                gen["embedding_weights"])))
            out, _ = models.netG.apply(
                {"params": cast_floating(pg["G"], jnp.bfloat16),
                 **st.aux_G["G"]},
                b["tgt_label"].astype(jnp.bfloat16), method=m,
                mutable=["spectral", "batch_stats"])
            return out
        return jax.grad(f)(st.params_G)

    def mainchain_fwd_fn(b, cp):
        """weight_generation + label_embedding + _main_branch, train mode —
        the non-flow, non-SC half of generation."""
        def m(g, lb):
            x, gen = g.weight_generation(
                b["ref_images"].astype(jnp.bfloat16),
                b["ref_labels"].astype(jnp.bfloat16), lb, train=True)
            enc = g.label_embedding(lb, weights=gen["embedding_weights"],
                                    train=True)
            img, raw = g._main_branch(x, enc, gen, lb, train=True)
            return [img] + ([raw] if raw is not None else [])
        return _apply_m(cp, m, b["tgt_label"].astype(jnp.bfloat16))

    def scembed_fwd_fn(b, cp):
        """One SC-embedder pyramid, train mode (eval runs the ref+prev pair
        2B-batched; training runs two separate calls)."""
        def m(g, lb):
            ds = jnp.concatenate([b["ref_images"][:, 0].astype(jnp.bfloat16),
                                  lb[..., :1]], axis=-1)
            return g.img_ref_embedding(ds, None, True)
        return _apply_m(cp, m, b["tgt_label"].astype(jnp.bfloat16))

    def labelembed_fwd_fn(b, cp):
        def m(g, lb):
            return g.label_embedding(lb, weights=None, train=True)
        return _apply_m(cp, m, b["tgt_label"].astype(jnp.bfloat16))

    def _grad_m(cp, make_m, *args):
        """grad of a scalarized netG method application wrt params_G."""
        st = cp["state"]
        from fsvid2vid_tpu.parallel.precision import cast_floating
        def f(pg):
            out, _ = models.netG.apply(
                {"params": cast_floating(pg["G"], jnp.bfloat16),
                 **st.aux_G["G"]}, *args, method=make_m,
                mutable=["spectral", "batch_stats"])
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(out))
        return jax.grad(f)(st.params_G)

    def mainchain_fwdbwd_fn(b, cp):
        def m(g, lb):
            x, gen = g.weight_generation(
                b["ref_images"].astype(jnp.bfloat16),
                b["ref_labels"].astype(jnp.bfloat16), lb, train=True)
            enc = g.label_embedding(lb, weights=gen["embedding_weights"],
                                    train=True)
            img, raw = g._main_branch(x, enc, gen, lb, train=True)
            return [img] + ([raw] if raw is not None else [])
        return _grad_m(cp, m, b["tgt_label"].astype(jnp.bfloat16))

    def scembed_fwdbwd_fn(b, cp):
        def m(g, lb):
            ds = jnp.concatenate([b["ref_images"][:, 0].astype(jnp.bfloat16),
                                  lb[..., :1]], axis=-1)
            return g.img_ref_embedding(ds, None, True)
        return _grad_m(cp, m, b["tgt_label"].astype(jnp.bfloat16))

    def flownets_fwdbwd_fn(b, cp):
        """The two flow NETS alone (no warps), train mode fwd+bwd."""
        def m(g, lb):
            f1, m1 = g.flow_network_ref(lb, b["ref_labels"][:, 0].astype(
                jnp.bfloat16), b["ref_images"][:, 0].astype(jnp.bfloat16),
                True)
            net2 = (g.flow_network_ref if cfg.flow_temp_is_shared
                    else g.flow_network_temp)
            f2, m2 = net2(lb, cp["prevs"]["label"], cp["prevs"]["fake"], True)
            return [f1, m1, f2, m2]
        return _grad_m(cp, m, b["tgt_label"].astype(jnp.bfloat16))

    def warp_fwdbwd_fn(b, cp):
        """The two training-path warps alone, fwd + bwd wrt image AND flow
        (the backward's scatter-add is the suspected hotspot)."""
        from fsvid2vid_tpu.ops.warp import flow_warp
        img1 = b["ref_images"][:, 0].astype(jnp.bfloat16)
        img2 = cp["prevs"]["fake"][..., -3:]
        f_base = (b["tgt_label"][..., :2] * 8.0).astype(jnp.bfloat16)
        def f(args):
            i1, i2, fl = args
            w1 = flow_warp(i1, fl)
            w2 = flow_warp(i2, fl * -0.7)
            return (jnp.sum(w1.astype(jnp.float32))
                    + jnp.sum(w2.astype(jnp.float32)))
        return jax.grad(f)((img1, img2, f_base))

    def facegf_fwdbwd_fn(b, cp):
        """Face refiner (netGf on face crops) fwd+bwd — pose runs it inside
        every generation (cfg.refine_face)."""
        if models.netGf is None:
            return jnp.float32(0)
        st = cp["state"]
        from fsvid2vid_tpu.parallel.precision import cast_floating
        from fsvid2vid_tpu.models.face_refiner import refine_face_region
        from fsvid2vid_tpu.models.input_process import use_valid_labels
        lb = b["tgt_label"].astype(jnp.bfloat16)
        lbv = use_valid_labels(cfg, lb)
        coarse = b["tgt_image"].astype(jnp.bfloat16)
        ref_l = b["ref_labels"][:, 0].astype(jnp.bfloat16)
        ref_i = b["ref_images"][:, 0].astype(jnp.bfloat16)
        ref_lv = use_valid_labels(cfg, ref_l)
        def f(pg):
            pgc = cast_floating(pg, jnp.bfloat16)
            def netGf_apply(lbl_f, ref_l_f, ref_i_f, crs):
                y, _ = models.netGf.apply(
                    {"params": pgc["Gf"], **st.aux_G["Gf"]},
                    lbl_f, ref_l_f, ref_i_f, crs, train=True,
                    mutable=["spectral", "batch_stats"],
                    method=models.netGf.forward_face)
                return y
            out = refine_face_region(cfg, netGf_apply, lbv, coarse, lb,
                                     ref_lv, ref_i, ref_l)
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(f)(st.params_G)

    def opt_only_fn(b, cp):
        st = cp["state"]
        uG, _ = opt_G_tx.update(cp["zg_G"], st.opt_G, st.params_G)
        uD, _ = opt_D_tx.update(cp["zg_D"], st.opt_D, st.params_D)
        return (optax.apply_updates(st.params_G, uG),
                optax.apply_updates(st.params_D, uD))

    def full_carried_fn(b, cp):
        # placeholder; replaced by a carried-scan runner below (state+prevs
        # threaded through the scan like the real trainer / train_bench.py —
        # isolates the cost of the carried multi-GB train state vs the
        # fixed-state `full` stage)
        return jnp.float32(0)

    def make_carried_run():
        def body(carry, b):
            st, pv = carry
            st2, pv2, losses, _vis = train_step(cfg, models, st, wrap(b), pv,
                                                flags, jax.random.PRNGKey(0))
            pv2 = {k: v.astype(pv[k].dtype) for k, v in pv2.items()}
            return (st2, pv2), losses["G_total"]
        @jax.jit
        def run_(st, pv, batches):
            (st, pv), tot = jax.lax.scan(body, (st, pv), batches)
            return st.step, jnp.sum(tot)
        def run(batches):
            s, tot = run_(CAPS["state"], CAPS["prevs"], batches)
            return float(tot) * 0 + float(s)
        run.lower = lambda batches: run_.lower(CAPS["state"], CAPS["prevs"],
                                               batches)
        return run

    # ---- scan harness (profile_frame.py pattern) ----
    def make_scan(fn):
        def body(c, b_cp):
            b, cp = b_cp
            out = fn(b, cp)
            leaves = [jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree.leaves(out)]
            return c + sum(leaves), None
        @jax.jit
        def run_(batches, cp):
            c, _ = jax.lax.scan(
                lambda c, b: body(c, (b, cp)), jnp.float32(0), batches)
            return c
        def run(batches):
            return run_(batches, CAPS)
        run.lower = lambda batches: run_.lower(batches, CAPS)
        return run

    def timed(run, s):
        t0 = time.perf_counter()
        float(run(s))
        return time.perf_counter() - t0

    over = make_scan(lambda b, cp: jnp.float32(0))
    float(over(sets[0]))
    overhead = min(timed(over, s) for s in sets[1:])
    print(f"[dispatch overhead: {overhead*1000:.1f} ms]", file=sys.stderr,
          flush=True)
    print(f"=== {WHICH} bs{BS} {h}x{w} TRAIN-step attribution, "
          f"remat={cfg.remat} scopes={cfg.remat_scopes if cfg.remat else '-'},"
          f" {jax.devices()[0].device_kind}, scan={K} ===", flush=True)

    stages = {
        "full": ("full train_step (D+G+opt)", full_fn),
        "full_carried": ("full step, carried state scan", full_carried_fn),
        "gen_fwd": ("generation fwd (train)", gen_fwd_fn),
        "gen_fwdbwd": ("generation fwd+bwd", gen_fwdbwd_fn),
        "d_phase": ("D losses fwd+bwd+Adam", d_phase_fn),
        "g_loss_fwd": ("G losses fwd (given outputs)", g_loss_fwd_fn),
        "g_phase": ("G phase fwd+bwd+Adam", g_phase_fn),
        "vgg_fwdbwd": ("VGG branch fwd+bwd", vgg_fwdbwd_fn),
        "flow_fwdbwd": ("flow_generation fwd+bwd", flow_fwdbwd_fn),
        "opt_only": ("Adam updates alone", opt_only_fn),
        "wgen_fwd": ("weight_generation fwd (train)", wgen_fwd_fn),
        "wgen_fwdbwd": ("weight_generation fwd+bwd", wgen_fwdbwd_fn),
        "mainchain_fwd": ("wgen+embed+main fwd (train)", mainchain_fwd_fn),
        "scembed_fwd": ("SC embedder fwd (train)", scembed_fwd_fn),
        "labelembed_fwd": ("label embed fwd (train)", labelembed_fwd_fn),
        "mainchain_fwdbwd": ("wgen+embed+main fwd+bwd", mainchain_fwdbwd_fn),
        "scembed_fwdbwd": ("SC embedder fwd+bwd", scembed_fwdbwd_fn),
        "flownets_fwdbwd": ("flow nets only fwd+bwd", flownets_fwdbwd_fn),
        "warp_fwdbwd": ("2-warp only fwd+bwd", warp_fwdbwd_fn),
        "facegf_fwdbwd": ("face refiner fwd+bwd", facegf_fwdbwd_fn),
    }
    for key, (name, fn) in stages.items():
        if STAGES is not None and key not in STAGES:
            continue
        run = make_carried_run() if key == "full_carried" else make_scan(fn)
        t0 = time.perf_counter()
        try:
            float(run(sets[0]))
        except Exception as e:
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        print(f"[compile {key}: {time.perf_counter()-t0:.1f}s]",
              file=sys.stderr, flush=True)
        flops = byts = 0.0
        try:
            cost = run.lower(sets[0]).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = cost.get("flops", 0.0) / K
            byts = sum(v for kk, v in cost.items()
                       if kk.startswith("bytes accessed")) / K
        except Exception:
            pass
        best = min(timed(run, s) for s in sets[1:])
        dt = (best - overhead) / K * 1000
        print(f"{name:32s} {dt:8.1f} ms  {flops/1e12:6.2f} TF  "
              f"{byts/1e9:6.2f} GB  (bw {byts/819e9*1e3:6.2f} ms, "
              f"mxu {flops/197e12*1e3:6.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
