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

    # ---- stage functions: (batch,) -> pytree; close over state via CAPS ----
    def full_fn(b):
        st2, pv2, losses, _vis = train_step(cfg, models, state, wrap(b),
                                            prevs, flags, jax.random.PRNGKey(0))
        return losses["G_total"] + losses["D_total"]

    def gen_fwd_fn(b):
        out, _, _, _ = generate_images(cfg, models, state.params_G,
                                       state.aux_G, wrap(b), prevs, flags,
                                       train=True)
        return [v for v in out.values()
                if v is not None and hasattr(v, "dtype")]

    def gen_fwdbwd_fn(b):
        def f(pg):
            out, _, _, _ = generate_images(cfg, models, pg, state.aux_G,
                                           wrap(b), prevs, flags, train=True)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values()
                       if v is not None and hasattr(v, "dtype"))
        return jax.grad(f)(state.params_G)

    def d_phase_fn(b):
        def f(pd):
            tot, aux = _d_losses(cfg, models, pd, state.aux_D, gen_det,
                                 wrap(b), prevs, masks0, refs0, flags)
            return tot
        grads = jax.grad(f)(state.params_D)
        upd, _ = opt_D_tx.update(grads, state.opt_D, state.params_D)
        return optax.apply_updates(state.params_D, upd)

    def g_loss_fwd_fn(b):
        tot, aux = _g_losses(cfg, models, state.params_D, state.aux_D,
                             state.vgg_params, wrap(b), prevs, flags,
                             outputs0, masks0, refs0)
        return tot

    def g_phase_fn(b):
        def f(pg):
            out, msk, rfs, _ = generate_images(cfg, models, pg, state.aux_G,
                                               wrap(b), prevs, flags,
                                               train=True)
            tot, _aux = _g_losses(cfg, models, state.params_D, state.aux_D,
                                  state.vgg_params, wrap(b), prevs, flags,
                                  out, msk, rfs)
            return tot
        grads = jax.grad(f)(state.params_G)
        upd, _ = opt_G_tx.update(grads, state.opt_G, state.params_G)
        return optax.apply_updates(state.params_G, upd)

    def vgg_fwdbwd_fn(b):
        from fsvid2vid_tpu.losses import collector as lc
        from fsvid2vid_tpu.training.step import _vgg_apply
        vgg_apply = _vgg_apply(models, state.vgg_params,
                               cfg.remat_scope("vgg"))
        if vgg_apply is None:
            return jnp.float32(0)
        def f(fake):
            return lc.compute_vgg_losses(cfg, vgg_apply, fake, None,
                                         b["tgt_image"], None)
        return jax.grad(f)(b["tgt_image"] * 0.9)

    def flow_fwdbwd_fn(b):
        netG = models.netG
        def f(pg):
            def m(g, lb):
                out = g.flow_generation(lb, b["ref_labels"], b["ref_images"],
                                        prevs["label"], prevs["fake"], None,
                                        True, True)
                return sum(jnp.sum(t.astype(jnp.float32))
                           for part in out[:3] for t in (part or [])
                           if t is not None)
            return netG.apply({"params": pg["G"], **state.aux_G["G"]},
                              b["tgt_label"].astype(jnp.bfloat16),
                              method=m, mutable=False)
        from fsvid2vid_tpu.parallel.precision import cast_floating
        return jax.grad(lambda pg: f(cast_floating(pg, jnp.bfloat16)))(
            state.params_G)

    def opt_only_fn(b):
        uG, _ = opt_G_tx.update(zg_G, state.opt_G, state.params_G)
        uD, _ = opt_D_tx.update(zg_D, state.opt_D, state.params_D)
        return (optax.apply_updates(state.params_G, uG),
                optax.apply_updates(state.params_D, uD))

    # ---- scan harness (profile_frame.py pattern) ----
    def make_scan(fn):
        def body(c, b):
            out = fn(b)
            leaves = [jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree.leaves(out)]
            return c + sum(leaves), None
        @jax.jit
        def run(batches):
            c, _ = jax.lax.scan(body, jnp.float32(0), batches)
            return c
        return run

    def timed(run, s):
        t0 = time.perf_counter()
        float(run(s))
        return time.perf_counter() - t0

    over = make_scan(lambda b: jnp.float32(0))
    float(over(sets[0]))
    overhead = min(timed(over, s) for s in sets[1:])
    print(f"[dispatch overhead: {overhead*1000:.1f} ms]", file=sys.stderr,
          flush=True)
    print(f"=== {WHICH} bs{BS} {h}x{w} TRAIN-step attribution, "
          f"remat={cfg.remat} scopes={cfg.remat_scopes if cfg.remat else '-'},"
          f" {jax.devices()[0].device_kind}, scan={K} ===", flush=True)

    stages = {
        "full": ("full train_step (D+G+opt)", full_fn),
        "gen_fwd": ("generation fwd (train)", gen_fwd_fn),
        "gen_fwdbwd": ("generation fwd+bwd", gen_fwdbwd_fn),
        "d_phase": ("D losses fwd+bwd+Adam", d_phase_fn),
        "g_loss_fwd": ("G losses fwd (given outputs)", g_loss_fwd_fn),
        "g_phase": ("G phase fwd+bwd+Adam", g_phase_fn),
        "vgg_fwdbwd": ("VGG branch fwd+bwd", vgg_fwdbwd_fn),
        "flow_fwdbwd": ("flow_generation fwd+bwd", flow_fwdbwd_fn),
        "opt_only": ("Adam updates alone", opt_only_fn),
    }
    for key, (name, fn) in stages.items():
        if STAGES is not None and key not in STAGES:
            continue
        run = make_scan(fn)
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
