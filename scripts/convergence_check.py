"""GAN-dynamics convergence validation vs the torch reference (VERDICT r1 #4).

Runs the SAME training — identical synthetic-but-structured batches, imported
identical initial weights, same TTUR Adam hyperparameters — through

  * the reference's real Vid2VidModel D/G alternation
    (/root/reference/train.py:44-62, models/vid2vid_model.py:47-128), and
  * our jitted train_step (fsvid2vid_tpu/training/step.py),

and compares per-step loss trajectories.  Default config: tiny face (ngf=4,
32px), fp32, no VGG, no flow teacher on either side (--no_flow_gt; F_Warp/
F_Mask still active).  Spectral u/v are burned in on the torch side before
import so the reference's 2-power-iterations-per-step vs our 1 does not
dominate early drift.

The quality-tracked long run (VERDICT r2 #4) adds:
  --vgg          perceptual loss ACTIVE in both stacks, driven by the SAME
                 seeded-random torchvision-layout vgg19 state_dict loaded
                 into both (reference_loader.save_random_vgg19 — ImageNet
                 weights are not downloadable here; an identical random VGG
                 is the identical loss function on both sides)
  --lpips-every N track LPIPS(fake, target) for BOTH stacks every N steps
                 with one shared (uncalibrated, deterministic) LPIPS net —
                 a training-quality curve comparable across stacks.

Usage: python scripts/convergence_check.py [STEPS] [OUT.json]
           [--ngf N] [--size S] [--vgg] [--lpips-every N]
Emits one JSON line per step with both loss dicts (+ lpips), then a summary.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

SIZE = 32
BS = 2
NGF = 4
USE_VGG = False
WORKLOAD = "face"   # 'face' (1ch edge labels) | 'pose' (6ch IUV+keypoint)
VGG_PATH = "/tmp/convergence_vgg19.pt"

LOSS_KEYS = ["G_GAN", "G_GAN_Feat", "F_Warp", "F_Mask",
             "D_real", "D_fake"]


# ----------------------------------------------------------------------
# synthetic structured data: smooth keypoint tracks -> edge label + RGB
# ----------------------------------------------------------------------

def _render_seq(seed, n_frames, size):
    """One sequence: 68 keypoints moving smoothly; label = stamped edge
    points (1ch), image = colored gaussian blobs at the same points (3ch).
    Structured enough that warp/GAN losses see consistent motion.

    Pose workload (--workload pose): 25 joints on the same smooth tracks;
    label = 6 channels — [0:3] densepose-ish per-part colored bands, [3:6]
    openpose-ish line stamps along the skeleton edges (the fewshot_pose
    6-channel concat of IUV render + keypoint render,
    fewshot_pose_dataset.py:166-178)."""
    r = np.random.RandomState(seed)
    n_pts = 25 if WORKLOAD == "pose" else 68
    base = r.rand(n_pts, 2) * (size * 0.7) + size * 0.15
    vel = (r.rand(n_pts, 2) - 0.5) * 1.5
    colors = r.rand(n_pts, 3) * 2 - 1
    part_colors = r.rand(n_pts, 3) * 2 - 1
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    labels, images = [], []
    for t in range(n_frames):
        pts = base + vel * t + 0.2 * np.sin(0.3 * t + np.arange(n_pts))[:, None]
        pts = np.clip(pts, 1, size - 2)
        img = np.zeros((size, size, 3), np.float32)
        if WORKLOAD == "pose":
            # positive-intensity renders mapped to [-1, 1] with background
            # exactly -1 (the IUV/keypoint canvases normalize 0 -> -1, which
            # the fg-mask threshold `> -1` keys on, input_process.py:57-61)
            dense = np.zeros((size, size, 3), np.float32)
            open_ = np.zeros((size, size, 3), np.float32)
            for i, (p, c, pc) in enumerate(zip(pts, colors, part_colors)):
                d2 = (yy - p[1]) ** 2 + (xx - p[0]) ** 2
                dense += np.exp(-d2 / 6.0)[..., None] * np.abs(pc)[None, None]
                # "limb" line toward the next joint: 3 interpolated stamps
                q = pts[(i + 1) % n_pts]
                for a in (0.25, 0.5, 0.75):
                    m = p * (1 - a) + q * a
                    d2m = (yy - m[1]) ** 2 + (xx - m[0]) ** 2
                    open_ += (np.exp(-d2m / 1.5)[..., None]
                              * np.abs(c)[None, None])
                img += np.exp(-d2 / 2.0)[..., None] * c[None, None]
            lab = np.concatenate([np.tanh(dense) * 2 - 1,
                                  np.tanh(open_) * 2 - 1], axis=-1)
            labels.append(lab)
        else:
            lab = np.zeros((size, size, 1), np.float32)
            for p, c in zip(pts, colors):
                d2 = (yy - p[1]) ** 2 + (xx - p[0]) ** 2
                g = np.exp(-d2 / 2.0)
                lab[..., 0] = np.maximum(lab[..., 0], np.float32(g))
                img += g[..., None] * c[None, None]
            labels.append(lab * 2 - 1)
        images.append(np.tanh(img))
    return np.stack(labels), np.stack(images)


def make_batches(n_steps, n_seq=8, n_frames=12):
    seqs = [_render_seq(1000 + i, n_frames, SIZE) for i in range(n_seq)]
    r = np.random.RandomState(7)
    batches = []
    for _ in range(n_steps):
        tl, ti, rl, ri = [], [], [], []
        for _ in range(BS):
            s = r.randint(n_seq)
            t = r.randint(1, n_frames)
            labs, imgs = seqs[s]
            tl.append(labs[t]); ti.append(imgs[t])
            rl.append(labs[0]); ri.append(imgs[0])
        batches.append(dict(
            tgt_label=np.stack(tl), tgt_image=np.stack(ti),
            ref_labels=np.stack(rl)[:, None], ref_images=np.stack(ri)[:, None]))
    return batches


# ----------------------------------------------------------------------
# torch reference side
# ----------------------------------------------------------------------

def run_torch(batches, state_out, lpips_cb=None, lpips_every=0, seed=0,
              perturb=0.0):
    sys.path.insert(0, "/root/repo/tests")
    from reference_loader import (load_reference_modules, make_reference_opt,
                                  install_vgg19_weights)
    load_reference_modules()
    if USE_VGG:
        install_vgg19_weights(VGG_PATH)
    import torch
    from models.vid2vid_model import Vid2VidModel
    from models.loss_collector import loss_backward

    # pose workload: 6-channel inputs, same net family; the aux face D /
    # face refiner are kept OFF on both sides (they need landmark crop
    # boxes, which the synthetic data has no meaningful notion of — the
    # face-D loss path has its own bitwise step test in tests/)
    pose_kw = (dict(dataset_mode="fewshot_pose", input_nc=6)
               if WORKLOAD == "pose" else {})
    opt = make_reference_opt(
        ngf=NGF, nff=NGF, ndf=NGF, fineSize=SIZE, loadSize=SIZE,
        n_blocks_F=2, n_downsample_G=3, n_adaptive_layers=2,
        isTrain=True, no_vgg_loss=not USE_VGG, no_flow_gt=True,
        **pose_kw,
        gan_mode="hinge", lambda_feat=10.0, lambda_vgg=10.0,
        lambda_flow=10.0, lambda_mask=10.0, lambda_temp=0.0,
        lambda_face=10.0, lambda_kld=0.0,
        lr=4e-4, beta1=0.5, beta2=0.999, no_TTUR=False,
        amp="O0", distributed=False, continue_train=False,
        load_pretrain="", n_frames_D=2, n_frames_per_gpu=1,
        niter_single=1000, niter=1000, niter_decay=0, add_face_D=False,
        refine_face=False, pose_type="both", remove_face_labels=False,
        finetune=False, checkpoints_dir="/tmp/conv_ckpt", name="ref",
        no_ganFeat_loss=False, print_G=False, print_D=False,
        which_epoch="latest", beta=0.999, debug=True, no_html=True,
        tf_log=False, use_visdom=False, display_winsize=SIZE, model_idx=0)
    # base_model.py:45 passes beta1=0 (int); modern torch requires floats
    _Adam = torch.optim.Adam

    def adam_float_betas(params, lr, betas=(0.9, 0.999), **kw):
        return _Adam(params, lr=lr,
                     betas=(float(betas[0]), float(betas[1])), **kw)
    torch.optim.Adam = adam_float_betas

    torch.manual_seed(seed)
    model = Vid2VidModel()
    model.initialize(opt, epoch=0)
    model.lossCollector.tD = 1

    # burn in spectral u/v so sigma estimates are converged before export
    with torch.no_grad():
        model.netG.train()
        model.netD.train()
        for i in range(30):
            b = batches[i % len(batches)]
            tl = torch.from_numpy(b["tgt_label"].transpose(0, 3, 1, 2))[:, None]
            ti = torch.from_numpy(b["tgt_image"].transpose(0, 3, 1, 2))[:, None]
            rl = torch.from_numpy(
                b["ref_labels"].transpose(0, 1, 4, 2, 3))
            ri = torch.from_numpy(
                b["ref_images"].transpose(0, 1, 4, 2, 3))
            model([tl, ti, [None] * 2, [None] * 2, rl, ri, None, None,
                   None], mode="discriminator")

    # our side pre-creates the temporal modules; materialize them on the
    # torch side too so one state_dict covers the import (they are unused
    # in the single-frame phase on both sides)
    model.netG.init_temporal_network()
    torch.save({"G": model.netG.state_dict(),
                "D": model.netD.state_dict()}, state_out)

    if perturb:
        # torch-vs-torch sensitivity control (--perturb): scale every weight
        # by (1 + eps) AFTER the state export — eps ~1e-7 is ~1 ULP in fp32,
        # so two torch runs differing only by this measure the reference's
        # own sensitive-dependence spread under the identical protocol.
        with torch.no_grad():
            for net in (model.netG, model.netD):
                for q in net.parameters():
                    q.mul_(1.0 + perturb)

    records = []
    for step, b in enumerate(batches):
        tl = torch.from_numpy(b["tgt_label"].transpose(0, 3, 1, 2))[:, None]
        ti = torch.from_numpy(b["tgt_image"].transpose(0, 3, 1, 2))[:, None]
        rl = torch.from_numpy(b["ref_labels"].transpose(0, 1, 4, 2, 3))
        ri = torch.from_numpy(b["ref_images"].transpose(0, 1, 4, 2, 3))
        data_list = [tl, ti, [None] * 2, [None] * 2, rl, ri,
                     None, None, None]
        d_losses = model(data_list, mode="discriminator")
        d_losses = loss_backward(opt, d_losses, model.optimizer_D, 1)
        want_img = lpips_cb is not None and lpips_every \
            and step % lpips_every == 0
        g_losses, generated, _ = model(data_list, mode="generator",
                                       save_images=bool(want_img))
        g_losses = loss_backward(opt, g_losses, model.optimizer_G, 0)
        names = model.lossCollector.loss_names
        vals = dict(zip(names, [float(v.mean()) for v in
                                list(g_losses) + list(d_losses)]))
        if want_img:
            fake = generated[0].detach().float().reshape(-1, 3, SIZE, SIZE)
            fake_np = fake.numpy().transpose(0, 2, 3, 1)
            vals["lpips"] = lpips_cb(fake_np, b["tgt_image"])
        records.append(vals)
        if step % 100 == 0:
            print(f"[torch step {step}: G_GAN {vals.get('G_GAN', 0):.4f}"
                  + (f" lpips {vals['lpips']:.4f}" if "lpips" in vals else ""),
                  flush=True)
    return records


# ----------------------------------------------------------------------
# our side
# ----------------------------------------------------------------------

def run_ours(batches, state_in, lpips_cb=None, lpips_every=0, sn2=False,
             faithful=False):
    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from fsvid2vid_tpu.config import face_config
    from fsvid2vid_tpu.training.state import build_models, init_state
    from fsvid2vid_tpu.training.step import (
        StepFlags, init_prevs, train_step, train_step_faithful)
    from fsvid2vid_tpu.utils.torch_port import (
        import_fewshot_generator, import_discriminator, import_vgg19)

    # --sn2: advance spectral u/v twice per step (cfg.sn_power_iters=2) —
    # matches the reference's effective 2-forwards-per-iteration advancement;
    # measured effect in docs/CONVERGENCE.md "Drift diagnosis".
    pose_kw = (dict(dataset_mode="fewshot_pose", input_nc=6)
               if WORKLOAD == "pose" else {})
    cfg = face_config(ngf=NGF, nff=NGF, ndf=NGF, fine_size=SIZE,
                      load_size=SIZE, n_blocks_F=2, n_downsample_G=3,
                      n_adaptive_layers=2, batch_size=BS,
                      no_vgg_loss=not USE_VGG,
                      sn_power_iters=2 if sn2 else 1,
                      compute_dtype="float32", is_train=True, **pose_kw)
    models = build_models(cfg)
    b0 = batches[0]
    sample = {k: jnp.asarray(v) for k, v in b0.items()}
    sample.update(flow_gt=[None, None], conf_gt=[None, None])
    state = init_state(cfg, models, jax.random.PRNGKey(0), sample)

    sd = torch.load(state_in, weights_only=True)
    vG = import_fewshot_generator(
        jax.device_get({"params": state.params_G["G"], **state.aux_G["G"]}),
        sd["G"], cfg)
    vD = import_discriminator(
        jax.device_get({"params": state.params_D["D"], **state.aux_D["D"]}),
        sd["D"])
    state = state.replace(
        params_G=dict(state.params_G, G=vG["params"]),
        aux_G=dict(state.aux_G,
                   G={k: v for k, v in vG.items() if k != "params"}),
        params_D=dict(state.params_D, D=vD["params"]),
        aux_D=dict(state.aux_D,
                   D={k: v for k, v in vD.items() if k != "params"}))
    if USE_VGG:
        state = state.replace(vgg_params=jax.tree.map(
            jnp.asarray,
            import_vgg19(jax.device_get(state.vgg_params), VGG_PATH)))

    flags = StepFlags(warp_prev=False, has_prev=False)
    prevs = init_prevs(cfg, sample)
    # --faithful: exact reference alternation (two generator forwards per
    # iteration, per-phase spectral advancement) — the convergence-parity
    # mode, docs/CONVERGENCE.md
    step_fn = train_step_faithful if faithful else train_step
    records = []
    for step, b in enumerate(batches):
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        batch.update(flow_gt=[None, None], conf_gt=[None, None])
        state, prevs, losses, vis = step_fn(cfg, models, state, batch,
                                            prevs, flags,
                                            jax.random.PRNGKey(0))
        vals = {k: float(v) for k, v in losses.items()}
        if lpips_cb is not None and lpips_every and step % lpips_every == 0:
            vals["lpips"] = lpips_cb(np.asarray(vis["fake_image"]),
                                     b["tgt_image"])
        records.append(vals)
        if step % 100 == 0:
            print(f"[ours step {step}: G_GAN {vals.get('G_GAN', 0):.4f}"
                  + (f" lpips {vals['lpips']:.4f}" if "lpips" in vals else ""),
                  flush=True)
    return records


def ema(xs, a=0.05):
    out, m = [], xs[0]
    for x in xs:
        m = (1 - a) * m + a * x
        out.append(m)
    return out


def main():
    # argv parsed here (NOT at module scope) so pytest can import this module
    # with arbitrary command-line arguments present (VERDICT r2 weak #1).
    global SIZE, NGF, USE_VGG, WORKLOAD
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("steps", nargs="?", type=int, default=300)
    p.add_argument("out", nargs="?", default="convergence.json")
    p.add_argument("--ngf", type=int, default=NGF)
    p.add_argument("--size", type=int, default=SIZE)
    p.add_argument("--vgg", action="store_true")
    p.add_argument("--lpips-every", type=int, default=0)
    p.add_argument("--sn2", action="store_true",
                   help="ours-side: 2 spectral power iterations per step "
                        "(matches the reference's 2-forwards-per-iteration "
                        "u/v advancement)")
    p.add_argument("--faithful", action="store_true",
                   help="ours-side: train_step_faithful — the exact "
                        "reference alternation (two generator forwards, "
                        "per-phase u/v advancement); convergence-parity mode")
    p.add_argument("--workload", choices=["face", "pose"], default="face",
                   help="pose: 6-channel IUV+keypoint synthetic inputs with "
                        "the fewshot_pose torch config (aux face D off on "
                        "both sides)")
    p.add_argument("--reuse-torch", default="",
                   help="a previous identical run's OUT.json (or its "
                        ".torch.jsonl twin): skip the torch stack and reuse "
                        "its records + its exported OUT.json.init.pt init")
    p.add_argument("--torch-only", action="store_true",
                   help="run ONLY the torch reference side and write "
                        "OUT.torch.jsonl — used for torch-vs-torch variance "
                        "controls (docs/CONVERGENCE.md round 5)")
    p.add_argument("--torch-seed", type=int, default=0,
                   help="torch.manual_seed for network init (data batches "
                        "stay identical); !=0 gives a different-init control")
    p.add_argument("--perturb", type=float, default=0.0,
                   help="torch-side: scale all weights by (1+eps) after "
                        "init/burn-in — ~1e-7 is a 1-ULP fp32 perturbation "
                        "control isolating sensitive dependence")
    a = p.parse_args()
    SIZE, NGF, USE_VGG, WORKLOAD = a.size, a.ngf, a.vgg, a.workload

    lpips_cb = None
    if a.lpips_every:
        # ONE deterministic (uncalibrated) LPIPS net shared by both stacks
        import jax
        jax.config.update("jax_platforms", "cpu")
        from fsvid2vid_tpu.eval.metrics import make_lpips
        model_lpips = make_lpips()

        def lpips_cb(fake_np, tgt_np):  # noqa: F811
            d = model_lpips(np.asarray(fake_np, np.float32),
                            np.asarray(tgt_np, np.float32))
            return float(np.mean(np.asarray(d)))

    if USE_VGG:
        sys.path.insert(0, "/root/repo/tests")
        from reference_loader import save_random_vgg19
        save_random_vgg19(VGG_PATH, seed=0)
        print(f"[vgg19 (seeded random) -> {VGG_PATH}]", flush=True)

    batches = make_batches(a.steps)
    print(f"[data: {len(batches)} steps of bs{BS} {SIZE}px ngf{NGF} "
          f"vgg={USE_VGG} sn2={a.sn2} faithful={a.faithful}]", flush=True)
    # run-specific state path: a fixed /tmp name lets a concurrent run
    # clobber the exported init between the torch and ours halves
    state_pt = a.out + ".init.pt"
    meta = {"meta": {"lpips_calibrated": False,
                     "note": "LPIPS from a seeded-random feature net — "
                             "self-consistent across the two stacks, not "
                             "comparable to published numbers"}}
    if a.reuse_torch:
        with open(a.reuse_torch) as f:
            t_rec = [json.loads(line)["torch"] for line in f
                     if "\"torch\"" in line]
        assert len(t_rec) >= a.steps, "cached torch run too short"
        t_rec = t_rec[:a.steps]
        # the init is exported as OUT.json.init.pt while the cached records
        # live in OUT.json.torch.jsonl — accept either name and derive the
        # init from the run stem (a stale init from an unrelated run would
        # silently break the parity comparison, so missing => hard error)
        stem = a.reuse_torch
        if stem.endswith(".torch.jsonl"):
            stem = stem[:-len(".torch.jsonl")]
        state_pt = stem + ".init.pt"
        if not os.path.exists(state_pt):
            sys.exit(f"--reuse-torch: cached init {state_pt} not found; "
                     "rerun the torch side (refusing to fall back to an "
                     "unrelated init)")
        print(f"[torch records reused from {a.reuse_torch}]", flush=True)
    else:
        t_rec = run_torch(batches, state_pt, lpips_cb, a.lpips_every,
                          seed=a.torch_seed, perturb=a.perturb)
        # persist the torch half immediately: the ours half can crash
        with open(a.out + ".torch.jsonl", "w") as f:
            if a.lpips_every:
                f.write(json.dumps(meta) + "\n")
            for i, t in enumerate(t_rec):
                f.write(json.dumps({"step": i, "torch": t}) + "\n")
        print("[torch reference done]", flush=True)
    if a.torch_only:
        t_l = [r["lpips"] for r in t_rec if "lpips" in r]
        for k in LOSS_KEYS + (["G_VGG"] if USE_VGG else []):
            print(f"{k:12s} EMA@{a.steps}: {ema([r[k] for r in t_rec])[-1]:.4f}")
        if t_l:
            print("LPIPS curve (torch):", " ".join(f"{v:.4f}" for v in t_l))
        print(f"[torch-only done -> {a.out}.torch.jsonl]", flush=True)
        return
    j_rec = run_ours(batches, state_pt, lpips_cb,
                     a.lpips_every, sn2=a.sn2, faithful=a.faithful)
    print("[ours done]", flush=True)

    with open(a.out, "w") as f:
        if a.lpips_every:
            f.write(json.dumps(meta) + "\n")
        for i, (t, j) in enumerate(zip(t_rec, j_rec)):
            f.write(json.dumps({"step": i, "torch": t, "ours": j}) + "\n")

    print(f"{'loss':12s} {'step1 torch':>12s} {'step1 ours':>12s} "
          f"{'emaN torch':>12s} {'emaN ours':>12s}")
    ok = True
    keys = LOSS_KEYS + (["G_VGG"] if USE_VGG else [])
    for k in keys:
        ts = [r[k] for r in t_rec]
        js = [r[k] for r in j_rec]
        e_t, e_j = ema(ts)[-1], ema(js)[-1]
        print(f"{k:12s} {ts[0]:12.4f} {js[0]:12.4f} {e_t:12.4f} {e_j:12.4f}")
        if abs(ts[0] - js[0]) > 0.02 * max(1.0, abs(ts[0])):
            ok = False
            print(f"  !! step-1 mismatch on {k}")
    if a.lpips_every:
        t_l = [r["lpips"] for r in t_rec if "lpips" in r]
        j_l = [r["lpips"] for r in j_rec if "lpips" in r]
        print("LPIPS curve (torch):", " ".join(f"{v:.4f}" for v in t_l))
        print("LPIPS curve (ours): ", " ".join(f"{v:.4f}" for v in j_l))
        if t_l and j_l:
            print(f"LPIPS final: torch {t_l[-1]:.4f} ours {j_l[-1]:.4f}")
    # hinge-GAN operating band: D losses stay bounded away from 0 and 2
    d_band = ema([r["D_real"] + r["D_fake"] for r in j_rec])[-1]
    print(f"D_real+D_fake EMA (ours): {d_band:.3f}")
    print("CONVERGENCE", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
