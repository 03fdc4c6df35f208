#!/usr/bin/env python
"""Quality-metric harness: LPIPS / FID / PSNR / SSIM between two frame sets.

The reference repo has no eval code; BASELINE.json's quality metric is
"LPIPS/FID parity vs PyTorch reference", tracked with this harness
(fsvid2vid_tpu/eval/metrics.py).  Typical use, after `test.py` writes
synthesized frames:

  python eval.py --fake_dir results/face/seq/images --real_dir datasets/face/test_images/seq \
      --vgg16_ckpt vgg16.pth --lpips_ckpt lpips_vgg.pth

Frames are matched by sorted filename order.  Without the two checkpoints the
LPIPS backbone is a seeded random projection and FID uses the same space —
self-consistent for convergence tracking, not comparable to published numbers
(flagged `calibrated: false` in the output).

Prints ONE JSON line with lpips/fid/psnr/ssim (+ per-metric metadata).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def list_images(d: str):
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
    fs = sorted(f for f in os.listdir(d) if f.lower().endswith(exts))
    if not fs:
        raise SystemExit(f"no images in {d}")
    return [os.path.join(d, f) for f in fs]


def load_batch(paths, size=None):
    import numpy as np
    from PIL import Image
    imgs = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        if size is not None:
            im = im.resize((size[1], size[0]), Image.BICUBIC)
        imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    return np.stack(imgs)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--real_dir", required=True)
    ap.add_argument("--fake_dir", required=True)
    ap.add_argument("--vgg16_ckpt", default="")
    ap.add_argument("--lpips_ckpt", default="")
    ap.add_argument("--metrics_dir", default="checkpoints/metrics",
                    help="auto-discovery directory: vgg16.pth / lpips_vgg.pth"
                         " / inception_v3.pth found here are used when the "
                         "explicit --*_ckpt flags are not given")
    ap.add_argument("--inception_ckpt", default="",
                    help="torchvision-layout inception_v3 state_dict; when "
                         "given, FID uses standard InceptionV3 pool3 features")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--how_many", type=int, default=0,
                    help="cap on frame pairs (0 = all)")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from fsvid2vid_tpu.eval import metrics as M

    real_paths = list_images(args.real_dir)
    fake_paths = list_images(args.fake_dir)
    n = min(len(real_paths), len(fake_paths))
    if len(real_paths) != len(fake_paths):
        print(f"warning: {len(real_paths)} real vs {len(fake_paths)} fake "
              f"frames; evaluating first {n} of each", file=sys.stderr)
    if args.how_many:
        n = min(n, args.how_many)
    real_paths, fake_paths = real_paths[:n], fake_paths[:n]

    # fake frames define the eval resolution; reals are resized to match
    probe = load_batch(fake_paths[:1])
    size = probe.shape[1:3]

    # auto-activating calibration: real feature-net checkpoints dropped into
    # --metrics_dir are picked up without flags (the reference's perceptual
    # stack downloads torchvision ImageNet VGG19 implicitly,
    # /root/reference/models/networks/vgg.py:48 — this is the offline twin)
    def discover(flag_val, fname):
        if flag_val:
            return flag_val
        p = os.path.join(args.metrics_dir, fname)
        if os.path.exists(p):
            print(f"[eval] using discovered checkpoint {p}", file=sys.stderr)
            return p
        return ""
    args.vgg16_ckpt = discover(args.vgg16_ckpt, "vgg16.pth")
    args.lpips_ckpt = discover(args.lpips_ckpt, "lpips_vgg.pth")
    args.inception_ckpt = discover(args.inception_ckpt, "inception_v3.pth")

    lpips_model = M.make_lpips(args.vgg16_ckpt or None,
                               args.lpips_ckpt or None)
    if args.inception_ckpt:
        from fsvid2vid_tpu.eval.inception import make_inception_extractor
        extractor = make_inception_extractor(args.inception_ckpt)
        fid_space = "inception-v3-pool3"
    else:
        extractor = M.make_vgg_fid_extractor(lpips_model)
        fid_space = ("vgg16-relu4_3" +
                     ("" if lpips_model.calibrated else "-random"))
    import jax
    lpips_fn = jax.jit(lpips_model.__call__)
    psnr_fn = jax.jit(M.psnr)
    ssim_fn = jax.jit(M.ssim)

    lp, ps, ss = [], [], []
    feats_r, feats_f = [], []
    for i in range(0, n, args.batch):
        rb = jnp.asarray(load_batch(real_paths[i:i + args.batch], size))
        fb = jnp.asarray(load_batch(fake_paths[i:i + args.batch], size))
        lp.append(np.asarray(lpips_fn(rb, fb)))
        ps.append(np.asarray(psnr_fn(rb, fb)))
        ss.append(np.asarray(ssim_fn(rb, fb)))
        feats_r.append(np.asarray(extractor(rb)))
        feats_f.append(np.asarray(extractor(fb)))
    lp, ps, ss = (np.concatenate(v) for v in (lp, ps, ss))
    fid = M.fid_from_features(np.concatenate(feats_r),
                              np.concatenate(feats_f))

    calibrated = lpips_model.calibrated and bool(args.inception_ckpt)
    if not calibrated:
        print("[eval] WARNING: UNCALIBRATED metrics — LPIPS/FID use "
              "seeded-random feature nets (no pretrained checkpoints found); "
              "values are self-consistent for tracking but NOT comparable to "
              "published numbers. Drop vgg16.pth/lpips_vgg.pth/"
              f"inception_v3.pth into {args.metrics_dir}/ to calibrate.",
              file=sys.stderr)
    print(json.dumps({
        "n_frames": int(n),
        "calibrated": calibrated,
        "lpips": float(lp.mean()),
        "lpips_calibrated": lpips_model.calibrated,
        "fid": fid,
        "fid_feature_space": fid_space,
        "psnr_db": float(ps.mean()),
        "ssim": float(ss.mean()),
    }))


if __name__ == "__main__":
    main()
