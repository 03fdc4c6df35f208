"""Round-4 end-to-end demo (artifacts re-recorded each round): train -> test -> eval -> HTML, all in-framework.

Synthesizes a structured face-style dataset (smooth keypoint tracks; images
are a deterministic render of the keypoints, so label->image is learnable),
trains face-256 for a few hundred steps through the REAL CLI (train.py), runs
inference on a held-out clip through test.py (writes the HTML gallery), and
scores the synthesized frames against ground truth with eval.py metrics
(deterministic seeded LPIPS/VGG nets — ImageNet checkpoints are not
downloadable in this environment, see eval/metrics.py).

This is the reference's full user workflow (train.py -> test.py ->
util/visualizer.py pages) executed end-to-end in this framework on real
hardware.  Artifacts -> demo_r5/ (metrics JSON + loss log + a sample frame).

Usage: python scripts/demo_train_eval.py [WORKDIR] [STEPS_PER_EPOCH] [EPOCHS]
"""
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/demo_r5"
SPE = int(sys.argv[2]) if len(sys.argv) > 2 else 50
EPOCHS = int(sys.argv[3]) if len(sys.argv) > 3 else 6
SIZE = 256
ENV = dict(os.environ, PYTHONPATH=f"{REPO}:/root/.axon_site")


def render_frame(pts, size):
    """Deterministic keypoints->image render: colored gaussian blobs on a
    smooth gradient; the learnable mapping the GAN must pick up."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack([0.3 * xx, 0.2 * yy, 0.25 * (xx + yy)], -1)
    for i, p in enumerate(pts):
        d2 = ((yy * size - p[1]) ** 2 + (xx * size - p[0]) ** 2)
        g = np.exp(-d2 / (2 * (3.0 + (i % 5)) ** 2))
        col = np.array([(i * 37 % 97) / 97, (i * 61 % 89) / 89,
                        (i * 17 % 83) / 83], np.float32)
        img += g[..., None] * col * 0.8
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def synth_dataset(root, n_train_seq=4, n_test_seq=1, n_frames=30):
    rng = np.random.RandomState(0)
    t17 = np.linspace(0, np.pi, 17)
    for phase, n_seq in [("train", n_train_seq), ("test", n_test_seq)]:
        for s in range(n_seq):
            seq = f"{s + 1:04d}"
            kdir = os.path.join(root, f"{phase}_keypoints", seq)
            idir = os.path.join(root, f"{phase}_images", seq)
            os.makedirs(kdir, exist_ok=True)
            os.makedirs(idir, exist_ok=True)
            r = np.random.RandomState(100 * (phase == "test") + s)
            base = r.rand(51, 2) * SIZE * 0.4 + SIZE * 0.3
            vel = (r.rand(51, 2) - 0.5) * 2.0
            cx, cy = r.uniform(0.35, 0.65, 2) * SIZE
            for f in range(n_frames):
                kp = np.zeros((68, 2))
                ang = 0.05 * f
                kp[:17, 0] = cx + SIZE * 0.3 * np.cos(t17 + ang)
                kp[:17, 1] = cy + SIZE * 0.35 * np.sin(t17 + ang)
                kp[17:] = np.clip(
                    base + vel * f + 2 * np.sin(0.2 * f + np.arange(51))[:, None],
                    2, SIZE - 3)
                np.savetxt(os.path.join(kdir, f"{f:05d}.txt"), kp,
                           delimiter=",")
                Image.fromarray(render_frame(kp, SIZE)).save(
                    os.path.join(idir, f"{f:05d}.jpg"), quality=95)
    _ = rng


def run(tag, argv, timeout):
    print(f"=== {tag}: {' '.join(argv[:6])} ... ===", flush=True)
    t0 = time.time()
    r = subprocess.run([sys.executable] + argv, env=ENV, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"{tag} failed rc={r.returncode}")
    print(f"[{tag}: {time.time() - t0:.0f}s]", flush=True)
    return r.stdout


def main():
    os.makedirs(WORK, exist_ok=True)
    data = os.path.join(WORK, "data")
    ckpt = os.path.join(WORK, "ckpt")
    results = os.path.join(WORK, "results")
    if not os.path.isdir(os.path.join(data, "train_keypoints")):
        synth_dataset(data)
        print(f"[dataset -> {data}]", flush=True)

    common = ["--name", "demo", "--dataset_mode", "fewshot_face",
              "--dataroot", data, "--checkpoints_dir", ckpt,
              "--batchSize", "4", "--fineSize", str(SIZE),
              "--loadSize", str(SIZE)]
    run("train", ["train.py"] + common + [
        "--niter", str(EPOCHS), "--niter_decay", "0",
        "--niter_single", str(max(1, EPOCHS - 2)), "--niter_step", "1",
        "--steps_per_epoch", str(SPE), "--no_flow_gt",
        "--num_workers", "2", "--save_epoch_freq", "2",
        "--display_freq", "0", "--print_freq", str(SPE)],
        timeout=5400)

    run("test", ["test.py"] + common + [
        "--results_dir", results, "--how_many", "24"], timeout=2400)

    # locate synthesized + real frames for the held-out clip
    fake_dir = None
    for dirpath, _, files in os.walk(results):
        if any(f.endswith((".jpg", ".png")) and "synthesized" in f
               for f in files):
            fake_dir = dirpath
            break
    assert fake_dir, f"no synthesized images under {results}"
    real_dir = os.path.join(data, "test_images", "0001")

    # eval.py compares directory listings pairwise; stage matched real frames
    fake_stage = os.path.join(WORK, "eval_fake")
    real_stage = os.path.join(WORK, "eval_real")
    for d in (fake_stage, real_stage):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    fakes = sorted(f for f in os.listdir(fake_dir) if "synthesized" in f)
    reals = sorted(os.listdir(real_dir))
    for i, f in enumerate(fakes):
        shutil.copy(os.path.join(fake_dir, f), os.path.join(fake_stage, f))
        shutil.copy(os.path.join(real_dir, reals[min(i, len(reals) - 1)]),
                    os.path.join(real_stage, f))
    out = run("eval", ["eval.py", "--real_dir", real_stage,
                       "--fake_dir", fake_stage], timeout=1800)
    metrics = json.loads(
        [l for l in out.splitlines() if l.strip().startswith("{")][-1])

    os.makedirs(os.path.join(REPO, "demo_r5"), exist_ok=True)
    with open(os.path.join(REPO, "demo_r5", "metrics.json"), "w") as f:
        json.dump(dict(metrics=metrics, steps=SPE * EPOCHS,
                       config="face-256 bs4", workdir=WORK), f, indent=2)
    loss_log = os.path.join(ckpt, "demo", "loss_log.txt")
    if os.path.exists(loss_log):
        shutil.copy(loss_log, os.path.join(REPO, "demo_r5", "loss_log.txt"))
    if fakes:
        shutil.copy(os.path.join(fake_stage, fakes[-1]),
                    os.path.join(REPO, "demo_r5", "sample_synthesized.jpg"))
        shutil.copy(os.path.join(real_stage, fakes[-1]),
                    os.path.join(REPO, "demo_r5", "sample_real.jpg"))
    print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
