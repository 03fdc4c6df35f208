#!/usr/bin/env python
"""Host tooling: build the pose-dataset annotations from raw videos by
driving the external OpenPose / DensePose binaries, then run the in-repo
downstream pipeline (validity pruning, person tracking, subsequence
extraction -> all_subsequences.json).

TPU-native counterpart of reference data/preprocess/util/get_poses.py:21-66 +
preprocess.py:72-131.  The neural annotators are external native binaries in
the reference too (OpenPose C++/CUDA, DensePose/detectron); this driver keeps
them external — it shells out when the install roots are supplied and
verifies per-frame outputs — while everything downstream of the annotations
(check_valid/track/divide_sequences) runs via fsvid2vid_tpu.data.preprocess,
which is pure-python and covered by tests/test_aux.py.

Usage:
  python scripts/preprocess/get_poses.py --videos raw/*.mp4 \
      --output_root datasets/pose/ \
      --openpose_root /opt/openpose [--densepose_root /opt/densepose] \
      [--n_skip_frames 15] [--fps_extract ffmpeg|pil]

Without --openpose_root the driver stops after frame extraction and prints
the exact commands to run manually (air-gapped hosts).
"""
import argparse
import glob
import json
import os
import subprocess
import sys
from os import path

sys.path.insert(0, path.join(path.dirname(__file__), "..", ".."))


def extract_frames(video_path: str, img_dir: str, every: int = 1) -> int:
    """Video -> frame%06d.jpg via ffmpeg (the portable stand-in for the
    reference's cv2.VideoCapture loop, get_poses.py:72-82)."""
    os.makedirs(img_dir, exist_ok=True)
    if glob.glob(path.join(img_dir, "*.jpg")):
        return len(glob.glob(path.join(img_dir, "*.jpg")))
    vf = f"select=not(mod(n\\,{every}))" if every > 1 else "copy"
    cmd = ["ffmpeg", "-loglevel", "error", "-i", video_path]
    if every > 1:
        cmd += ["-vf", vf, "-vsync", "vfr"]
    cmd += [path.join(img_dir, "frame%06d.jpg")]
    subprocess.run(cmd, check=True)
    return len(glob.glob(path.join(img_dir, "*.jpg")))


def openpose_cmd(openpose_root: str, img_dir: str, op_dir: str) -> list:
    """The reference's OpenPose invocation (get_poses.py:127-143): BODY_25 +
    face + hand JSON per frame."""
    return [path.join(openpose_root, "build/examples/openpose/openpose.bin"),
            "--image_dir", img_dir, "--write_json", op_dir,
            "--display", "0", "--render_pose", "0", "--face", "--hand"]


def densepose_cmd(densepose_root: str, img_dir: str, dp_dir: str) -> list:
    """The reference's DensePose invocation (get_poses.py:146-159): IUV png
    per frame via detectron infer_simple."""
    return ["python", path.join(densepose_root, "tools/infer_simple.py"),
            "--cfg", path.join(densepose_root,
                               "configs/DensePose_ResNet101_FPN_s1x-e2e.yaml"),
            "--output-dir", dp_dir, "--image-ext", "jpg",
            "--wts", "https://dl.fbaipublicfiles.com/densepose/"
                     "DensePose_ResNet101_FPN_s1x-e2e.pkl", img_dir]


def run_or_print(cmd: list, dry: bool, what: str) -> bool:
    if dry:
        print(f"[manual step] {what}:\n  {' '.join(cmd)}")
        return False
    print(f"[{what}] {' '.join(cmd[:3])} ...")
    res = subprocess.run(cmd)
    if res.returncode != 0:
        print(f"WARNING: {what} exited {res.returncode}")
    return res.returncode == 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--videos", nargs="+", required=True)
    ap.add_argument("--output_root", type=str, required=True)
    ap.add_argument("--img_folder", type=str, default="train_images")
    ap.add_argument("--openpose_folder", type=str, default="train_openpose")
    ap.add_argument("--densepose_folder", type=str, default="train_densepose")
    ap.add_argument("--openpose_root", type=str, default="")
    ap.add_argument("--densepose_root", type=str, default="")
    ap.add_argument("--n_skip_frames", type=int, default=1,
                    help="keyframe stride during extraction (get_poses.py:78)")
    ap.add_argument("--min_n_of_frames", type=int, default=30,
                    help="minimum usable subsequence length (track.py)")
    args = ap.parse_args()

    from fsvid2vid_tpu.data.preprocess import preprocess_dataset

    for video in args.videos:
        vid = path.basename(video).split(".")[0]
        img_dir = path.join(args.output_root, args.img_folder, vid)
        op_dir = path.join(args.output_root, args.openpose_folder, vid)
        dp_dir = path.join(args.output_root, args.densepose_folder, vid)
        n = extract_frames(video, img_dir, args.n_skip_frames)
        print(f"[{vid}] {n} frames")

        os.makedirs(op_dir, exist_ok=True)
        have_op = len(glob.glob(path.join(op_dir, "*.json"))) >= n
        if not have_op:
            have_op = run_or_print(
                openpose_cmd(args.openpose_root or "<OPENPOSE_ROOT>",
                             img_dir, op_dir),
                dry=not args.openpose_root, what=f"openpose {vid}")
        if args.densepose_root or args.densepose_folder:
            os.makedirs(dp_dir, exist_ok=True)
            have_dp = len(glob.glob(path.join(dp_dir, "*.png"))) >= n
            if not have_dp:
                run_or_print(
                    densepose_cmd(args.densepose_root or "<DENSEPOSE_ROOT>",
                                  img_dir, dp_dir),
                    dry=not args.densepose_root, what=f"densepose {vid}")
        if not have_op:
            print(f"[{vid}] annotations incomplete; downstream pruning "
                  f"skipped (re-run once OpenPose output exists)")
            continue

        # downstream: validity pruning + tracking + subsequence extraction
        # (fsvid2vid_tpu/data/preprocess.py, parity-tested)
        subs = preprocess_dataset(args.output_root,
                                  openpose_folder=args.openpose_folder,
                                  min_n_of_frames=args.min_n_of_frames)
        print(f"[{vid}] wrote "
              f"{path.join(args.output_root, 'all_subsequences.json')} "
              f"({len(subs['seq_indices'])} subsequences)")


if __name__ == "__main__":
    main()
