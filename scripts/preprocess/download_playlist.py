#!/usr/bin/env python
"""Host tooling: download the YouTube-dancing playlists that seed the pose
dataset (reference data/preprocess/download_youTube_playlist.py:1-35).

The reference uses the long-dead `pytube` Playlist API; this skeleton drives
yt-dlp (the maintained successor) when installed, and otherwise prints the
exact commands.  Filenames keep the reference's `%03d_%03d_` prefix scheme
(playlist index, video index) that the downstream preprocess expects.

Usage:
  python scripts/preprocess/download_playlist.py \
      --playlist_file youTube_playlist.txt --out raw_videos/
`playlist_file` holds one playlist URL per line (same format as the
reference's youTube_playlist.txt).
"""
import argparse
import shutil
import subprocess


def yt_dlp_cmd(url: str, out_dir: str, playlist_idx: int) -> list:
    return ["yt-dlp", "--format", "mp4", "--output",
            f"{out_dir}/{playlist_idx + 1:03d}_%(playlist_index)03d_"
            f"%(title)s.%(ext)s", url]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--playlist_file", type=str, required=True)
    ap.add_argument("--out", type=str, default="raw_videos")
    args = ap.parse_args()

    with open(args.playlist_file) as f:
        playlists = [ln.strip() for ln in f if ln.strip()]

    have_ytdlp = shutil.which("yt-dlp") is not None
    for i, url in enumerate(playlists):
        cmd = yt_dlp_cmd(url, args.out, i)
        if have_ytdlp:
            print(f"[playlist {i + 1}/{len(playlists)}] {url}")
            subprocess.run(cmd)
        else:
            print(f"[manual step] yt-dlp not installed; run:\n  "
                  + " ".join(cmd))


if __name__ == "__main__":
    main()
