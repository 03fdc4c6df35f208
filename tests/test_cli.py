"""CLI smoke tests: run train.py then test.py as the user would (subprocess,
tiny config, CPU-forced) against a synthetic face dataset."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image


pytestmark = pytest.mark.slow  # >60s on one CPU (see pytest.ini)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.RandomState(0)
    for seq in ["0001", "0002"]:
        for sub in ["train_keypoints", "train_images", "test_images",
                    "test_keypoints"]:
            (root / "data" / sub / seq).mkdir(parents=True, exist_ok=True)
        for f in range(8):
            t = np.linspace(0, np.pi, 17)
            kp = np.zeros((68, 2))
            kp[:17, 0] = 60 + 40 * np.cos(t)
            kp[:17, 1] = 55 + 45 * np.sin(t)
            kp[17:] = rng.uniform(40, 80, (51, 2))
            for sub in ["train_keypoints", "test_keypoints"]:
                np.savetxt(root / "data" / sub / seq / f"{f:05d}.txt", kp,
                           delimiter=",")
            arr = rng.randint(0, 255, (128, 128, 3), np.uint8)
            for sub in ["train_images", "test_images"]:
                Image.fromarray(arr).save(root / "data" / sub / seq / f"{f:05d}.jpg")
    return root


def run_cli(script, argv, timeout=560):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.argv = {argv!r}\n"
        f"import {script}; {script}.main()\n")
    return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


TINY = ["--ngf", "4", "--ndf", "4", "--fineSize", "32", "--loadSize", "32",
        "--n_downsample_G", "3", "--n_adaptive_layers", "2", "--no_vgg_loss"]


class TestCLI:
    def test_train_then_test(self, cli_root):
        ckpt = str(cli_root / "ckpt")
        train_argv = (["train.py", "--name", "smoke", "--dataset_mode",
                       "fewshot_face", "--adaptive_spade", "--warp_ref",
                       "--spade_combine", "--dataroot", str(cli_root / "data"),
                       "--checkpoints_dir", ckpt, "--batchSize", "2",
                       "--niter", "1", "--niter_decay", "0",
                       "--niter_single", "1", "--no_flow_gt",
                       "--steps_per_epoch", "2", "--num_workers", "0"] + TINY)
        r = run_cli("train", train_argv)
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.exists(os.path.join(ckpt, "smoke", "latest"))
        assert os.path.exists(os.path.join(ckpt, "smoke", "loss_log.txt"))

        test_argv = (["test.py", "--name", "smoke", "--dataset_mode",
                      "fewshot_face", "--adaptive_spade", "--warp_ref",
                      "--spade_combine", "--dataroot", str(cli_root / "data"),
                      "--checkpoints_dir", ckpt,
                      "--results_dir", str(cli_root / "results"),
                      "--seq_path", str(cli_root / "data/test_images/0001/"),
                      "--ref_img_path", str(cli_root / "data/test_images/0002/"),
                      "--how_many", "2"] + TINY)
        r = run_cli("test", test_argv)
        assert r.returncode == 0, r.stderr[-3000:]
        out_dir = str(cli_root / "results" / "smoke")
        seqs = os.listdir(out_dir)
        assert seqs
        index = os.path.join(out_dir, seqs[0], "index.html")
        assert os.path.exists(index)
        imgs = os.listdir(os.path.join(out_dir, seqs[0], "images"))
        assert any("synthesized" in i for i in imgs)
