"""Eval-harness tests: PSNR/SSIM against torch-free analytic expectations,
LPIPS structure/calibration import, FID against closed-form Gaussians, and the
eval.py CLI end-to-end on synthetic frames."""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fsvid2vid_tpu.eval import metrics as M


class TestPixelMetrics:
    def test_psnr_identity(self, rng):
        a = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
        assert float(M.psnr(a, a).min()) > 100

    def test_psnr_known_mse(self):
        a = jnp.zeros((1, 16, 16, 3))
        b = jnp.full((1, 16, 16, 3), 0.2)
        # mse = 0.04, range 2 -> 10*log10(4/0.04) = 20 dB
        np.testing.assert_allclose(float(M.psnr(a, b)[0]), 20.0, atol=1e-4)

    def test_ssim_identity_and_degradation(self, rng):
        a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        assert float(M.ssim(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
        noisy = a + 0.5 * jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        s = float(M.ssim(a, noisy)[0])
        assert 0.0 < s < 0.9

    def test_ssim_matches_reference_formula(self, rng):
        """Cross-check against a direct numpy implementation on one window."""
        a = rng.rand(1, 11, 11, 1).astype(np.float32)
        b = (a + 0.1 * rng.randn(1, 11, 11, 1)).astype(np.float32)
        win = M._gaussian_kernel()
        mu_a = (a[0, :, :, 0] * win).sum()
        mu_b = (b[0, :, :, 0] * win).sum()
        s_aa = (a[0, :, :, 0] ** 2 * win).sum() - mu_a ** 2
        s_bb = (b[0, :, :, 0] ** 2 * win).sum() - mu_b ** 2
        s_ab = (a[0, :, :, 0] * b[0, :, :, 0] * win).sum() - mu_a * mu_b
        c1, c2 = (0.01 * 2) ** 2, (0.03 * 2) ** 2
        expect = ((2 * mu_a * mu_b + c1) * (2 * s_ab + c2) /
                  ((mu_a ** 2 + mu_b ** 2 + c1) * (s_aa + s_bb + c2)))
        got = float(M.ssim(jnp.asarray(a), jnp.asarray(b))[0])
        np.testing.assert_allclose(got, expect, rtol=1e-4)


class TestLpips:
    def test_zero_on_identical_symmetric(self, rng):
        m = M.make_lpips()
        a = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
        b = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
        assert not m.calibrated
        np.testing.assert_allclose(np.asarray(m(a, a)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m(a, b)), np.asarray(m(b, a)),
                                   rtol=1e-5)
        assert float(m(a, b).min()) > 0

    def test_monotone_in_perturbation(self, rng):
        m = M.make_lpips()
        a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        noise = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        d_small = float(m(a, a + 0.05 * noise)[0])
        d_big = float(m(a, a + 0.5 * noise)[0])
        assert d_small < d_big

    def test_lin_import(self, tmp_path):
        """Official lpips vgg.pth layout: linK.model.1.weight (1, C, 1, 1)."""
        sd = {f"lin{k}.model.1.weight":
              torch.rand(1, c, 1, 1) for k, c in enumerate(M.LPIPS_CHANNELS)}
        p = str(tmp_path / "lpips_vgg.pth")
        torch.save(sd, p)
        lins = M.import_lpips_lin(p)
        for w, c, k in zip(lins, M.LPIPS_CHANNELS, range(5)):
            assert w.shape == (c,)
            np.testing.assert_allclose(
                w, sd[f"lin{k}.model.1.weight"].numpy().reshape(-1))

    def test_vgg16_backbone_import(self, tmp_path):
        """torchvision vgg16 features state_dict maps onto Vgg16Features."""
        convs = [(i, l[1]) for i, l in enumerate(M.VGG16_LAYERS)
                 if isinstance(l, tuple)]
        sd = {}
        cin = 3
        for idx, cout in convs:
            sd[f"features.{idx}.weight"] = torch.randn(cout, cin, 3, 3)
            sd[f"features.{idx}.bias"] = torch.randn(cout)
            cin = cout
        p = str(tmp_path / "vgg16.pth")
        torch.save(sd, p)
        m = M.make_lpips(vgg16_ckpt=p)
        k0 = np.asarray(m.backbone_params["conv_0"]["kernel"])
        np.testing.assert_allclose(
            k0, sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))


class TestFid:
    def test_zero_for_identical(self, rng):
        x = rng.randn(500, 8).astype(np.float64)
        assert M.fid_from_features(x, x.copy()) == pytest.approx(0.0, abs=1e-6)

    def test_closed_form_gaussians(self):
        """FID of N(0, I) vs N(m, s^2 I) in D dims:
        ||m||^2 + D*(1 + s^2 - 2s)."""
        rng = np.random.RandomState(0)
        d = 4
        n = 200_000
        s, mshift = 2.0, 1.5
        x = rng.randn(n, d)
        y = rng.randn(n, d) * s + mshift
        expect = d * mshift ** 2 + d * (1 + s ** 2 - 2 * s)
        got = M.fid_from_features(x, y)
        np.testing.assert_allclose(got, expect, rtol=0.02)

    def test_nonnegative_and_symmetric(self, rng):
        x = rng.randn(300, 6)
        y = rng.randn(300, 6) + 0.3
        a = M.fid_from_features(x, y)
        b = M.fid_from_features(y, x)
        assert a > 0
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestEvalCli:
    @pytest.mark.slow
    def test_end_to_end(self, tmp_path, rng):
        from PIL import Image
        real = tmp_path / "real"
        fake = tmp_path / "fake"
        real.mkdir()
        fake.mkdir()
        for t in range(6):
            base = rng.randint(0, 255, (64, 64, 3), np.uint8)
            Image.fromarray(base).save(real / f"{t:03d}.png")
            noisy = np.clip(base + rng.randint(-20, 20, base.shape), 0,
                            255).astype(np.uint8)
            Image.fromarray(noisy).save(fake / f"{t:03d}.png")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                          "eval.py"),
             "--real_dir", str(real), "--fake_dir", str(fake), "--batch", "3"],
            capture_output=True, text=True, env=env, timeout=1800)
        assert out.returncode == 0, out.stderr
        res = json.loads(out.stdout.strip().splitlines()[-1])
        assert res["n_frames"] == 6
        assert res["lpips"] > 0 and not res["lpips_calibrated"]
        assert res["fid"] >= 0
        assert 10 < res["psnr_db"] < 50
        assert 0 < res["ssim"] <= 1
