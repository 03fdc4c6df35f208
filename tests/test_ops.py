"""Parity tests for core ops against torch-CPU reference semantics.

Torch is used ONLY as a test oracle (grid_sample, conv2d, spectral_norm) — the
framework itself never imports it.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from fsvid2vid_tpu.ops import (
    flow_warp, cost_volume, cost_volume_mxu, batch_conv, channel_norm,
    upsample_nearest, resize_nearest, avg_pool, max_pool, adaptive_avg_pool,
    spectral_normalize, conv_kernel_matrix,
)


def torch_resample(image_nchw, flow_nchw):
    """Reference resample (base_network.py:28-37) on CPU."""
    b, c, h, w = image_nchw.shape
    hor = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(b, 1, h, w)
    ver = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(b, 1, h, w)
    grid = torch.cat([hor, ver], 1)
    flow = torch.cat([flow_nchw[:, 0:1] / ((w - 1.0) / 2.0),
                      flow_nchw[:, 1:2] / ((h - 1.0) / 2.0)], dim=1)
    final = (grid + flow).permute(0, 2, 3, 1)
    return F.grid_sample(image_nchw, final, mode="bilinear",
                         padding_mode="border", align_corners=True)


class TestFlowWarp:
    def test_matches_grid_sample(self, rng):
        img = rng.randn(2, 13, 17, 3).astype(np.float32)
        flow = (rng.randn(2, 13, 17, 2) * 3).astype(np.float32)
        out = flow_warp(jnp.asarray(img), jnp.asarray(flow))
        ref = torch_resample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(flow).permute(0, 3, 1, 2),
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_zero_flow_identity(self, rng):
        img = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
        out = flow_warp(img, jnp.zeros((1, 8, 8, 2), jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_integer_shift(self, rng):
        img = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
        flow = jnp.full((1, 8, 8, 2), 0.0).at[..., 0].set(1.0)  # sample from x+1
        out = flow_warp(img, flow)
        np.testing.assert_allclose(np.asarray(out[0, :, :-1, 0]),
                                   np.asarray(img[0, :, 1:, 0]), atol=1e-6)

    def test_gradients_flow(self, rng):
        img = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
        flow = jnp.asarray((rng.randn(1, 6, 6, 2) * 0.5).astype(np.float32))

        gi, gf = jax.grad(lambda i, f: flow_warp(i, f).sum(), argnums=(0, 1))(img, flow)
        assert np.isfinite(np.asarray(gi)).all() and np.abs(np.asarray(gf)).max() > 0

        # numerical check of flow gradient
        def loss(f):
            return float(flow_warp(img, f).sum())
        eps = 1e-3
        f0 = np.asarray(flow).copy()
        f1 = f0.copy(); f1[0, 3, 3, 0] += eps
        num = (loss(jnp.asarray(f1)) - loss(jnp.asarray(f0))) / eps
        np.testing.assert_allclose(np.asarray(gf)[0, 3, 3, 0], num, atol=1e-2)

    def test_gradients_flow_batched(self, rng):
        """b>1 takes the flattened single-gather path; its VJP (scatter over
        the flat table) must match the per-batch formulation numerically."""
        img = jnp.asarray(rng.randn(3, 6, 6, 2).astype(np.float32))
        flow = jnp.asarray((rng.randn(3, 6, 6, 2) * 0.5).astype(np.float32))
        gi, gf = jax.grad(lambda i, f: flow_warp(i, f).sum(),
                          argnums=(0, 1))(img, flow)
        gi1 = jnp.concatenate([
            jax.grad(lambda i, f: flow_warp(i, f).sum())(img[k:k + 1],
                                                         flow[k:k + 1])
            for k in range(3)])
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gi1),
                                   atol=1e-5)
        assert np.isfinite(np.asarray(gf)).all()


class TestCostVolume:
    def _torch_corr(self, f1, f2, md=4, stride=2):
        """Naive correlation oracle matching correlation_cuda_kernel.cu."""
        b, h, w, c = f1.shape
        d = md // stride
        f2p = np.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
        outs = []
        for dy in range(-d, d + 1):
            for dx in range(-d, d + 1):
                sh = f2p[:, md + dy * stride: md + dy * stride + h,
                         md + dx * stride: md + dx * stride + w]
                outs.append((f1 * sh).sum(-1) / c)
        return np.stack(outs, -1)

    def test_matches_reference(self, rng):
        f1 = rng.randn(2, 9, 11, 8).astype(np.float32)
        f2 = rng.randn(2, 9, 11, 8).astype(np.float32)
        ref = self._torch_corr(f1, f2)
        out = cost_volume(jnp.asarray(f1), jnp.asarray(f2), 4, 2)
        assert out.shape == (2, 9, 11, 25)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_mxu_matches_shift(self, rng):
        f1 = rng.randn(1, 8, 8, 16).astype(np.float32)
        f2 = rng.randn(1, 8, 8, 16).astype(np.float32)
        a = cost_volume(jnp.asarray(f1), jnp.asarray(f2), 4, 2)
        m = cost_volume_mxu(jnp.asarray(f1), jnp.asarray(f2), 4, 2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(m), atol=1e-4)

    def test_identical_inputs_peak_at_center(self, rng):
        f = rng.randn(1, 8, 8, 4).astype(np.float32)
        f /= np.linalg.norm(f, axis=-1, keepdims=True)  # unit feature vectors
        out = np.asarray(cost_volume(jnp.asarray(f), jnp.asarray(f), 4, 2))
        center = out.shape[-1] // 2
        inner = out[0, 2:-2, 2:-2]
        assert (inner.argmax(-1) == center).all()

    def test_pallas_dispatch_grad(self, rng):
        """jax.grad through the TPU-dispatch (Pallas) path must work: the
        kernel is forward-only, so `correlation` carries a custom VJP whose
        backward is the XLA shift-reduce transpose.  Exercised here via the
        interpret-mode Pallas path on CPU and checked against autodiff of the
        differentiable XLA formulation."""
        from fsvid2vid_tpu.ops.cost_volume import correlation
        f1 = jnp.asarray(rng.randn(1, 8, 12, 4).astype(np.float32))
        f2 = jnp.asarray(rng.randn(1, 8, 12, 4).astype(np.float32))
        cot = jnp.asarray(rng.randn(1, 8, 12, 25).astype(np.float32))

        def via_pallas(a, b):
            return (correlation(a, b, 4, 2, interpret=True) * cot).sum()

        def via_xla(a, b):
            return (cost_volume(a, b, 4, 2) * cot).sum()

        # forward agrees
        np.testing.assert_allclose(np.asarray(via_pallas(f1, f2)),
                                   np.asarray(via_xla(f1, f2)), rtol=1e-5)
        g1p, g2p = jax.grad(via_pallas, argnums=(0, 1))(f1, f2)
        g1x, g2x = jax.grad(via_xla, argnums=(0, 1))(f1, f2)
        np.testing.assert_allclose(np.asarray(g1p), np.asarray(g1x),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2p), np.asarray(g2x),
                                   atol=1e-5)


class TestBatchConv:
    @pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (1, 1)])
    def test_matches_torch_loop(self, rng, stride, k):
        b, h, w, cin, cout = 3, 8, 8, 4, 6
        x = rng.randn(b, h, w, cin).astype(np.float32)
        wt = rng.randn(b, cout, cin, k, k).astype(np.float32)  # torch layout
        bias = rng.randn(b, cout).astype(np.float32)

        # torch oracle: per-sample conv loop (base_network.py:62-71)
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        refs = [F.conv2d(tx[i:i + 1], torch.from_numpy(wt[i]),
                         torch.from_numpy(bias[i]), padding=k // 2, stride=stride)
                for i in range(b)]
        ref = torch.cat(refs).permute(0, 2, 3, 1).numpy()

        w_hwio = np.transpose(wt, (0, 3, 4, 2, 1))
        out = batch_conv(jnp.asarray(x), jnp.asarray(w_hwio),
                         jnp.asarray(bias), stride=stride)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestSpectralNorm:
    def test_matches_torch(self, rng):
        cout, cin, k = 6, 4, 3
        w_torch = rng.randn(cout, cin, k, k).astype(np.float32)
        conv = torch.nn.Conv2d(cin, cout, k, bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w_torch))
        snconv = torch.nn.utils.spectral_norm(conv)
        x = torch.randn(1, cin, 8, 8)
        snconv.train()
        for _ in range(3):
            snconv(x)  # three power iterations
        w_ref = snconv.weight_orig.detach() / (
            snconv.weight_orig.detach() / snconv(x) if False else 1)
        u_t = snconv.weight_u.detach().numpy()
        v_t = snconv.weight_v.detach().numpy()

        # ours: same 3 iterations from torch's initial u. Torch initializes u
        # randomly, so start from torch's u after 0 iters is not recoverable;
        # instead check fixed-point: from torch's converged u/v, one more
        # update reproduces torch's next sigma.
        kernel = jnp.asarray(np.transpose(w_torch, (2, 3, 1, 0)))  # HWIO
        mat = conv_kernel_matrix(kernel)
        sigma, _, _ = spectral_normalize(mat, jnp.asarray(u_t), jnp.asarray(v_t), update=True)
        snconv(x)  # 4th iteration in torch
        sigma_t = (snconv.weight_u @ torch.from_numpy(
            w_torch.reshape(cout, -1)) @ snconv.weight_v).item()
        np.testing.assert_allclose(float(sigma), sigma_t, rtol=1e-4)

    def test_normalized_has_unit_sigma(self, rng):
        mat = jnp.asarray(rng.randn(16, 32).astype(np.float32))
        u = jnp.asarray(rng.randn(16).astype(np.float32))
        v = jnp.asarray(rng.randn(32).astype(np.float32))
        for _ in range(50):
            sigma, u, v = spectral_normalize(mat, u, v, update=True)
        top = np.linalg.svd(np.asarray(mat), compute_uv=False)[0]
        np.testing.assert_allclose(float(sigma), top, rtol=1e-4)

    def test_power_iters_knob(self, rng):
        """cfg.sn_power_iters=2 == applying the 1-iteration update twice
        (docs/CONVERGENCE.md drift diagnosis)."""
        from fsvid2vid_tpu.ops.spectral_norm import set_power_iters
        mat = jnp.asarray(rng.randn(8, 12).astype(np.float32))
        u = jnp.asarray(rng.randn(8).astype(np.float32))
        v = jnp.asarray(rng.randn(12).astype(np.float32))
        _, u1, v1 = spectral_normalize(mat, u, v, update=True)
        s_twice, u2, v2 = spectral_normalize(mat, u1, v1, update=True)
        try:
            set_power_iters(2)
            s_knob, uk, vk = spectral_normalize(mat, u, v, update=True)
        finally:
            set_power_iters(1)
        np.testing.assert_allclose(np.asarray(s_knob), np.asarray(s_twice),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(uk), np.asarray(u2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vk), np.asarray(v2), rtol=1e-6)


class TestImageOps:
    def test_channel_norm(self, rng):
        x = rng.randn(2, 5, 5, 7).astype(np.float32)
        out = channel_norm(jnp.asarray(x))
        ref = np.linalg.norm(x, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_upsample_nearest(self, rng):
        x = rng.randn(1, 3, 4, 2).astype(np.float32)
        out = upsample_nearest(jnp.asarray(x), 2)
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            scale_factor=2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref)

    def test_resize_nearest(self, rng):
        x = rng.randn(1, 16, 12, 3).astype(np.float32)
        out = resize_nearest(jnp.asarray(x), (5, 7))
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            size=(5, 7)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref)

    def test_avg_pool_discriminator_pyramid(self, rng):
        x = rng.randn(2, 9, 9, 3).astype(np.float32)
        out = avg_pool(jnp.asarray(x), 3, 2, 1, count_include_pad=False)
        ref = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1,
                           count_include_pad=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_max_pool_mask_dilation(self, rng):
        x = rng.randn(1, 16, 16, 1).astype(np.float32)
        out = max_pool(jnp.asarray(x), 15, 1, 7)
        ref = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 15, 1,
                           7).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref)

    def test_adaptive_avg_pool(self, rng):
        x = rng.randn(1, 17, 23, 2).astype(np.float32)
        out = adaptive_avg_pool(jnp.asarray(x), (8, 8))
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                                    (8, 8)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
