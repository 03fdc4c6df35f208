"""Space-to-depth conv reformulation parity (ops/spd.py).

The STD path must be bit-equivalent (up to float reassociation) to the plain
NHWC convs it replaces — it is a pure TPU lane-packing layout change."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.models.flow_generator import FlowGenerator
from fsvid2vid_tpu.ops.spd import (
    depth_to_space, space_to_depth, spd_conv, spd_upsample_enter)


def conv(x, k, s):
    return lax.conv_general_dilated(
        x, k, (s, s), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestSpdOps:
    @pytest.fixture()
    def data(self, rng):
        x = jnp.asarray(rng.randn(2, 16, 20, 5).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
        return x, k

    def test_roundtrip(self, data):
        x, _ = data
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))

    def test_s1(self, data):
        x, k = data
        got = depth_to_space(spd_conv(space_to_depth(x), k, "s1"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(conv(x, k, 1)),
                                   atol=1e-5)

    def test_s2_std_out(self, data):
        x, k = data
        got = depth_to_space(spd_conv(space_to_depth(x), k, "s2"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(conv(x, k, 2)),
                                   atol=1e-5)

    def test_s2_exit(self, data):
        x, k = data
        got = spd_conv(space_to_depth(x), k, "s2_exit")
        np.testing.assert_allclose(np.asarray(got), np.asarray(conv(x, k, 2)),
                                   atol=1e-5)

    def test_upsample_enter(self, data):
        x, k = data
        up = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
        got = depth_to_space(spd_conv(spd_upsample_enter(x), k, "s1"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(conv(up, k, 1)),
                                   atol=1e-5)

    def test_s1_up_folded(self, data):
        """spd_kernel_s1_up folds nearest-upsample + k3 conv into one conv on
        the pre-upsample tensor (4x fewer FLOPs than tiling + s1)."""
        x, k = data
        up = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
        got = depth_to_space(spd_conv(x, k, "s1_up"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(conv(up, k, 1)),
                                   atol=1e-5)


class TestGeneratorSpd:
    """Full-generator eval parity: spd_inference=True (up blocks 0-1, SPADE
    modulation, conv_img all in STD layout) must match the plain path."""

    def _run_pair(self, **cfg_kw):
        from fsvid2vid_tpu.config import face_config
        from fsvid2vid_tpu.models.generator import FewShotGenerator
        rng = np.random.RandomState(1)
        cfg = face_config(ngf=4, nff=4, ndf=4, fine_size=64, load_size=64,
                          n_blocks_F=2, batch_size=2, is_train=False, **cfg_kw)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        b = 2
        model = FewShotGenerator(cfg)
        label = jnp.asarray(rng.randn(b, h, w, cl).astype(np.float32))
        label_refs = jnp.asarray(rng.randn(b, 1, h, w, cl).astype(np.float32))
        img_refs = jnp.asarray(np.tanh(rng.randn(b, 1, h, w, 3)).astype(np.float32))
        prev_l = jnp.asarray(
            rng.randn(b, h, w, cl * (cfg.n_frames_G - 1)).astype(np.float32))
        prev_i = jnp.asarray(np.tanh(
            rng.randn(b, h, w, 3 * (cfg.n_frames_G - 1))).astype(np.float32))
        vs = model.init(jax.random.PRNGKey(0), label, label_refs, img_refs,
                        prev_l, prev_i, warp_prev=True, train=True)
        # push batch stats off init values so the STD norm path is non-trivial
        _, mut = model.apply(vs, label, label_refs, img_refs, prev_l, prev_i,
                             warp_prev=True, train=True,
                             mutable=["batch_stats", "spectral"])
        vs = {**vs, **mut}

        out_std = model.apply(vs, label, label_refs, img_refs, prev_l, prev_i,
                              warp_prev=True, train=False, mutable=False)
        plain = FewShotGenerator(cfg.replace(spd_inference=False))
        out_plain = plain.apply(vs, label, label_refs, img_refs, prev_l,
                                prev_i, warp_prev=True, train=False,
                                mutable=False)
        return out_std, out_plain

    @pytest.mark.slow
    def test_eval_matches_plain(self):
        out_std, out_plain = self._run_pair()
        np.testing.assert_allclose(np.asarray(out_std["img_final"]),
                                   np.asarray(out_plain["img_final"]),
                                   atol=2e-5)

    @pytest.mark.slow
    def test_eval_matches_plain_raw_output(self):
        out_std, out_plain = self._run_pair(add_raw_output_loss=True)
        np.testing.assert_allclose(np.asarray(out_std["img_final"]),
                                   np.asarray(out_plain["img_final"]),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_std["img_raw"]),
                                   np.asarray(out_plain["img_raw"]),
                                   atol=2e-5)


class TestFlowGeneratorSpd:
    def test_eval_path_matches_plain(self, rng):
        cfg = face_config(nff=8, n_blocks_F=2, is_train=False)
        net = FlowGenerator(cfg, 2)
        H = W = 64
        label = jnp.asarray(rng.randn(2, H, W, 1).astype(np.float32))
        pl_ = jnp.asarray(rng.randn(2, H, W, 1).astype(np.float32))
        pi = jnp.asarray(np.tanh(rng.randn(2, H, W, 3)).astype(np.float32))
        variables = net.init(jax.random.PRNGKey(0), label, pl_, pi, train=True)
        # push running stats off their init values
        _, mut = net.apply(variables, label, pl_, pi, train=True,
                           mutable=["batch_stats", "spectral"])
        variables = {**variables, **mut}

        f1, m1 = net.apply(variables, label, pl_, pi, train=False,
                           mutable=False)
        plain = FlowGenerator(cfg.replace(spd_inference=False), 2)
        f2, m2 = plain.apply(variables, label, pl_, pi, train=False,
                             mutable=False)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)

    def test_train_path_matches_plain(self, rng):
        """cfg.spd_train (round 5): TRAIN-mode STD must reproduce the plain
        path's forward, batch-stats updates, spectral u/v advance, AND
        parameter gradients — the layout change is exact math, so the whole
        training trajectory is unchanged."""
        cfg = face_config(nff=8, n_blocks_F=2, is_train=True)
        std = FlowGenerator(cfg, 2)                      # spd_train=True
        plain = FlowGenerator(cfg.replace(spd_train=False,
                                          spd_inference=False), 2)
        H = W = 64
        label = jnp.asarray(rng.randn(2, H, W, 1).astype(np.float32))
        pl_ = jnp.asarray(rng.randn(2, H, W, 1).astype(np.float32))
        pi = jnp.asarray(np.tanh(rng.randn(2, H, W, 3)).astype(np.float32))
        variables = plain.init(jax.random.PRNGKey(0), label, pl_, pi,
                               train=True)

        def loss_and_mut(net, params):
            def f(p):
                (fl, mk), mut = net.apply(
                    {**variables, "params": p}, label, pl_, pi, train=True,
                    mutable=["batch_stats", "spectral"])
                return jnp.sum(fl ** 2) + jnp.sum(mk ** 2), mut
            (val, mut), grads = jax.value_and_grad(f, has_aux=True)(params)
            return val, mut, grads

        v1, mut1, g1 = loss_and_mut(std, variables["params"])
        v2, mut2, g2 = loss_and_mut(plain, variables["params"])
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(mut1),
                jax.tree_util.tree_leaves_with_path(mut2)):
            assert p1 == p2
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=str(p1))
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(g1),
                jax.tree_util.tree_leaves_with_path(g2)):
            assert p1 == p2
            a, b = np.asarray(a), np.asarray(b)
            # reassociation noise is absolute at the tensor's magnitude scale
            # (conv-backward sums ~8k products per entry), so near-zero
            # entries need a norm-scaled atol, not a relative bound
            tol = max(1e-3, 1e-5 * float(np.abs(b).max()))
            np.testing.assert_allclose(a, b, atol=tol, rtol=2e-2,
                                       err_msg=str(p1))


class TestGeneratorSpdTrain:
    """Round-5 main-branch STD in TRAIN mode (cfg.spd_train): the two finest
    SPADE up blocks + conv_img run phase-packed during training — forward,
    batch-stat/spectral updates, and parameter gradients must all match the
    plain layout (pure layout change, exact math)."""

    @pytest.mark.slow
    def test_train_path_matches_plain(self):
        from fsvid2vid_tpu.models.generator import FewShotGenerator
        rng = np.random.RandomState(3)
        cfg = face_config(ngf=4, nff=4, ndf=4, fine_size=64, load_size=64,
                          n_blocks_F=2, batch_size=2, is_train=True,
                          add_raw_output_loss=True)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        b = 2
        std = FewShotGenerator(cfg)                      # spd_train=True
        plain = FewShotGenerator(cfg.replace(spd_train=False,
                                             spd_inference=False))
        label = jnp.asarray(rng.randn(b, h, w, cl).astype(np.float32))
        label_refs = jnp.asarray(
            rng.randn(b, 1, h, w, cl).astype(np.float32))
        img_refs = jnp.asarray(
            np.tanh(rng.randn(b, 1, h, w, 3)).astype(np.float32))
        prev_l = jnp.asarray(
            rng.randn(b, h, w, cl * (cfg.n_frames_G - 1)).astype(np.float32))
        prev_i = jnp.asarray(np.tanh(
            rng.randn(b, h, w, 3 * (cfg.n_frames_G - 1))).astype(np.float32))
        variables = plain.init(jax.random.PRNGKey(0), label, label_refs,
                               img_refs, prev_l, prev_i, warp_prev=True,
                               train=True)

        def loss_and_mut(net, params):
            def f(p):
                out, mut = net.apply(
                    {**variables, "params": p}, label, label_refs, img_refs,
                    prev_l, prev_i, warp_prev=True, train=True,
                    mutable=["batch_stats", "spectral"])
                loss = sum(jnp.sum(out[k] ** 2)
                           for k in ("img_final", "img_raw")
                           if out[k] is not None)
                return loss, mut
            (val, mut), grads = jax.value_and_grad(f, has_aux=True)(params)
            return val, mut, grads

        v1, mut1, g1 = loss_and_mut(std, variables["params"])
        v2, mut2, g2 = loss_and_mut(plain, variables["params"])
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        for (p1, a), (p2, b_) in zip(
                jax.tree_util.tree_leaves_with_path(mut1),
                jax.tree_util.tree_leaves_with_path(mut2)):
            assert p1 == p2
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-5, rtol=1e-4, err_msg=str(p1))
        for (p1, a), (p2, b_) in zip(
                jax.tree_util.tree_leaves_with_path(g1),
                jax.tree_util.tree_leaves_with_path(g2)):
            assert p1 == p2
            a, b_ = np.asarray(a), np.asarray(b_)
            tol = max(1e-3, 1e-5 * float(np.abs(b_).max()))
            np.testing.assert_allclose(a, b_, atol=tol, rtol=2e-2,
                                       err_msg=str(p1))


class TestEmbedderSpdTrain:
    def test_train_path_matches_plain(self, rng):
        """spd_train for the norm-free SC embedder: forward and parameter
        gradients equal the plain path (no norms, no spectral — pure
        scattered-kernel convs)."""
        from fsvid2vid_tpu.models.embedder import LabelEmbedder
        std = LabelEmbedder(arch="encoderdecoder", nf=8, n_downsample=3,
                            spd_inference=True, spd_train=True)
        plain = LabelEmbedder(arch="encoderdecoder", nf=8, n_downsample=3)
        x = jnp.asarray(rng.randn(2, 32, 32, 4).astype(np.float32))
        variables = plain.init(jax.random.PRNGKey(0), x, train=True)

        def loss_grads(net):
            def f(p):
                out = net.apply({"params": p}, x, train=True)
                return sum(jnp.sum(o ** 2) for o in out)
            return jax.value_and_grad(f)(variables["params"])

        v1, g1 = loss_grads(std)
        v2, g2 = loss_grads(plain)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(g1),
                jax.tree_util.tree_leaves_with_path(g2)):
            assert p1 == p2
            a, b = np.asarray(a), np.asarray(b)
            tol = max(1e-4, 1e-5 * float(np.abs(b).max()))
            np.testing.assert_allclose(a, b, atol=tol, rtol=2e-2,
                                       err_msg=str(p1))
