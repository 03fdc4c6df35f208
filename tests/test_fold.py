"""Spectral-norm folding parity: inference with sigma folded into the stored
kernels (and the 'spectral' collection dropped) must match the live-sigma
forward exactly — the eval-time sigma is a constant u @ W @ v.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.inference.fold import fold_spectral_norm
from fsvid2vid_tpu.models.generator import FewShotGenerator
from fsvid2vid_tpu.models.layers import SNConv, SNDense


def tiny_cfg(**kw):
    kw.setdefault("ngf", 4)
    kw.setdefault("nff", 4)
    kw.setdefault("fine_size", 64)
    kw.setdefault("load_size", 64)
    kw.setdefault("n_downsample_G", 3)
    kw.setdefault("n_adaptive_layers", 2)
    kw.setdefault("is_train", False)
    return face_config(**kw)


class TestFoldSpectralNorm:
    def test_snconv_folded_matches_live(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 5),
                        jnp.float32)
        conv = SNConv(7, use_sn=True)
        variables = conv.init(jax.random.PRNGKey(0), x)
        live = conv.apply(variables, x)
        folded_vars = fold_spectral_norm(variables)
        assert "spectral" not in folded_vars
        folded = conv.apply(folded_vars, x)
        np.testing.assert_allclose(np.asarray(live), np.asarray(folded),
                                   atol=1e-6)

    def test_sndense_folded_matches_live(self):
        x = jnp.asarray(np.random.RandomState(1).randn(3, 11), jnp.float32)
        dense = SNDense(6, use_sn=True)
        variables = dense.init(jax.random.PRNGKey(1), x)
        live = dense.apply(variables, x)
        folded = dense.apply(fold_spectral_norm(variables), x)
        np.testing.assert_allclose(np.asarray(live), np.asarray(folded),
                                   atol=1e-6)

    @pytest.mark.slow
    def test_generator_synthesize_folded_matches_live(self):
        cfg = tiny_cfg()
        netG = FewShotGenerator(cfg)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        rng = np.random.RandomState(2)
        label = jnp.asarray(rng.randn(1, h, w, cl), jnp.float32)
        ref_l = jnp.asarray(rng.randn(1, 1, h, w, cl), jnp.float32)
        ref_i = jnp.asarray(np.tanh(rng.randn(1, 1, h, w, 3)), jnp.float32)
        n = cfg.n_frames_G - 1
        prev_l = jnp.asarray(rng.randn(1, h, w, cl * n), jnp.float32)
        prev_i = jnp.asarray(np.tanh(rng.randn(1, h, w, 3 * n)), jnp.float32)
        variables = netG.init(jax.random.PRNGKey(2), label, ref_l, ref_i,
                              prev_l, prev_i, warp_prev=True, train=False)

        def run(v):
            cache = netG.apply(v, ref_l, ref_i, label,
                               method=netG.encode_reference, mutable=False)
            return netG.apply(v, label, ref_l, ref_i, cache, prev_l, prev_i,
                              warp_prev=True, method=netG.synthesize,
                              mutable=False)["img_final"]

        live = run(variables)
        folded = run(fold_spectral_norm(variables))
        np.testing.assert_allclose(np.asarray(live), np.asarray(folded),
                                   atol=2e-5)

    def test_fold_without_spectral_is_identity(self):
        v = {"params": {"a": {"kernel": jnp.ones((3, 3))}}}
        out = fold_spectral_norm(v)
        assert set(out) == {"params"}
