"""Parity tests for the Pallas flash-attention kernel (interpret mode).

The kernel must reproduce the XLA chunked-streaming attention of
models/generator.py::_attention_module (reference semantics:
generator.py:298-316) — outputs, per-reference attention mass, and the
attention visualization map.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvid2vid_tpu.models.generator import FewShotGenerator
from fsvid2vid_tpu.ops.pallas.attention_kernel import flash_ref_attention
from tests.test_networks import tiny_face_cfg


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestFlashKernel:
    def _dense(self, query, key, xf, lf, n):
        b, hw, c = query.shape
        energy = jnp.einsum("bnc,bqc->bnq", key.astype(jnp.float32),
                            query.astype(jnp.float32))
        attn = jax.nn.softmax(energy, axis=1)
        out_x = jnp.einsum("bnc,bnq->bqc", xf.astype(jnp.float32), attn)
        out_l = (jnp.einsum("bnc,bnq->bqc", lf.astype(jnp.float32), attn)
                 if lf is not None else None)
        vis = attn.reshape(b, n, -1, hw).sum(2).transpose(0, 2, 1)
        return out_x, out_l, vis

    @pytest.mark.parametrize("has_lf", [True, False])
    def test_matches_dense_multi_block(self, rng, has_lf):
        """Multiple q and k blocks force the streaming-softmax rescale."""
        b, n, hw_k, hw_q, c = 2, 3, 64, 64, 16
        q = jnp.asarray(rng.randn(b, hw_q, c).astype(np.float32))
        k = jnp.asarray(rng.randn(b, n * hw_k, c).astype(np.float32))
        xf = jnp.asarray(rng.randn(b, n * hw_k, c).astype(np.float32))
        lf = (jnp.asarray(rng.randn(b, n * hw_k, c).astype(np.float32))
              if has_lf else None)
        out_x, out_l, vis = flash_ref_attention(
            q, k, xf, lf, n_refs=n, q_block=16, k_block=32, interpret=True)
        ref_x, ref_l, ref_vis = self._dense(q, k, xf, lf, n)
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(vis), np.asarray(ref_vis),
                                   atol=1e-5)
        if has_lf:
            np.testing.assert_allclose(np.asarray(out_l), np.asarray(ref_l),
                                       atol=1e-4)
        else:
            assert out_l is None
        # attention mass sums to 1 per query
        np.testing.assert_allclose(np.asarray(vis.sum(-1)), 1.0, atol=1e-5)

    def test_bf16_inputs(self, rng):
        """bf16 serving dtype: f32 accumulation keeps the result close to
        the f32 dense reference (softmax weights rounded to bf16)."""
        b, n, hw_k, c = 1, 2, 128, 32
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        q, k, xf = mk(b, hw_k, c), mk(b, n * hw_k, c), mk(b, n * hw_k, c)
        out_x, _, vis = flash_ref_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            xf.astype(jnp.bfloat16), None, n_refs=n, q_block=32, k_block=64,
            interpret=True)
        ref_x, _, ref_vis = self._dense(q, k, xf, None, n)
        assert out_x.dtype == jnp.bfloat16
        err = np.abs(np.asarray(out_x, np.float32) - np.asarray(ref_x))
        scale = np.abs(np.asarray(ref_x)).max()
        assert err.max() / scale < 0.05
        np.testing.assert_allclose(np.asarray(vis), np.asarray(ref_vis),
                                   atol=0.03)


class TestGeneratorFlashWiring:
    def test_attention_module_flash_matches_xla(self, rng):
        """The generator's flash dispatch returns the same four outputs as
        its XLA chunked path (wiring: reshape orders, atn_sum, atn_vis)."""
        cfg = tiny_face_cfg(n_shot=3)
        m_xla = FewShotGenerator(cfg, atn_flash="off")
        m_flash = FewShotGenerator(cfg, atn_flash="interpret")
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        b, k = 2, 3
        label = jnp.asarray(rng.randn(b, h, w, cl).astype(np.float32))
        label_refs = jnp.asarray(rng.randn(b, k, h, w, cl).astype(np.float32))
        img_refs = jnp.asarray(rng.randn(b, k, h, w, 3).astype(np.float32))
        vs = m_xla.init(jax.random.PRNGKey(0), label, label_refs, img_refs,
                        None, None, warp_prev=False, train=False)

        ha = cfg.height // (2 ** cfg.n_downsample_A)
        wa = cfg.width // (2 ** cfg.n_downsample_A)
        ca = min(cfg.ngf * 2 ** cfg.n_downsample_A,
                 cfg.ngf * 2 ** cfg.n_downsample_G)
        x = jnp.asarray(rng.randn(b * k, ha, wa, ca).astype(np.float32))
        xl = jnp.asarray(rng.randn(b * k, ha, wa, ca).astype(np.float32))
        lbl_flat = label_refs.reshape(b * k, h, w, cl)

        def run(model):
            return model.apply(
                vs, x, xl, label, lbl_flat, False,
                method=lambda m, *a: m._attention_module(*a), mutable=False)

        ox1, ol1, s1, v1 = run(m_xla)
        ox2, ol2, s2, v2 = run(m_flash)
        np.testing.assert_allclose(np.asarray(ox1), np.asarray(ox2),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(ol1), np.asarray(ol2),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
