"""Shape/smoke tests for the network zoo on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvid2vid_tpu.config import face_config, pose_config, street_config
from fsvid2vid_tpu.models.generator import FewShotGenerator, pick_ref
from fsvid2vid_tpu.models.flow_generator import FlowGenerator
from fsvid2vid_tpu.models.discriminator import MultiscaleDiscriminator
from fsvid2vid_tpu.models.embedder import LabelEmbedder
from fsvid2vid_tpu.models.layers import SpadeResnetBlock, SNConv


def tiny_face_cfg(**kw):
    base = dict(ngf=4, nff=4, ndf=4, fine_size=64, load_size=64,
                n_blocks_F=2, batch_size=2)
    base.update(kw)
    return face_config(**base)


class TestLayers:
    def test_snconv_updates_spectral_state(self):
        m = SNConv(8, 3)
        x = jnp.ones((2, 8, 8, 4))
        vs = m.init(jax.random.PRNGKey(0), x, train=True)
        assert "spectral" in vs
        out, mut = m.apply(vs, x, train=True, mutable=["spectral"])
        assert out.shape == (2, 8, 8, 8)
        # power iteration should move u
        assert not np.allclose(np.asarray(mut["spectral"]["u"]),
                               np.asarray(vs["spectral"]["u"]))

    def test_spade_resblock_plain_and_spade(self):
        x = jnp.ones((2, 8, 8, 8))
        lbl = jnp.ones((2, 8, 8, 4))
        blk = SpadeResnetBlock(8, 6, norm="spectralspadesyncbatch",
                               hidden_ncs=[4])
        vs = blk.init(jax.random.PRNGKey(0), x, lbl, train=True)
        out = blk.apply(vs, x, lbl, train=False,
                        mutable=["spectral", "batch_stats"])[0]
        assert out.shape == (2, 8, 8, 6)

        blk2 = SpadeResnetBlock(8, 8, norm="spectralsyncbatch")
        vs2 = blk2.init(jax.random.PRNGKey(0), x, train=True)
        out2 = blk2.apply(vs2, x, train=False,
                          mutable=["batch_stats", "spectral"])[0]
        assert out2.shape == (2, 8, 8, 8)


class TestEmbedder:
    @pytest.mark.parametrize("arch", ["encoder", "encoderdecoder", "unet"])
    def test_shapes(self, arch):
        m = LabelEmbedder(arch=arch, nf=4, n_downsample=3)
        x = jnp.ones((2, 16, 16, 3))
        vs = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(vs, x)
        assert len(outs) == 4
        for i, o in enumerate(outs):
            assert o.shape[1] == 16 // (2 ** i)
            assert o.shape[-1] == min(1024, 4 * 2 ** i)


class TestFlowGenerator:
    def test_shapes(self):
        cfg = tiny_face_cfg()
        m = FlowGenerator(cfg, 2)
        lbl = jnp.ones((2, 32, 32, 1))
        prev_lbl = jnp.ones((2, 32, 32, 1))
        prev_img = jnp.ones((2, 32, 32, 3))
        vs = m.init(jax.random.PRNGKey(0), lbl, prev_lbl, prev_img)
        flow, mask = m.apply(vs, lbl, prev_lbl, prev_img,
                             mutable=["batch_stats", "spectral"])[0]
        assert flow.shape == (2, 32, 32, 2)
        assert mask.shape == (2, 32, 32, 1)
        assert float(mask.min()) >= 0 and float(mask.max()) <= 1


class TestDiscriminator:
    def test_multiscale_nlayers(self):
        cfg = tiny_face_cfg(num_D=2)
        m = MultiscaleDiscriminator(cfg, input_nc=8, ndf=4, num_D=2)
        x = jnp.ones((2, 64, 64, 8))
        vs = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(vs, x, mutable=["spectral"])[0]
        assert len(outs) == 2       # num_D scales
        assert len(outs[0]) == 6    # n_layers + 2 feature levels
        assert outs[0][-1].shape[-1] == 1
        # coarser scale has smaller maps
        assert outs[1][-1].shape[1] < outs[0][-1].shape[1]

    def test_adaptive_subarch(self):
        cfg = tiny_face_cfg(netD_subarch="adaptive")
        m = MultiscaleDiscriminator(cfg, input_nc=4, ndf=4, num_D=1,
                                    subarch="adaptive")
        x = jnp.ones((2, 64, 64, 4))
        ref = jnp.ones((2, 64, 64, 4))
        vs = m.init(jax.random.PRNGKey(0), x, ref)
        outs = m.apply(vs, x, ref, mutable=["spectral"])[0]
        assert outs[0][-1].shape[-1] == 1


class TestPickRef:
    def test_gather(self, rng):
        refs = jnp.asarray(rng.randn(2, 3, 4, 4, 2).astype(np.float32))
        idx = jnp.asarray([2, 0])
        out = pick_ref(refs, idx)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(refs[0, 2]))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(refs[1, 0]))
        np.testing.assert_allclose(np.asarray(pick_ref(refs, None)),
                                   np.asarray(refs[:, 0]))


class TestFewShotGenerator:
    def _init_and_run(self, cfg, k=1, warp_prev=False, with_prev=False):
        h, w = cfg.height, cfg.width
        cl = cfg.gen_input_nc
        b = 2
        model = FewShotGenerator(cfg)
        label = jnp.ones((b, h, w, cl))
        label_refs = jnp.ones((b, k, h, w, cl))
        img_refs = jnp.ones((b, k, h, w, 3))
        prev_l = jnp.ones((b, h, w, cl * (cfg.n_frames_G - 1))) if with_prev else None
        prev_i = jnp.ones((b, h, w, 3 * (cfg.n_frames_G - 1))) if with_prev else None
        vs = model.init(jax.random.PRNGKey(0), label, label_refs, img_refs,
                        prev_l, prev_i, warp_prev=warp_prev, train=True)
        out, _ = model.apply(vs, label, label_refs, img_refs, prev_l, prev_i,
                             warp_prev=warp_prev, train=True,
                             mutable=["spectral", "batch_stats"])
        return model, vs, out

    def test_face_single_frame(self):
        cfg = tiny_face_cfg()
        _, _, out = self._init_and_run(cfg)
        assert out["img_final"].shape == (2, 64, 64, 3)
        assert out["flow"][0].shape == (2, 64, 64, 2)
        assert out["flow_mask"][0].shape == (2, 64, 64, 1)
        assert out["flow"][1] is None  # no prev yet

    def test_face_temporal(self):
        cfg = tiny_face_cfg()
        _, _, out = self._init_and_run(cfg, warp_prev=True, with_prev=True)
        assert out["img_final"].shape == (2, 64, 64, 3)
        assert out["flow"][1].shape == (2, 64, 64, 2)
        assert out["img_warp"][1].shape == (2, 64, 64, 3)

    def test_multi_reference_attention(self):
        cfg = tiny_face_cfg(n_shot=3)
        _, _, out = self._init_and_run(cfg, k=3)
        assert out["ref_idx"].shape == (2,)
        assert out["atn_vis"] is not None

    def test_street_one_hot_labels(self):
        cfg = street_config(ngf=4, nff=4, ndf=4, fine_size=64, load_size=64,
                            n_blocks_F=2)
        _, _, out = self._init_and_run(cfg)
        assert out["img_final"].shape == (2, 32, 64, 3)

    def test_multi_ref_prefix_cache_matches_full(self, rng):
        """K>1 eval fast path: forward with the cached label-independent
        encoder prefix (encode_reference_multi) must equal the full forward
        (generator.py prefix kwarg)."""
        cfg = tiny_face_cfg(n_shot=3)
        model, vs, _ = self._init_and_run(cfg, k=3)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        label = jnp.asarray(rng.randn(2, h, w, cl).astype(np.float32))
        label_refs = jnp.asarray(rng.randn(2, 3, h, w, cl).astype(np.float32))
        img_refs = jnp.asarray(
            np.tanh(rng.randn(2, 3, h, w, 3)).astype(np.float32))
        prefix = model.apply(vs, label_refs, img_refs,
                             method=model.encode_reference_multi,
                             mutable=["spectral", "batch_stats"])[0]
        fast = model.apply(vs, label, label_refs, img_refs,
                           warp_prev=False, train=False, prefix=prefix,
                           mutable=["spectral", "batch_stats"])[0]
        full = model.apply(vs, label, label_refs, img_refs,
                           warp_prev=False, train=False,
                           mutable=["spectral", "batch_stats"])[0]
        np.testing.assert_allclose(np.asarray(fast["img_final"]),
                                   np.asarray(full["img_final"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(fast["ref_idx"]),
                                   np.asarray(full["ref_idx"]))

    def test_inference_cache_matches_full(self):
        cfg = tiny_face_cfg()
        model, vs, out = self._init_and_run(cfg)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        label = jnp.ones((2, h, w, cl))
        label_refs = jnp.ones((2, 1, h, w, cl))
        img_refs = jnp.ones((2, 1, h, w, 3))
        cache = model.apply(vs, label_refs, img_refs, label,
                            method=model.encode_reference,
                            mutable=["spectral", "batch_stats"])[0]
        fast = model.apply(vs, label, label_refs, img_refs, cache,
                           method=model.synthesize,
                           mutable=["spectral", "batch_stats"])[0]
        full = model.apply(vs, label, label_refs, img_refs,
                           warp_prev=False, train=False,
                           mutable=["spectral", "batch_stats"])[0]
        np.testing.assert_allclose(np.asarray(fast["img_final"]),
                                   np.asarray(full["img_final"]), atol=2e-5)


class TestAdaptiveConv:
    def test_generator_with_adaptive_conv(self):
        """Exercise the adaptive_conv main-branch path (generated conv
        kernels applied via batch_conv, generator.py:276-289)."""
        cfg = tiny_face_cfg(adaptive_conv=True)
        model = FewShotGenerator(cfg)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        label = jnp.ones((2, h, w, cl))
        refs_l = jnp.ones((2, 1, h, w, cl))
        refs_i = jnp.ones((2, 1, h, w, 3))
        vs = model.init(jax.random.PRNGKey(0), label, refs_l, refs_i,
                        None, None, warp_prev=False, train=True)
        out = model.apply(vs, label, refs_l, refs_i, None, None,
                          warp_prev=False, train=False,
                          mutable=["spectral", "batch_stats"])[0]
        assert out["img_final"].shape == (2, 64, 64, 3)
        assert np.isfinite(np.asarray(out["img_final"])).all()


class TestKLD:
    def test_vae_bottleneck(self):
        cfg = tiny_face_cfg(lambda_kld=0.05)
        model = FewShotGenerator(cfg)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        label = jnp.ones((2, h, w, cl))
        refs_l = jnp.ones((2, 1, h, w, cl))
        refs_i = jnp.ones((2, 1, h, w, 3))
        rngs = {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)}
        vs = model.init(rngs, label, refs_l, refs_i, None, None,
                        warp_prev=False, train=True)
        out = model.apply(vs, label, refs_l, refs_i, None, None,
                          warp_prev=False, train=True,
                          mutable=["spectral", "batch_stats"],
                          rngs={"vae": jax.random.PRNGKey(2)})[0]
        assert out["mu"] is not None and out["logvar"] is not None
        assert out["mu"].shape == (2, 256)


class TestChunkedAttention:
    def test_chunked_matches_dense(self, rng):
        """The streaming-softmax attention must equal the dense formulation
        (generator.py:298-316 reference math)."""
        cfg = tiny_face_cfg(n_shot=3)
        # small slab budget -> forces multiple query chunks at this size
        model = FewShotGenerator(cfg, atn_chunk_elems=3 * 256 * 32)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        b, k = 2, 3
        label = jnp.asarray(rng.randn(b, h, w, cl).astype(np.float32))
        label_refs = jnp.asarray(rng.randn(b, k, h, w, cl).astype(np.float32))
        img_refs = jnp.asarray(rng.randn(b, k, h, w, 3).astype(np.float32))
        vs = model.init(jax.random.PRNGKey(0), label, label_refs, img_refs,
                        None, None, warp_prev=False, train=False)

        ha = cfg.height // (2 ** cfg.n_downsample_A)
        wa = cfg.width // (2 ** cfg.n_downsample_A)
        ca = min(cfg.ngf * 2 ** cfg.n_downsample_A,
                 cfg.ngf * 2 ** cfg.n_downsample_G)
        x = jnp.asarray(rng.randn(b * k, ha, wa, ca).astype(np.float32))
        xl = jnp.asarray(rng.randn(b * k, ha, wa, ca).astype(np.float32))
        lbl_flat = label_refs.reshape(b * k, h, w, cl)

        def run_chunked(m, chunk_limit):
            import fsvid2vid_tpu.models.generator as G
            return m._attention_module(x, xl, label, lbl_flat, train=False)

        out = model.apply(vs, x, xl, label, lbl_flat, False,
                          method=lambda m, *a: m._attention_module(*a),
                          mutable=False)
        out_x, out_l, atn_sum, atn_vis = out

        # dense reference computation from the same encoders
        def dense(m, x_, xl_, label_, lbl_flat_, train):
            key = m._attention_encode(lbl_flat_, m.atn_key_first, m.atn_key,
                                      train)
            query = m._attention_encode(label_, m.atn_query_first,
                                        m.atn_query, train)
            n = m.cfg.n_shot
            bk, hh, ww, c = x_.shape
            bb = bk // n
            key = key.reshape(bb, n * hh * ww, c)
            query = query.reshape(bb, hh * ww, c)
            energy = jnp.einsum("bnc,bqc->bnq", key, query)
            attn = jax.nn.softmax(energy, axis=1)
            o = jnp.einsum("bnc,bnq->bqc", x_.reshape(bb, n * hh * ww, c), attn)
            return o.reshape(bb, hh, ww, c), attn

        out_dense, attn_dense = model.apply(
            vs, x, xl, label, lbl_flat, False,
            method=lambda m, *a: dense(m, *a), mutable=False)
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_dense),
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(atn_sum),
            np.asarray(attn_dense).reshape(b, 3, -1).sum(2), rtol=1e-4)
