"""Serving export round-trip: exported StableHLO artifacts must reproduce
the live InferencePipeline frame-for-frame (inference/serve.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.inference.pipeline import InferencePipeline
from fsvid2vid_tpu.inference.serve import export_serving, load_serving
from fsvid2vid_tpu.training.state import build_models


def _tiny_cfg(**kw):
    return face_config(ngf=4, nff=4, ndf=4, fine_size=64, load_size=64,
                       n_blocks_F=2, n_downsample_G=3, n_adaptive_layers=2,
                       batch_size=1, is_train=False, **kw)


def _init_variables(cfg, netG, rng):
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
    label = jnp.asarray(rng.randn(1, h, w, cl).astype(np.float32))
    ref_l = jnp.asarray(
        rng.randn(1, cfg.n_shot, h, w, cl).astype(np.float32))
    ref_i = jnp.asarray(
        np.tanh(rng.randn(1, cfg.n_shot, h, w, 3)).astype(np.float32))
    n = max(1, cfg.n_frames_G - 1)
    prev_l = jnp.asarray(rng.randn(1, h, w, cl * n).astype(np.float32))
    prev_i = jnp.asarray(np.tanh(rng.randn(1, h, w, 3 * n)).astype(np.float32))
    return netG.init(jax.random.PRNGKey(0), label, ref_l, ref_i,
                     prev_l, prev_i, warp_prev=True, train=False)


@pytest.mark.slow
class TestServingExport:
    def test_roundtrip_matches_pipeline(self, rng, tmp_path):
        cfg = _tiny_cfg()
        models = build_models(cfg)
        variables = _init_variables(cfg, models.netG, rng)

        out_dir = str(tmp_path / "artifacts")
        sizes = export_serving(cfg, models.netG, variables, out_dir)
        assert set(sizes) == {"encode.hlo", "step0.hlo", "step.hlo",
                              "params.msgpack"}
        assert all(v > 0 for v in sizes.values())

        session = load_serving(out_dir)

        # live pipeline on the SAME bf16/folded weights the export saved
        params_G = {"G": session.variables["params"]}
        aux_G = {"G": {k: v for k, v in session.variables.items()
                       if k != "params"}}
        pipe = InferencePipeline.__new__(InferencePipeline)
        pipe.cfg, pipe.models = cfg, models
        pipe.params_G, pipe.aux_G = params_G, aux_G
        pipe.cache = pipe.prevs = pipe._refs = None
        pipe.t = 0

        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        ref_l = rng.randn(1, 1, h, w, cl).astype(np.float32)
        ref_i = np.tanh(rng.randn(1, 1, h, w, 3)).astype(np.float32)
        labels = [rng.randn(1, h, w, cl).astype(np.float32) for _ in range(3)]

        bf = jnp.bfloat16
        session.reset(ref_l, ref_i, first_label=labels[0])
        pipe.reset(jnp.asarray(ref_l, bf), jnp.asarray(ref_i, bf),
                   first_label=jnp.asarray(labels[0], bf))
        # pipeline keeps prevs in f32 zeros; session builds prevs from frame 0
        # — compare from frame 0 onward, stepping both identically
        for t, lbl in enumerate(labels):
            got = np.asarray(session.step(lbl).astype(jnp.float32))
            want = np.asarray(
                pipe.step(jnp.asarray(lbl, bf))["fake_image"].astype(
                    jnp.float32))
            np.testing.assert_allclose(got, want, atol=2e-2, err_msg=f"t={t}")
            assert np.isfinite(got).all()

    def test_multi_reference_export(self, rng, tmp_path):
        """K>1 export: encode.hlo carries the label-independent prefix and
        the step program runs attention per frame (serve.py n_shot>1 path)."""
        cfg = _tiny_cfg(n_shot=2)
        models = build_models(cfg)
        variables = _init_variables(cfg, models.netG, rng)
        out_dir = str(tmp_path / "artifacts")
        export_serving(cfg, models.netG, variables, out_dir)

        session = load_serving(out_dir)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        session.reset(rng.randn(1, 2, h, w, cl).astype(np.float32),
                      np.tanh(rng.randn(1, 2, h, w, 3)).astype(np.float32))
        frames = [session.step(rng.randn(1, h, w, cl).astype(np.float32))
                  for _ in range(2)]
        for f in frames:
            assert f.shape == (1, h, w, 3)
            assert np.isfinite(np.asarray(f.astype(jnp.float32))).all()

    def test_artifacts_load_without_model_code(self, rng, tmp_path):
        """The session must run from the serialized artifacts alone (fresh
        process simulation: new session object, no ModelBundle)."""
        cfg = _tiny_cfg()
        models = build_models(cfg)
        variables = _init_variables(cfg, models.netG, rng)
        out_dir = str(tmp_path / "artifacts")
        export_serving(cfg, models.netG, variables, out_dir)

        session = load_serving(out_dir)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        session.reset(rng.randn(1, 1, h, w, cl).astype(np.float32),
                      np.tanh(rng.randn(1, 1, h, w, 3)).astype(np.float32))
        f0 = session.step(rng.randn(1, h, w, cl).astype(np.float32))
        f1 = session.step(rng.randn(1, h, w, cl).astype(np.float32))
        assert f0.shape == (1, h, w, 3) and f1.shape == (1, h, w, 3)
        assert np.isfinite(np.asarray(f0.astype(jnp.float32))).all()
