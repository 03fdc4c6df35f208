"""End-to-end train-step tests on tiny configs: losses finite, params move,
temporal phase works, and the step runs under an 8-device data-parallel mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvid2vid_tpu.config import face_config, pose_config
from fsvid2vid_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from fsvid2vid_tpu.training.state import (
    build_models, init_state, set_epoch_lr, lr_for_epoch)
from fsvid2vid_tpu.training.step import (
    StepFlags, init_prevs, train_step, train_step_faithful)

pytestmark = pytest.mark.slow  # >60s on one CPU (see pytest.ini)


def tiny_cfg(**kw):
    base = dict(ngf=4, nff=4, ndf=4, fine_size=32, load_size=32,
                n_blocks_F=2, n_downsample_G=3, n_adaptive_layers=2,
                batch_size=2, no_vgg_loss=True, compute_dtype="float32")
    base.update(kw)
    return face_config(**base)


def make_batch(cfg, rng, b=2, k=1):
    h, w = cfg.height, cfg.width
    cl = cfg.gen_input_nc
    return {
        "tgt_label": jnp.asarray(rng.randn(b, h, w, cl).astype(np.float32)),
        "tgt_image": jnp.asarray(
            np.tanh(rng.randn(b, h, w, 3)).astype(np.float32)),
        "ref_labels": jnp.asarray(rng.randn(b, k, h, w, cl).astype(np.float32)),
        "ref_images": jnp.asarray(
            np.tanh(rng.randn(b, k, h, w, 3)).astype(np.float32)),
        "flow_gt": [None, None],
        "conf_gt": [None, None],
    }


class TestTrainStep:
    def test_single_frame_step(self, rng):
        cfg = tiny_cfg()
        models = build_models(cfg)
        batch = make_batch(cfg, rng)
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        flags = StepFlags(warp_prev=False, has_prev=False)
        new_state, new_prevs, losses, _ = train_step(
            cfg, models, state, batch, prevs, flags, jax.random.PRNGKey(1))
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        assert float(losses["G_GAN"]) != 0.0
        assert float(losses["F_Warp"]) != 0.0
        # params actually moved
        d0 = jax.tree.leaves(state.params_G)[0]
        d1 = jax.tree.leaves(new_state.params_G)[0]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))
        assert int(new_state.step) == 1
        # prevs updated to current frame outputs
        assert float(jnp.abs(new_prevs["fake"]).max()) > 0

    def test_temporal_phase(self, rng):
        cfg = tiny_cfg()
        models = build_models(cfg)
        batch = make_batch(cfg, rng)
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        # frame 0 in temporal phase: warp_prev on, no prev yet
        state, prevs, _, _ = train_step(
            cfg, models, state, batch, prevs, StepFlags(True, False),
            jax.random.PRNGKey(1))
        # frame 1: prevs active -> temporal flow branch exercised
        state, prevs, losses, _ = train_step(
            cfg, models, state, batch, prevs, StepFlags(True, True),
            jax.random.PRNGKey(2))
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} not finite"

    def test_temporal_gan_loss_active(self, rng):
        cfg = tiny_cfg(lambda_temp=2.0)
        models = build_models(cfg)
        batch = make_batch(cfg, rng)
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        state, prevs, _, _ = train_step(
            cfg, models, state, batch, prevs, StepFlags(True, False),
            jax.random.PRNGKey(1))
        _, _, losses, _ = train_step(
            cfg, models, state, batch, prevs, StepFlags(True, True),
            jax.random.PRNGKey(2))
        assert float(jnp.abs(losses["DT_real"]) + jnp.abs(losses["DT_fake"])) > 0

    def test_lr_schedule(self):
        cfg = tiny_cfg(niter=10, niter_decay=10, lr=1e-3)
        assert lr_for_epoch(cfg, 5) == 1e-3
        assert lr_for_epoch(cfg, 10) == 1e-3
        decayed = lr_for_epoch(cfg, 16)
        assert 0 < decayed < 1e-3
        models = build_models(cfg)
        batch = make_batch(cfg, np.random.RandomState(0))
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        state = set_epoch_lr(cfg, state, 16)
        # TTUR: G = lr/2, D = lr*2
        assert np.isclose(float(state.opt_G.hyperparams["learning_rate"]),
                          decayed / 2)
        assert np.isclose(float(state.opt_D.hyperparams["learning_rate"]),
                          decayed * 2)


class TestDataParallel:
    def test_step_on_8_device_mesh(self, rng):
        assert jax.device_count() >= 8
        cfg = tiny_cfg(batch_size=8)
        mesh = make_mesh(8)
        models = build_models(cfg)
        batch = make_batch(cfg, rng, b=8)
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        batch_s = shard_batch(mesh, batch)
        prevs_s = shard_batch(mesh, prevs)
        state_s = replicate(mesh, state)
        new_state, _, losses, _ = train_step(
            cfg, models, state_s, batch_s, prevs_s,
            StepFlags(False, False), jax.random.PRNGKey(1))
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} not finite"

    def test_sharded_matches_single_device(self, rng):
        """Global batch stats + gradient sync: sharded step == replicated step."""
        cfg = tiny_cfg(batch_size=4)
        mesh = make_mesh(4)
        models = build_models(cfg)
        batch = make_batch(cfg, rng, b=4)
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        flags = StepFlags(False, False)
        _, _, losses_1, _ = train_step(cfg, models, state, batch, prevs, flags,
                                    jax.random.PRNGKey(1))
        batch_s = shard_batch(mesh, batch)
        _, _, losses_8, _ = train_step(cfg, models, replicate(mesh, state),
                                    batch_s, shard_batch(mesh, prevs),
                                    flags, jax.random.PRNGKey(1))
        for k in losses_1:
            # reduction order differs across shards; near-zero GAN logits
            # make pure-relative comparison brittle
            np.testing.assert_allclose(float(losses_1[k]), float(losses_8[k]),
                                       rtol=5e-3, atol=1e-3)

    def test_faithful_sharded_matches_single_device(self, rng):
        """The reference-faithful step (cfg.step_mode='faithful', train.py
        --faithful) must hold the same sharded == single-device parity as the
        default vjp step: its gradient psums and global batch stats are
        psum-by-construction under GSPMD across BOTH generator forwards
        (round-5 verdict #4; kept out of __graft_entry__.dryrun_multichip
        because the two-forward graph doubles that artifact's compile time)."""
        cfg = tiny_cfg(batch_size=4)
        mesh = make_mesh(4)
        models = build_models(cfg)
        batch = make_batch(cfg, rng, b=4)
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        flags = StepFlags(False, False)
        _, _, losses_1, _ = train_step_faithful(
            cfg, models, state, batch, prevs, flags, jax.random.PRNGKey(1))
        batch_s = shard_batch(mesh, batch)
        _, _, losses_8, _ = train_step_faithful(
            cfg, models, replicate(mesh, state), batch_s,
            shard_batch(mesh, prevs), flags, jax.random.PRNGKey(1))
        for k in losses_1:
            np.testing.assert_allclose(float(losses_1[k]), float(losses_8[k]),
                                       rtol=5e-3, atol=1e-3)


class TestImagePoolStep:
    def test_pool_fakes_feed_discriminator(self, rng):
        """use_pool: D sees the supplied replay fakes where mask is set;
        the G losses are untouched (pool only affects the D update)."""
        cfg = tiny_cfg(pool_size=4)
        models = build_models(cfg)
        batch = make_batch(cfg, rng)
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        b, h, w = 2, cfg.height, cfg.width
        pool_fake = jnp.asarray(
            np.tanh(rng.randn(b, h, w, 3)).astype(np.float32))
        all_mask = jnp.ones((b, 1, 1, 1), bool)
        no_mask = jnp.zeros((b, 1, 1, 1), bool)
        batch_pool = dict(batch, pool_fake=pool_fake, pool_mask=all_mask)
        batch_nopool = dict(batch, pool_fake=pool_fake, pool_mask=no_mask)
        flags = StepFlags(False, False, use_pool=True)
        _, _, l_pool, _ = train_step(cfg, models, state, batch_pool, prevs,
                                     flags, jax.random.PRNGKey(1))
        _, _, l_nopool, _ = train_step(cfg, models, state, batch_nopool,
                                       prevs, flags, jax.random.PRNGKey(1))
        # D_fake differs (different fakes), G losses identical
        assert abs(float(l_pool["D_fake"]) - float(l_nopool["D_fake"])) > 1e-6
        np.testing.assert_allclose(float(l_pool["F_Warp"]),
                                   float(l_nopool["F_Warp"]))


class TestMixedPrecision:
    def test_bf16_train_step(self, rng):
        """bf16 compute policy: losses finite, f32 master params updated."""
        cfg = tiny_cfg(compute_dtype="bfloat16")
        models = build_models(cfg)
        batch = make_batch(cfg, rng)
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        new_state, _, losses, _ = train_step(
            cfg, models, state, batch, prevs, StepFlags(False, False),
            jax.random.PRNGKey(1))
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        leaf = jax.tree.leaves(new_state.params_G)[0]
        assert leaf.dtype == jnp.float32  # master weights stay f32
        assert not np.allclose(np.asarray(leaf),
                               np.asarray(jax.tree.leaves(state.params_G)[0]))
