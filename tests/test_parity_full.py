"""Full-size and eval-mode golden parity vs the torch reference.

Round-1 parity ran only at toy scale (ngf=4, 64px) in train mode.  These
tests close that gap (VERDICT r1 item 7):

* full-size: the real face config (ngf=32, 256px, n_downsample_G=5,
  n_adaptive_layers=4 — reference scripts/face/train_g1_256.sh defaults)
  forward parity with imported weights.
* eval-mode: running statistics captured from train-mode torch forwards,
  then eval-mode (running-stats) forward parity — the exact inference path
  (reference generator.py:396-422 + sync batchnorm eval branch).
* pose-config: the 6-channel DensePose+OpenPose generator wiring
  (fewshot_pose_dataset.py:23-25 channel arithmetic) at tiny scale.
"""
import copy

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_loader import load_reference_modules, make_reference_opt
from fsvid2vid_tpu.config import face_config, pose_config
from fsvid2vid_tpu.models.generator import FewShotGenerator
from fsvid2vid_tpu.utils.torch_port import import_fewshot_generator



pytestmark = pytest.mark.slow  # >60s on one CPU (see pytest.ini)
def build_pair(opt, cfg, seed=0):
    load_reference_modules()
    from models.networks.generator import FewShotGenerator as TorchG
    torch.manual_seed(seed)
    tnet = TorchG(opt)
    tnet.init_temporal_network()
    tnet = tnet.eval()

    jnet = FewShotGenerator(cfg)
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
    label = jnp.zeros((1, h, w, cl))
    refs_l = jnp.zeros((1, 1, h, w, cl))
    refs_i = jnp.zeros((1, 1, h, w, 3))
    prev_l = jnp.zeros((1, h, w, cl))
    prev_i = jnp.zeros((1, h, w, 3))
    variables = jnet.init(jax.random.PRNGKey(0), label, refs_l, refs_i,
                          prev_l, prev_i, warp_prev=True, train=False)
    variables = import_fewshot_generator(
        jax.device_get(dict(variables)), tnet.state_dict(), cfg)
    return tnet, jnet, variables


def run_both(tnet, jnet, variables, cfg, rng, train, prev=False):
    h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
    label = rng.randn(1, cl, h, w).astype(np.float32)
    ref_l = rng.randn(1, 1, cl, h, w).astype(np.float32)
    ref_i = np.tanh(rng.randn(1, 1, 3, h, w)).astype(np.float32)
    prevs = [None, None]
    jprev_l = jprev_i = None
    if prev:
        prev_l = rng.randn(1, cl, h, w).astype(np.float32)
        prev_i = np.tanh(rng.randn(1, 3, h, w)).astype(np.float32)
        prevs = [torch.from_numpy(prev_l), torch.from_numpy(prev_i)]
        jprev_l = jnp.asarray(prev_l.transpose(0, 2, 3, 1))
        jprev_i = jnp.asarray(prev_i.transpose(0, 2, 3, 1))

    tnet.train(train)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(label), torch.from_numpy(ref_l),
                     torch.from_numpy(ref_i), prevs, t=0)

    j_out, _ = jnet.apply(
        variables,
        jnp.asarray(label.transpose(0, 2, 3, 1)),
        jnp.asarray(ref_l.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(ref_i.transpose(0, 1, 3, 4, 2)),
        jprev_l, jprev_i, warp_prev=prev, train=train,
        mutable=["spectral", "batch_stats"])
    return t_out, j_out


class TestFullSizeParity:
    def test_full_size_face_forward(self, rng):
        """ngf=32, 256px, 4 adaptive layers — the shipping face config."""
        opt = make_reference_opt()
        cfg = face_config(is_train=False)
        assert cfg.ngf == opt.ngf == 32 and cfg.height == 256
        tnet, jnet, variables = build_pair(opt, cfg)
        t_out, j_out = run_both(copy.deepcopy(tnet), jnet, variables, cfg,
                                rng, train=True, prev=True)
        t_img, t_flow = t_out[0].numpy(), t_out[1]
        np.testing.assert_allclose(
            np.asarray(j_out["flow"][0]),
            t_flow[0].numpy().transpose(0, 2, 3, 1), atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(j_out["img_final"]),
            t_img.transpose(0, 2, 3, 1), atol=1e-2)

    def test_eval_mode_running_stats(self, rng):
        """Populate BN running stats with train-mode torch forwards, then
        compare the eval-mode (running-stats) forward — the real inference
        normalization path."""
        overrides = dict(ngf=4, nff=4, fineSize=64, loadSize=64, n_blocks_F=2,
                         n_downsample_G=3, n_adaptive_layers=2)
        opt = make_reference_opt(**overrides)
        cfg = face_config(ngf=4, nff=4, fine_size=64, load_size=64,
                          n_blocks_F=2, n_downsample_G=3,
                          n_adaptive_layers=2, is_train=False)
        tnet, jnet, variables = build_pair(opt, cfg)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        # burn-in: train-mode forwards update running_mean/var (and u/v)
        tnet.train()
        with torch.no_grad():
            for i in range(8):
                r = np.random.RandomState(100 + i)
                tnet(torch.from_numpy(r.randn(1, cl, h, w).astype(np.float32)),
                     torch.from_numpy(r.randn(1, 1, cl, h, w).astype(np.float32)),
                     torch.from_numpy(np.tanh(r.randn(1, 1, 3, h, w)).astype(np.float32)),
                     [None, None], t=0)
        # re-import the post-burn-in state (running stats + u/v)
        variables = import_fewshot_generator(
            jax.device_get(dict(variables)), tnet.state_dict(), cfg)
        t_out, j_out = run_both(tnet, jnet, variables, cfg, rng,
                                train=False, prev=False)
        t_img = t_out[0].numpy()
        assert np.isfinite(t_img).all()
        np.testing.assert_allclose(
            np.asarray(j_out["img_final"]),
            t_img.transpose(0, 2, 3, 1), atol=2e-2)


class TestPoseConfigParity:
    def test_pose_generator_forward(self, rng):
        """6-channel pose maps + 0.5 aspect ratio (H=2W) generator wiring."""
        opt = make_reference_opt(
            dataset_mode="fewshot_pose", input_nc=6, aspect_ratio=0.5,
            fineSize=64, loadSize=64, ngf=4, nff=4, n_blocks_F=2,
            n_downsample_G=3, n_adaptive_layers=2)
        cfg = pose_config(ngf=4, nff=4, fine_size=64, load_size=64,
                          n_blocks_F=2, n_downsample_G=3,
                          n_adaptive_layers=2, is_train=False,
                          refine_face=False, add_face_D=False)
        assert cfg.height == 2 * cfg.width
        tnet, jnet, variables = build_pair(opt, cfg, seed=2)
        t_out, j_out = run_both(copy.deepcopy(tnet), jnet, variables, cfg,
                                rng, train=True, prev=True)
        t_img = t_out[0].numpy()
        np.testing.assert_allclose(
            np.asarray(j_out["img_final"]),
            t_img.transpose(0, 2, 3, 1), atol=1e-2)
