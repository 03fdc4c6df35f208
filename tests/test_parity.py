"""Golden output-parity tests: run the torch reference FewShotGenerator and
our flax implementation with IMPORTED weights on identical inputs and compare
outputs (the BASELINE.json north-star: frame-for-frame match)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_loader import load_reference_modules, make_reference_opt
from fsvid2vid_tpu.config import face_config
from fsvid2vid_tpu.models.generator import FewShotGenerator
from fsvid2vid_tpu.utils.torch_port import import_fewshot_generator


def tiny_opt_and_cfg(**ov):
    overrides = dict(ngf=4, nff=4, fineSize=64, loadSize=64, n_blocks_F=2,
                     n_downsample_G=3, n_adaptive_layers=2)
    overrides.update(ov)
    opt = make_reference_opt(**overrides)
    cfg = face_config(
        ngf=opt.ngf, nff=opt.nff, fine_size=opt.fineSize,
        load_size=opt.loadSize, n_blocks_F=opt.n_blocks_F,
        n_downsample_G=opt.n_downsample_G,
        n_adaptive_layers=opt.n_adaptive_layers, n_shot=opt.n_shot,
        is_train=False)
    return opt, cfg


@pytest.fixture(scope="module")
def pair():
    load_reference_modules()
    from models.networks.generator import FewShotGenerator as TorchG
    opt, cfg = tiny_opt_and_cfg()
    torch.manual_seed(0)
    tnet = TorchG(opt)
    # temporal branches exist from the start on our side; initialize them on
    # the torch side too (prev embedding is copied from the ref embedding,
    # generator.py:177) so one state_dict covers both tests.
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
    return opt, cfg, tnet, jnet, variables


class TestGeneratorParity:
    def test_full_forward_matches_torch(self, pair, rng):
        import copy
        opt, cfg, tnet, jnet, variables = pair
        tnet = copy.deepcopy(tnet)  # train-mode forward mutates u/v in place
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        label = rng.randn(1, cl, h, w).astype(np.float32)
        ref_l = rng.randn(1, 1, cl, h, w).astype(np.float32)
        ref_i = np.tanh(rng.randn(1, 1, 3, h, w)).astype(np.float32)

        # train mode on both sides: at random init the eval path (identity
        # running stats) explodes to NaN in the REFERENCE itself; train-mode
        # batch statistics keep magnitudes sane.  Both run one deterministic
        # spectral power iteration from the same imported u/v.
        tnet.train()
        with torch.no_grad():
            t_out = tnet(torch.from_numpy(label), torch.from_numpy(ref_l),
                         torch.from_numpy(ref_i), [None, None], t=0)
        t_img, t_flow, t_mask = t_out[0], t_out[1], t_out[2]

        j_out, _ = jnet.apply(
            variables,
            jnp.asarray(label.transpose(0, 2, 3, 1)),
            jnp.asarray(ref_l.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(ref_i.transpose(0, 1, 3, 4, 2)),
            None, None, warp_prev=False, train=True,
            mutable=["spectral", "batch_stats"])

        np.testing.assert_allclose(
            np.asarray(j_out["flow"][0]),
            t_flow[0].numpy().transpose(0, 2, 3, 1), atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(j_out["flow_mask"][0]),
            t_mask[0].numpy().transpose(0, 2, 3, 1), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(j_out["img_final"]),
            t_img.numpy().transpose(0, 2, 3, 1), atol=1e-2)

    def test_temporal_forward_matches_torch(self, pair, rng):
        opt, cfg, tnet, jnet, variables = pair
        import copy
        tnet2 = copy.deepcopy(tnet)
        tnet2.train()
        # temporal net shares ref-flow params (n_frames_G=2, warp_ref)
        h, w, cl = cfg.height, cfg.width, cfg.gen_input_nc
        label = rng.randn(1, cl, h, w).astype(np.float32)
        ref_l = rng.randn(1, 1, cl, h, w).astype(np.float32)
        ref_i = np.tanh(rng.randn(1, 1, 3, h, w)).astype(np.float32)
        prev_l = rng.randn(1, cl, h, w).astype(np.float32)
        prev_i = np.tanh(rng.randn(1, 3, h, w)).astype(np.float32)

        with torch.no_grad():
            t_out = tnet2(torch.from_numpy(label), torch.from_numpy(ref_l),
                          torch.from_numpy(ref_i),
                          [torch.from_numpy(prev_l), torch.from_numpy(prev_i)],
                          t=0)
        t_img = t_out[0]

        j_out, _ = jnet.apply(
            variables,
            jnp.asarray(label.transpose(0, 2, 3, 1)),
            jnp.asarray(ref_l.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(ref_i.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(prev_l.transpose(0, 2, 3, 1)),
            jnp.asarray(prev_i.transpose(0, 2, 3, 1)),
            warp_prev=True, train=True,
            mutable=["spectral", "batch_stats"])
        np.testing.assert_allclose(
            np.asarray(j_out["img_final"]),
            t_img.numpy().transpose(0, 2, 3, 1), atol=1e-2)


class TestDiscriminatorParity:
    def test_nlayer_d_matches_torch(self, rng):
        """Import a torch MultiscaleDiscriminator and compare logits."""
        load_reference_modules()
        import models.networks as ref_networks
        from fsvid2vid_tpu.models.discriminator import MultiscaleDiscriminator
        from fsvid2vid_tpu.utils.torch_port import import_discriminator
        opt, cfg = tiny_opt_and_cfg()
        torch.manual_seed(1)
        tD = ref_networks.define_D(opt, 4, opt.ndf, opt.n_layers_D,
                                   opt.norm_D, "n_layers", 2, True)
        jD = MultiscaleDiscriminator(cfg, input_nc=4, ndf=opt.ndf,
                                     n_layers=opt.n_layers_D, num_D=2)
        x = rng.randn(2, 4, 64, 64).astype(np.float32)
        variables = jD.init(jax.random.PRNGKey(0),
                            jnp.asarray(x.transpose(0, 2, 3, 1)))
        variables = import_discriminator(
            jax.device_get(dict(variables)), tD.state_dict())
        tD.eval()
        with torch.no_grad():
            t_out = tD(torch.from_numpy(x))
        j_out = jD.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False, mutable=False)
        for s in range(2):
            for l in range(len(j_out[s])):
                np.testing.assert_allclose(
                    np.asarray(j_out[s][l]),
                    t_out[s][l].numpy().transpose(0, 2, 3, 1), atol=2e-3,
                    err_msg=f"scale {s} layer {l}")
