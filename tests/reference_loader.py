"""Test-only helper: load the reference torch implementation from
/root/reference with apex/torchvision shimmed out, for use as a parity oracle.
The framework itself never imports this."""
import sys
import types

import torch

_LOADED = False


def load_reference_modules():
    global _LOADED
    if _LOADED:
        sys.path.insert(0, "/root/reference")
        return
    apex = types.ModuleType("apex")
    apex_parallel = types.ModuleType("apex.parallel")
    apex_parallel.SyncBatchNorm = torch.nn.BatchNorm2d
    apex.parallel = apex_parallel
    sys.modules.setdefault("apex", apex)
    sys.modules.setdefault("apex.parallel", apex_parallel)
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")

    def _no_vgg(*a, **k):
        raise RuntimeError("torchvision unavailable in tests")

    tv_models.vgg19 = _no_vgg
    tv.models = tv_models
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv_models)
    sys.path.insert(0, "/root/reference")
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False
    _LOADED = True


def make_reference_opt(**overrides):
    """Face-256 default opt namespace (scripts/face/test_256.sh flags)."""
    opt = types.SimpleNamespace(
        dataset_mode="fewshot_face", label_nc=0, input_nc=1, output_nc=3,
        aspect_ratio=1.0, fineSize=256, loadSize=256,
        netG="fewshot", n_downsample_G=5, ngf=32,
        norm_G="spectralspadesyncbatch", conv_ks=3, embed_ks=1, spade_ks=1,
        netS="encoderdecoder", use_label_ref="mul", res_for_ref=False,
        adaptive_conv=False, adaptive_spade=True, no_adaptive_embed=False,
        n_adaptive_layers=4, n_fc_layers=2, n_frames_G=2,
        n_downsample_F=3, nff=32, n_blocks_F=6, norm_F="spectralsyncbatch",
        flow_multiplier=20, spade_combine=True, n_sc_layers=2, sc_arch="unet",
        add_raw_output_loss=False, sep_flow_prev=False, no_sep_warp_embed=False,
        n_shot=1, n_downsample_A=2, warp_ref=True, lambda_kld=0.0,
        for_face=False, isTrain=False, init_type="xavier", init_variance=0.02,
        gpu_ids=[], batchSize=1, which_model_netD="multiscale",
        netD_subarch="n_layers", num_D=1, n_layers_D=4, ndf=32,
        norm_D="spectralinstance", adaptive_D_layers=1, finetune=False)
    for k, v in overrides.items():
        setattr(opt, k, v)
    return opt
