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
    # util/html.py imports dominate at module scope; only needed when pages
    # are actually written, so a skeleton module suffices
    dom = types.ModuleType("dominate")
    dom.document = lambda *a, **k: None
    dom_tags = types.ModuleType("dominate.tags")
    for t in ("meta", "h3", "table", "tr", "td", "p", "a", "img", "br",
              "video", "source"):
        setattr(dom_tags, t, lambda *a, **k: None)
    dom.tags = dom_tags
    sys.modules.setdefault("dominate", dom)
    sys.modules.setdefault("dominate.tags", dom_tags)
    sys.path.insert(0, "/root/reference")
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False
    # input_process.get_part_mask / loss_collector allocate with
    # torch.cuda.ByteTensor/FloatTensor directly (input_process.py:74);
    # alias the CPU constructors so the pose paths run in this environment
    # (the attributes exist on CPU-only builds but raise when called)
    torch.cuda.ByteTensor = torch.ByteTensor
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    _LOADED = True


VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def build_torch_vgg19(seed=None):
    """A torch module whose `.features` matches torchvision vgg19.features
    layer indexing exactly (conv/ReLU/MaxPool sequence of cfg E) — lets the
    reference's VGG_Activations/Vgg19 run without torchvision.  With `seed`,
    weights are deterministically random (this environment cannot download
    the ImageNet checkpoint; an identical random VGG in both stacks is still
    the same perceptual loss function on both sides)."""
    import torch.nn as nn
    if seed is not None:
        torch.manual_seed(seed)
    layers, cin = [], 3
    for v in VGG19_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = v

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)

    return _VGG()


def save_random_vgg19(path, seed=0):
    """Seeded random torchvision-layout vgg19 state_dict (features.N.*)."""
    m = build_torch_vgg19(seed=seed)
    torch.save(m.state_dict(), path)
    return path


def install_vgg19_weights(path):
    """Point the torchvision shim's vgg19() at a real module loading `path`
    (state dict in torchvision features.N.* layout).  After this, reference
    code paths that construct VGGLoss work (loss.py:110)."""
    load_reference_modules()
    tv_models = sys.modules["torchvision.models"]

    def vgg19(pretrained=False, **kw):
        m = build_torch_vgg19()
        m.load_state_dict(torch.load(path, weights_only=True))
        return m.eval()

    tv_models.vgg19 = vgg19


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


def load_flownet2_reference():
    """Return the reference flownet2_pytorch `models` module with its three
    CUDA extensions (correlation_cuda, resample2d_cuda, channelnorm_cuda)
    replaced by pure-torch shims whose semantics match our XLA ops exactly
    (ops/cost_volume.py, ops/warp.py, ops/image_ops.channel_norm) — so a
    value mismatch in a parity test points at the conv-graph port, not at
    op edge semantics."""
    load_reference_modules()
    import torch
    import torch.nn.functional as F

    if "correlation_cuda" not in sys.modules:
        corr = types.ModuleType("correlation_cuda")

        def corr_forward(input1, input2, rbot1, rbot2, output, pad_size,
                         kernel_size, max_disp, stride1, stride2,
                         corr_multiply):
            assert kernel_size == 1 and stride1 == 1 and corr_multiply == 1
            b, c, h, w = input1.shape
            md = max_disp
            f2p = F.pad(input2, (md, md, md, md))
            d = md // stride2
            outs = []
            for dy in range(-d, d + 1):
                for dx in range(-d, d + 1):
                    sh = f2p[:, :, md + dy * stride2: md + dy * stride2 + h,
                             md + dx * stride2: md + dx * stride2 + w]
                    outs.append((input1 * sh).mean(1))
            res = torch.stack(outs, 1)
            output.resize_(res.shape).copy_(res)

        corr.forward = corr_forward
        sys.modules["correlation_cuda"] = corr

    if "resample2d_cuda" not in sys.modules:
        rs = types.ModuleType("resample2d_cuda")

        def rs_forward(input1, input2, output, kernel_size):
            assert kernel_size == 1
            b, c, h, w = input1.shape
            flow = input2.float()
            xs = torch.arange(w, dtype=torch.float32).view(1, 1, 1, w)
            ys = torch.arange(h, dtype=torch.float32).view(1, 1, h, 1)
            gx = (xs + flow[:, 0:1]) / max(w - 1, 1) * 2 - 1
            gy = (ys + flow[:, 1:2]) / max(h - 1, 1) * 2 - 1
            grid = torch.cat([gx, gy], 1).permute(0, 2, 3, 1)
            res = F.grid_sample(input1, grid, mode="bilinear",
                                padding_mode="border", align_corners=True)
            output.copy_(res)

        rs.forward = rs_forward
        sys.modules["resample2d_cuda"] = rs

    if "channelnorm_cuda" not in sys.modules:
        cn = types.ModuleType("channelnorm_cuda")

        def cn_forward(input1, output, norm_deg):
            assert norm_deg == 2
            output.copy_(input1.pow(2).sum(1, keepdim=True).sqrt())

        cn.forward = cn_forward
        sys.modules["channelnorm_cuda"] = cn

    import models.networks.flownet2_pytorch.models as fn2_models
    return fn2_models
