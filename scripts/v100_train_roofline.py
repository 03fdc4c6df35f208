"""V100 roofline bound for one reference TRAINING iteration (VERDICT r3 #3).

Training twin of scripts/v100_roofline.py: builds the REAL reference
Vid2VidModel (shimmed import, same as the parity suite) and counts one
full training iteration exactly as train.py:44-62 executes it:

  [teacher]  FlowNet2 pseudo-GT flow, no_grad (flownet.py:34-79):
             prev-frame flow (temporal phase) + reference flow (warp_ref)
  [D step]   model(mode='discriminator'): no-grad generation + D losses
             (vid2vid_model.py:108-110), loss_backward -> optimizer_D.step()
  [G step]   model(mode='generator'): generation with grads + all losses
             (vid2vid_model.py:62-103), loss_backward -> optimizer_G.step()

Counted per op with a TorchDispatchMode (nothing escapes — autograd backward
kernels dispatch through it too):
  * matmul/conv FLOPs from aten.convolution{,_backward}/addmm/mm/bmm shapes
    (convolution_backward counts dgrad+wgrad, each equal to the fwd conv);
  * eager HBM bytes: every dispatched op reads inputs + writes outputs
    through HBM (no inter-op fusion in eager mode), fp16 assumed (the best
    case for the reference under AMP);
  * kernel launches: one per dispatched op (lower bound).

Roofline on V100-SXM2 specs (125 TFLOP/s fp16 TC, 900 GB/s HBM2, 5 us/launch):
  ideal overlap:    t >= max(flops/peak, bytes/bw, launches*5us)
  serialized eager: t >= sum_op max(op_flops/peak, op_bytes/bw, 5us)

Configs mirror scripts/train_bench.py (our committed numbers):
  face: face-256 bs4, VGG on, temporal phase        (ours: 147.2 ms/step)
  pose: pose-512x256 bs4, face D + refiner + VGG,
        remove_face_labels, temporal phase          (ours: 537.9 ms/step)
Note our benched step excludes the frozen teacher (flow_gt=None), so the
teacher is reported as a separate term on the torch side; compare
generator-iteration to generator-iteration, and add the teacher term to both
sides when comparing full-pipeline rates.

Usage: python scripts/v100_train_roofline.py [face|pose|both] [--json OUT]
Runs on CPU; only shapes matter (pose on CPU takes a few minutes).
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

V100_FP16_FLOPS = 125e12
V100_HBM_BPS = 900e9
LAUNCH_S = 5e-6
BYTES = 2  # fp16

VGG_PATH = "/tmp/train_roofline_vgg19.pt"


def make_counter():
    import torch
    from torch.utils._python_dispatch import TorchDispatchMode

    stats = dict(flops=0, bytes=0, launches=0, serial_s=0.0)

    def tensor_elems(x):
        n = 0
        if torch.is_tensor(x):
            n += x.numel()
        elif isinstance(x, (list, tuple)):
            n += sum(tensor_elems(e) for e in x)
        return n

    def conv_flops(n, co, spatial, ci_k):
        return 2 * n * co * spatial * ci_k

    class Counter(TorchDispatchMode):
        def __torch_dispatch__(self, func, types, args=(), kwargs=None):
            kwargs = kwargs or {}
            out = func(*args, **kwargs)
            name = func.overloadpacket.__name__
            if name in ("detach", "t", "view", "_unsafe_view", "reshape",
                        "alias", "expand", "permute", "transpose",
                        "unsqueeze", "squeeze", "split", "chunk", "select",
                        "slice", "empty", "empty_like", "zeros", "ones",
                        "_local_scalar_dense", "lift_fresh", "clone"):
                return out
            stats["launches"] += 1
            op_bytes = (tensor_elems(args) + tensor_elems(out)) * BYTES
            stats["bytes"] += op_bytes
            op_flops = 0
            if name == "convolution":
                inp, w = args[0], args[1]
                if torch.is_tensor(out):
                    op_flops = conv_flops(
                        out.shape[0], w.shape[0],
                        int(np.prod(out.shape[2:])),
                        int(np.prod(w.shape[1:])))
            elif name == "convolution_backward":
                # (grad_out, input, weight, bias_sizes, stride, padding,
                #  dilation, transposed, output_padding, groups, output_mask)
                g, w = args[0], args[2]
                mask = args[-1]
                fwd = conv_flops(g.shape[0], w.shape[0],
                                 int(np.prod(g.shape[2:])),
                                 int(np.prod(w.shape[1:])))
                op_flops = fwd * (int(bool(mask[0])) + int(bool(mask[1])))
            elif name in ("addmm", "mm"):
                a, b = (args[1], args[2]) if name == "addmm" else (args[0],
                                                                   args[1])
                op_flops = 2 * a.shape[0] * a.shape[1] * b.shape[1]
            elif name == "bmm":
                a, b = args[0], args[1]
                op_flops = 2 * a.shape[0] * a.shape[1] * a.shape[2] * b.shape[2]
            stats["flops"] += op_flops
            stats["serial_s"] += max(op_flops / V100_FP16_FLOPS,
                                     op_bytes / V100_HBM_BPS, LAUNCH_S)
            return out

    return Counter(), stats


def pose_label_np(rng, b, h, w):
    """6ch pose map with a plausible DensePose part channel (face + torso)
    and openpose channels on the face, so face-box extraction and part masks
    behave as on real data (tests/test_pose_training.py::pose_label)."""
    lbl = rng.randn(b, h, w, 6).astype(np.float32) * 0.1
    part = np.zeros((b, h, w), np.float32)
    part[:, h // 8: h // 4, w // 3: 2 * w // 3] = 23 / 24 * 2 - 1
    part[:, h // 4: 7 * h // 8, w // 3: 2 * w // 3] = 2 / 24 * 2 - 1
    lbl[..., 2] = part
    lbl[:, h // 8: h // 4, w // 3: 2 * w // 3, 3:] = 0.5
    return lbl


def build_model(which, bs):
    from reference_loader import (load_reference_modules, make_reference_opt,
                                  install_vgg19_weights, save_random_vgg19)
    load_reference_modules()
    save_random_vgg19(VGG_PATH, seed=0)
    install_vgg19_weights(VGG_PATH)
    import torch

    torch.nn.Module.cuda = lambda self, *a, **k: self  # CPU run
    # pose loss path constructs masks via torch.cuda.ByteTensor
    # (input_process.py:74); alias to the CPU constructor
    torch.cuda.ByteTensor = torch.ByteTensor
    torch.cuda.FloatTensor = torch.FloatTensor

    common = dict(
        isTrain=True, batchSize=bs, gan_mode="hinge",
        lambda_feat=10.0, lambda_vgg=10.0, lambda_flow=10.0,
        lambda_mask=10.0, lambda_temp=0.0, lambda_face=10.0, lambda_kld=0.0,
        lr=4e-4, beta1=0.5, beta2=0.999, no_TTUR=False, amp="O0",
        distributed=False, continue_train=False, load_pretrain="",
        n_frames_D=2, n_frames_per_gpu=1, niter_single=0, niter=1000,
        niter_decay=0, pose_type="both", finetune=False,
        checkpoints_dir="/tmp/train_roofline_ckpt", name="ref",
        no_vgg_loss=False, no_flow_gt=False, no_ganFeat_loss=False,
        print_G=False, print_D=False, which_epoch="latest", beta=0.999,
        debug=False, no_html=True, tf_log=False, use_visdom=False,
        display_winsize=256, model_idx=0)
    if which == "pose":
        # scripts/pose/train_g8.sh flags + refine_face (our benched config)
        opt = make_reference_opt(
            dataset_mode="fewshot_pose", label_nc=0, input_nc=6,
            aspect_ratio=0.5, fineSize=256, loadSize=256,
            add_face_D=True, refine_face=True, remove_face_labels=True,
            basic_point_only=False, densepose_only=False, **common)
    else:
        opt = make_reference_opt(
            dataset_mode="fewshot_face", fineSize=256, loadSize=256,
            add_face_D=False, refine_face=False, remove_face_labels=False,
            **common)

    import os
    os.makedirs(f"{common['checkpoints_dir']}/{common['name']}",
                exist_ok=True)
    torch.manual_seed(0)
    # base_model.py:45 passes beta1=0 (int); modern torch requires floats
    _Adam = torch.optim.Adam

    def adam_float_betas(params, lr, betas=(0.9, 0.999), **kw):
        return _Adam(params, lr=lr,
                     betas=(float(betas[0]), float(betas[1])), **kw)
    torch.optim.Adam = adam_float_betas
    from models.vid2vid_model import Vid2VidModel
    model = Vid2VidModel()
    model.initialize(opt, epoch=0)
    # temporal phase (epoch > niter_single): netDT + temporal flow net +
    # rebuilt optimizers (base_model.py:259-279)
    model.init_temporal_model()
    torch.optim.Adam = _Adam
    return model, opt


def make_batch(which, opt, bs, h, w):
    import torch
    rng = np.random.RandomState(0)
    cl = opt.input_nc
    if which == "pose":
        lab = pose_label_np(rng, bs * 2, h, w).transpose(0, 3, 1, 2)
    else:
        lab = rng.randn(bs * 2, cl, h, w).astype(np.float32)
    tl = torch.from_numpy(lab[:bs])[:, None]
    rl = torch.from_numpy(lab[bs:])[:, None]
    ti = torch.tanh(torch.randn(bs, 1, 3, h, w))
    ri = torch.tanh(torch.randn(bs, 1, 3, h, w))
    return tl, ti, rl, ri


def run_iteration(model, opt, data_list_t):
    """One train.py iteration body (train.py:55-62): D step then G step."""
    from models.loss_collector import loss_backward
    d_losses = model(data_list_t, mode="discriminator")
    loss_backward(opt, d_losses, model.optimizer_D, 1)
    g_losses, _, data_prev = model(data_list_t, mode="generator")
    loss_backward(opt, g_losses, model.optimizer_G, 0)
    return data_prev


def count_teacher(opt, ti, ri, counter):
    """FlowNet2 pseudo-GT pass (flownet.py:42-49, temporal phase: prev-frame
    flow + reference flow), counted under `counter`.  Random weights — only
    shapes matter.  Inputs are resized to /64 multiples (flownet.py:67-71);
    256-multiples here, so no resize ops."""
    import torch
    from reference_loader import load_flownet2_reference
    fl2 = load_flownet2_reference()
    from models.networks.flownet2_pytorch.networks.resample2d_package import (
        resample2d)

    class Args:
        rgb_max = 1.0
        fp16 = False

    net = fl2.FlowNet2(Args()).eval()
    resample = resample2d.Resample2d()

    def flow_and_conf(im1, im2):
        data = torch.cat([im1.unsqueeze(2), im2.unsqueeze(2)], dim=2)
        flow = net(data)
        conf = ((im1 - resample(im2.contiguous(), flow)) ** 2).sum(
            1, keepdim=True) < 0.02
        return flow, conf.float()

    im_now = ti[:, 0]
    im_ref = ri[:, 0]
    im_prev = ti[:, 0]  # n=1 frame/gpu: prev == rolled self (flownet.py:43)
    with torch.no_grad(), counter:
        flow_prev, conf_prev = flow_and_conf(im_now, im_prev)
        flow_ref, conf_ref = flow_and_conf(im_now, im_ref)
    return ([flow_ref[:, None], flow_prev[:, None]],
            [conf_ref[:, None], conf_prev[:, None]])


def roofline(stats):
    t_c = stats["flops"] / V100_FP16_FLOPS
    t_m = stats["bytes"] / V100_HBM_BPS
    t_l = stats["launches"] * LAUNCH_S
    return dict(
        flops=stats["flops"], bytes=stats["bytes"],
        launches=stats["launches"],
        t_compute_ms=t_c * 1e3, t_memory_ms=t_m * 1e3,
        t_launch_ms=t_l * 1e3,
        t_ideal_ms=max(t_c, t_m, t_l) * 1e3,
        t_serialized_ms=stats["serial_s"] * 1e3,
        binding_term=max([("compute", t_c), ("memory", t_m),
                          ("launch", t_l)], key=lambda kv: kv[1])[0])


def run_config(which, bs):
    print(f"=== {which} bs{bs} ===", flush=True)
    model, opt = build_model(which, bs)
    h = int(opt.fineSize / opt.aspect_ratio)
    w = opt.fineSize
    tl, ti, rl, ri = make_batch(which, opt, bs, h, w)

    # teacher counted on its own
    t_counter, t_stats = make_counter()
    flow_gt, conf_gt = count_teacher(opt, ti, ri, t_counter)
    print(f"[teacher counted: {t_stats['flops']/1e9:.1f} GF "
          f"{t_stats['bytes']/1e9:.2f} GB {t_stats['launches']} launches]",
          flush=True)

    data_list = [tl, ti, flow_gt, conf_gt, rl, ri]
    # warmup iteration (t=0, prevs None): warms Adam state + yields prevs so
    # the counted iteration is the temporal-phase steady state
    prevs = run_iteration(model, opt, data_list + [None, None, None])
    print("[warmup iteration done]", flush=True)

    counter, stats = make_counter()
    with counter:
        run_iteration(model, opt, data_list + list(prevs))
    gen = roofline(stats)
    teach = roofline(t_stats)

    both = {k: stats[k] + t_stats[k]
            for k in ("flops", "bytes", "launches", "serial_s")}
    tot = roofline(both)
    res = dict(config=f"{which} {h}x{w} bs{bs}, temporal-phase iteration",
               generator_iteration=gen, flow_teacher=teach, total=tot,
               v100_steps_per_s_ideal=1e3 / tot["t_ideal_ms"],
               v100_samples_per_s_ideal=bs * 1e3 / tot["t_ideal_ms"],
               v100_samples_per_s_serialized=bs * 1e3 / tot["t_serialized_ms"])
    print(json.dumps(res, indent=2), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="both",
                    choices=["face", "pose", "both"])
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    out = {}
    for which in (["face", "pose"] if args.which == "both" else [args.which]):
        out[which] = run_config(which, args.bs)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
