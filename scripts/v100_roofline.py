"""V100 roofline bound for the torch reference generator (VERDICT r2 #7).

Replaces the "V100 ≈ CPU × 30-100" folklore with arithmetic.  Method:

1.  Build the REAL reference generator (via tests/reference_loader, the same
    shimmed import used by the parity suite) at the flagship config
    (face 512px, K=1) and run its cached-weights inference path (t>0 frame,
    the steady-state serving step, generator.py:415-418).
2.  Count, per frame:
      * conv/linear FLOPs analytically from each module's shapes (the same
        quantity XLA's cost analysis reports for our stack);
      * eager-mode HBM bytes: in eager torch every leaf module's inputs and
        outputs cross HBM (no inter-op fusion beyond cuDNN's conv+bias), so
        traffic >= sum over leaf calls of (in+out elements) * dtype bytes.
        fp16 (2 B) is assumed — the best case for the reference under AMP.
      * kernel launches: >= one per leaf call (elementwise chains inside a
        leaf add more; we count 1 — again the best case).
3.  Roofline on V100-SXM2 specs: 125 TFLOP/s fp16 tensor cores, 900 GB/s
    HBM2, ~5 us per kernel launch (CUDA driver, no CUDA graphs — the
    reference predates them).
      t_frame >= max(FLOPs / 125e12, bytes / 900e9, launches * 5e-6)

The max() of independent ceilings is an UPPER bound on achievable fps (real
execution overlaps imperfectly and cuDNN rarely sustains peak on
small-batch 3x3 convs), so "reference V100 fps <= bound" is safe to cite.

Usage: python scripts/v100_roofline.py [--size 512] [--json OUT]
Runs on CPU; only shapes matter.
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

V100_FP16_FLOPS = 125e12     # TFLOP/s, tensor cores (NVIDIA V100 datasheet)
V100_HBM_BPS = 900e9         # GB/s HBM2
LAUNCH_S = 5e-6              # per-kernel launch overhead, no CUDA graphs
BYTES = 2                    # fp16


def conv_flops(mod, inp, out):
    import torch.nn as nn
    if isinstance(mod, (nn.Conv2d, nn.ConvTranspose2d)):
        co = out.shape[1]
        spatial = int(np.prod(out.shape[2:]))
        ci_k = mod.in_channels // mod.groups * int(np.prod(mod.kernel_size))
        return 2 * out.shape[0] * co * spatial * ci_k
    if isinstance(mod, nn.Linear):
        return 2 * int(np.prod(inp.shape[:-1])) * mod.in_features * mod.out_features
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    from reference_loader import load_reference_modules, make_reference_opt
    load_reference_modules()
    import torch
    from models.networks.generator import FewShotGenerator

    opt = make_reference_opt(
        fineSize=args.size, loadSize=args.size, isTrain=False,
        adaptive_spade=True, warp_ref=True, spade_combine=True,
        label_nc=0, input_nc=1, aspect_ratio=1.0, batchSize=1,
        dataset_mode="fewshot_face")
    torch.manual_seed(0)
    netG = FewShotGenerator(opt).eval()

    h = w = args.size
    label = torch.randn(1, 1, h, w)
    ref_l = torch.randn(1, 1, 1, h, w)
    ref_i = torch.tanh(torch.randn(1, 1, 3, h, w))
    prev_l = torch.randn(1, 1 * (opt.n_frames_G - 1), h, w)
    prev_i = torch.tanh(torch.randn(1, 3 * (opt.n_frames_G - 1), h, w))

    stats = dict(flops=0, bytes=0, launches=0)

    def hook(mod, inputs, output):
        outs = output if isinstance(output, (tuple, list)) else (output,)
        n_el = sum(int(t.numel()) for t in inputs
                   if torch.is_tensor(t))
        n_el += sum(int(t.numel()) for t in outs if torch.is_tensor(t))
        stats["bytes"] += n_el * BYTES
        stats["launches"] += 1
        ins = [t for t in inputs if torch.is_tensor(t)]
        if ins and torch.is_tensor(outs[0]):
            stats["flops"] += conv_flops(mod, ins[0], outs[0])

    handles = []
    for m in netG.modules():
        if len(list(m.children())) == 0 and len(list(m.parameters())) >= 0:
            handles.append(m.register_forward_hook(hook))

    with torch.no_grad():
        # t=0: computes + caches the adaptive weights
        netG(label, ref_l, ref_i, prev_l, prev_i, t=0)
        for k in stats:
            stats[k] = 0
        # t=1: the steady-state frame (cached weights, generator.py:415-418)
        netG(label, ref_l, ref_i, prev_l, prev_i, t=1)
    for hd in handles:
        hd.remove()

    t_compute = stats["flops"] / V100_FP16_FLOPS
    t_memory = stats["bytes"] / V100_HBM_BPS
    t_launch = stats["launches"] * LAUNCH_S
    t_floor = max(t_compute, t_memory, t_launch)
    res = {
        "config": f"face {args.size}px K=1, steady-state frame (t>0)",
        "flops_per_frame": stats["flops"],
        "eager_hbm_bytes_per_frame": stats["bytes"],
        "kernel_launches_per_frame": stats["launches"],
        "t_compute_ms": t_compute * 1e3,
        "t_memory_ms": t_memory * 1e3,
        "t_launch_ms": t_launch * 1e3,
        "v100_fps_upper_bound": 1.0 / t_floor,
        "binding_term": max(
            [("compute", t_compute), ("memory", t_memory),
             ("launch", t_launch)], key=lambda kv: kv[1])[0],
    }
    print(json.dumps(res, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
