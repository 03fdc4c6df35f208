"""V100 roofline bound for the torch reference generator (VERDICT r2 #7).

Replaces the "V100 ≈ CPU × 30-100" folklore with arithmetic.  Method:

1.  Build the REAL reference generator (via tests/reference_loader, the same
    shimmed import used by the parity suite) at the flagship config
    (face 512px, K=1) and run its cached-weights inference path (t>0 frame,
    the steady-state serving step, generator.py:415-418).
2.  Count, per frame, with a TorchDispatchMode intercepting EVERY aten op
    the eager execution dispatches (convs, norms, elementwise, interpolate,
    grid_sample — nothing escapes, unlike module hooks):
      * conv/matmul FLOPs from aten.convolution/addmm/mm/bmm shapes (the
        same quantity XLA's cost analysis reports for our stack);
      * eager-mode HBM bytes: in eager torch every dispatched op reads its
        tensor inputs and writes its outputs through HBM (no inter-op
        fusion), so traffic = sum over ops of (in+out elements) * 2 B
        (fp16 assumed — the best case for the reference under AMP);
      * kernel launches: one per dispatched op (a lower bound; cuDNN convs
        often launch several).
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


def make_counter():
    """TorchDispatchMode summing bytes / launches / matmul-conv FLOPs over
    every dispatched aten op."""
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
                return out  # metadata-only / alloc: no HBM pass in steady state
            stats["launches"] += 1
            op_bytes = (tensor_elems(args) + tensor_elems(out)) * BYTES
            stats["bytes"] += op_bytes
            op_flops = 0
            if name == "convolution":
                inp, w = args[0], args[1]
                co = w.shape[0]
                groups = args[8] if len(args) > 8 else 1
                ci_k = int(np.prod(w.shape[1:]))  # cin/groups * kh * kw
                if torch.is_tensor(out):
                    spatial = int(np.prod(out.shape[2:]))
                    op_flops = 2 * out.shape[0] * co * spatial * ci_k
                del groups
            elif name in ("addmm", "mm"):
                a, b = (args[1], args[2]) if name == "addmm" else (args[0], args[1])
                op_flops = 2 * a.shape[0] * a.shape[1] * b.shape[1]
            elif name == "bmm":
                a, b = args[0], args[1]
                op_flops = 2 * a.shape[0] * a.shape[1] * a.shape[2] * b.shape[2]
            stats["flops"] += op_flops
            # eager kernels serialize on one CUDA stream: per-op time is the
            # max of its own three ceilings, and op times add
            stats["serial_s"] += max(op_flops / V100_FP16_FLOPS,
                                     op_bytes / V100_HBM_BPS, LAUNCH_S)
            return out

    return Counter(), stats


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

    counter, stats = make_counter()
    with torch.no_grad():
        # t=0: computes + caches the adaptive weights
        netG(label, ref_l, ref_i, prev=[prev_l, prev_i], t=0)
        # t=1: the steady-state frame (cached weights, generator.py:415-418)
        with counter:
            netG(label, ref_l, ref_i, prev=[prev_l, prev_i], t=1)

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
        "t_serialized_eager_ms": stats["serial_s"] * 1e3,
        "v100_fps_upper_bound": 1.0 / t_floor,
        "v100_fps_serialized_estimate": 1.0 / stats["serial_s"],
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
