#!/usr/bin/env python
"""Training CLI (reference train.py): few-shot vid2vid training on TPU.

Usage mirrors the reference scripts, e.g.
  python train.py --name face --dataset_mode fewshot_face \
      --adaptive_spade --warp_ref --spade_combine --batchSize 4
  python train.py --name pose --dataset_mode fewshot_pose --adaptive_spade \
      --warp_ref --spade_combine --remove_face_labels --add_face_D
  python train.py --name street --dataset_mode fewshot_street \
      --adaptive_spade --loadSize 512 --fineSize 512

The argparse surface keeps the reference flag names; parsed flags override the
per-workload preset (the dataset option-injection of base_options.py:142-151).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # experiment
    p.add_argument("--name", type=str, default="experiment")
    p.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
    p.add_argument("--dataset_mode", type=str, default="fewshot_face")
    p.add_argument("--dataroot", type=str, default=None)
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    # sizes
    p.add_argument("--batchSize", dest="batch_size", type=int, default=None)
    p.add_argument("--loadSize", dest="load_size", type=int, default=None)
    p.add_argument("--fineSize", dest="fine_size", type=int, default=None)
    # generator
    p.add_argument("--ngf", type=int, default=None)
    p.add_argument("--ndf", type=int, default=None)
    p.add_argument("--n_downsample_G", type=int, default=None)
    p.add_argument("--n_adaptive_layers", type=int, default=None)
    p.add_argument("--adaptive_spade", action="store_true")
    p.add_argument("--adaptive_conv", action="store_true")
    p.add_argument("--no_adaptive_embed", action="store_true")
    p.add_argument("--warp_ref", action="store_true")
    p.add_argument("--spade_combine", action="store_true")
    p.add_argument("--add_raw_output_loss", action="store_true")
    p.add_argument("--n_shot", type=int, default=None)
    p.add_argument("--num_D", type=int, default=None)
    p.add_argument("--netD_subarch", type=str, default=None)
    # pose flags
    p.add_argument("--remove_face_labels", action="store_true")
    p.add_argument("--add_face_D", action="store_true")
    p.add_argument("--refine_face", action="store_true")
    p.add_argument("--basic_point_only", action="store_true")
    p.add_argument("--pose_type", type=str, default=None)
    # schedule
    p.add_argument("--niter", type=int, default=None)
    p.add_argument("--niter_decay", type=int, default=None)
    p.add_argument("--niter_single", type=int, default=None)
    p.add_argument("--niter_step", type=int, default=None)
    p.add_argument("--n_frames_total", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--no_TTUR", action="store_true")
    p.add_argument("--no_vgg_loss", action="store_true")
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize generator up blocks in the backward "
                        "(halves activation memory; pose default)")
    p.add_argument("--no_flow_gt", action="store_true")
    p.add_argument("--sn_power_iters", type=int, default=None,
                   help="spectral power iterations per step (2 matches the "
                        "reference's effective advancement; docs/CONVERGENCE.md)")
    p.add_argument("--faithful", action="store_true",
                   help="reference-faithful alternation (two generator "
                        "forwards per iteration, every-step loss parity with "
                        "torch — cfg.step_mode='faithful'; the default "
                        "single-vjp step is one forward cheaper)")
    p.add_argument("--lambda_temp", type=float, default=None)
    p.add_argument("--load_pretrain", type=str, default=None,
                   help="checkpoint dir to warm-start network weights from "
                        "(reference train_options.py:16)")
    p.add_argument("--pool_size", type=int, default=None,
                   help="fake-image replay pool size for the D update "
                        "(reference hard-codes 0 = disabled)")
    # observability (reference train_options.py:18-23)
    p.add_argument("--print_freq", type=int, default=None)
    p.add_argument("--display_freq", type=int, default=None)
    p.add_argument("--save_latest_freq", type=int, default=None)
    p.add_argument("--save_epoch_freq", type=int, default=None)
    p.add_argument("--tf_log", action="store_true",
                   help="TensorBoard scalar curves (reference --tf_log)")
    # runtime
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pod "
                        "slice; replaces reference util/distributed.py NCCL "
                        "init). On TPU pods all coordinates auto-detect.")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (non-TPU backends)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--num_workers", type=int, default=None)
    p.add_argument("--flownet_ckpt", type=str, default="",
                   help="path to FlowNet2_checkpoint.pth.tar (torch)")
    p.add_argument("--vgg_ckpt", type=str, default="",
                   help="path to torchvision vgg19 state_dict (torch)")
    return p


def config_from_args(args, is_train: bool = True):
    from fsvid2vid_tpu.config import preset

    workload = args.dataset_mode.replace("fewshot_", "")
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and v is not False and v != ""
                 and k in _config_fields()}
    overrides["is_train"] = is_train
    if getattr(args, "faithful", False):
        overrides["step_mode"] = "faithful"
    cfg = preset(workload, **overrides)
    if args.debug:
        cfg = cfg.debug_shrink()
    return cfg


def _config_fields():
    import dataclasses
    from fsvid2vid_tpu.config import Config
    return {f.name for f in dataclasses.fields(Config)}


def maybe_init_distributed(args) -> None:
    """Multi-controller init (replaces reference util/distributed.py:15-26 —
    torch.distributed NCCL init_process_group).  Must run before any other
    jax call.  On a TPU pod slice `jax.distributed.initialize()` auto-detects
    everything; on CPU/GPU pass coordinator/process coordinates explicitly.
    See docs/MULTIHOST.md for pod-slice launch commands."""
    if not getattr(args, "distributed", False):
        return
    import jax
    kwargs = {}
    if args.coordinator_address:
        kwargs.update(coordinator_address=args.coordinator_address,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
    jax.distributed.initialize(**kwargs)


def main() -> None:
    args = build_arg_parser().parse_args()
    maybe_init_distributed(args)
    cfg = config_from_args(args, is_train=True)

    import jax
    import numpy as np
    from fsvid2vid_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    from fsvid2vid_tpu.data.loader import SequenceLoader
    from fsvid2vid_tpu.training.trainer import Trainer
    from fsvid2vid_tpu.training.flow_teacher import FlowTeacher
    from fsvid2vid_tpu.utils.visualizer import Visualizer

    if jax.process_index() == 0:
        os.makedirs(os.path.join(cfg.checkpoints_dir, cfg.name), exist_ok=True)
        cfg.save(os.path.join(cfg.checkpoints_dir, cfg.name, "config.json"))
    vis = Visualizer(cfg, tb_log=getattr(args, "tf_log", False))

    loader = SequenceLoader(cfg, steps_per_epoch=args.steps_per_epoch,
                            shard_id=jax.process_index(),
                            num_shards=jax.process_count(), seed=cfg.seed)

    teacher = None
    if not cfg.no_flow_gt and cfg.flow_teacher == "flownet2":
        teacher = FlowTeacher(cfg)
        if args.flownet_ckpt:
            teacher.load_torch_checkpoint(args.flownet_ckpt)
            vis.vis_print(f"loaded FlowNet2 teacher from {args.flownet_ckpt}")
        else:
            vis.vis_print("WARNING: no --flownet_ckpt; flow teacher runs "
                          "with random weights (flow loss uninformative)")

    trainer = Trainer(cfg, log_fn=vis.vis_print, visualizer=vis)
    # initialize from one real batch (shapes)
    loader.set_epoch_frames(1)
    sample = next(iter(loader.epoch(0)))
    batch0 = {k: sample[k] for k in
              ("tgt_label", "tgt_image", "ref_labels", "ref_images")}
    batch0 = {k: v[:, 0] if k.startswith("tgt") else v
              for k, v in batch0.items()}
    trainer.setup(batch0)
    if args.vgg_ckpt and trainer.state.vgg_params is not None:
        from fsvid2vid_tpu.utils.torch_port import import_vgg19
        trainer.state = trainer.state.replace(
            vgg_params=import_vgg19(jax.device_get(trainer.state.vgg_params),
                                    args.vgg_ckpt))
        vis.vis_print(f"loaded VGG19 from {args.vgg_ckpt}")

    def make_data_iter(epoch, n_frames_total):
        loader.set_epoch_frames(n_frames_total)
        return loader.epoch(epoch)

    trainer.fit(make_data_iter, flow_teacher=teacher)


if __name__ == "__main__":
    main()
