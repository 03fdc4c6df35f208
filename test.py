#!/usr/bin/env python
"""Inference CLI (reference test.py): sequential frame-by-frame synthesis with
HTML result pages.

  python test.py --name face --dataset_mode fewshot_face --adaptive_spade \
      --warp_ref --spade_combine --seq_path ... --ref_img_path ...
"""
from __future__ import annotations

import argparse
import os

from train import build_arg_parser, config_from_args


def main() -> None:
    parser = build_arg_parser()
    parser.add_argument("--results_dir", type=str, default="./results/")
    parser.add_argument("--how_many", type=int, default=300)
    parser.add_argument("--seq_path", type=str, default="")
    parser.add_argument("--ref_img_path", type=str, default="")
    parser.add_argument("--ref_img_id", type=str, default="0")
    parser.add_argument("--which_epoch", type=str, default="latest")
    parser.add_argument("--finetune", action="store_true")
    args = parser.parse_args()
    cfg = config_from_args(args, is_train=False)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from fsvid2vid_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    from fsvid2vid_tpu.data.loader import create_dataset
    from fsvid2vid_tpu.inference.pipeline import InferencePipeline
    from fsvid2vid_tpu.training import checkpoint as ckpt_lib
    from fsvid2vid_tpu.training.state import build_models, init_state
    from fsvid2vid_tpu.utils.html import HTML
    from fsvid2vid_tpu.utils.imaging import (
        save_image, tensor2im, tensor2label, tensor2flow)

    dataset = create_dataset(cfg)
    models = build_models(cfg)

    # template state for checkpoint restore
    rng = np.random.RandomState(0)
    first = dataset.sample(0, rng)
    sample_batch = {
        "tgt_label": jnp.asarray(first["tgt_label"][:1]),
        "tgt_image": jnp.asarray(
            np.zeros(first["tgt_label"].shape[:1]
                     + first["tgt_label"].shape[1:3] + (3,), np.float32)),
        "ref_labels": jnp.asarray(first["ref_labels"][None]),
        "ref_images": jnp.asarray(first["ref_images"][None]),
    }
    template = init_state(cfg, models, jax.random.PRNGKey(0), sample_batch)
    state, _, _ = ckpt_lib.restore(cfg, template, label=args.which_epoch)
    if state is None:
        print(f"no checkpoint found for {cfg.name}; using random init")
        state = template

    if cfg.finetune:
        from fsvid2vid_tpu.inference.finetune import finetune
        state = finetune(cfg, models, state,
                         jnp.asarray(first["ref_labels"][None]),
                         jnp.asarray(first["ref_images"][None]))
        print("test-time finetuning done")

    pipe = InferencePipeline(cfg, models, state.params_G, state.aux_G)
    pipe.reset(jnp.asarray(first["ref_labels"][None]),
               jnp.asarray(first["ref_images"][None]),
               jnp.asarray(first["tgt_label"][:1]))

    seq_name = (os.path.basename(os.path.dirname(cfg.ref_img_path or "ref/"))
                + "_" + os.path.basename(os.path.dirname(cfg.seq_path or "seq/")))
    web_dir = os.path.join(cfg.results_dir, cfg.name, seq_name)
    page = HTML(web_dir, f"results: {cfg.name}")

    n = min(len(dataset), cfg.how_many)
    for i in range(n):
        sample = dataset.sample(i, rng) if i > 0 else first
        label = jnp.asarray(sample["tgt_label"][-1:])
        out = pipe.step(label)
        visuals = {
            "input_label": (tensor2label(np.asarray(label[0]), cfg.label_nc)
                            if cfg.label_nc else
                            tensor2im(np.asarray(label[0]), normalize=False)),
            "synthesized": tensor2im(np.asarray(out["fake_image"][0])),
        }
        if out["flow"][0] is not None:
            visuals["ref_flow"] = tensor2flow(np.asarray(out["flow"][0][0]))
        names = []
        for k, img in visuals.items():
            if img is None:
                continue
            fname = f"{i:05d}_{k}.png"
            save_image(img, os.path.join(page.get_image_dir(), fname))
            names.append(fname)
        page.add_header(f"frame {i:05d}")
        page.add_images(names, [n_.split("_", 1)[1] for n_ in names], names)
        if (i + 1) % 10 == 0:
            print(f"frame {i + 1}/{n}")
    page.save()
    print(f"results written to {web_dir}")


if __name__ == "__main__":
    main()
