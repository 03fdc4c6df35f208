"""Flow estimation network (reference FlowGenerator, generator.py:456-504).

Input: current label map concatenated with n_frames_G-1 previous label maps and
previous images (for the reference branch: the reference label + image).
Output: 2-channel flow scaled by `flow_multiplier` (=20) and a sigmoid
occlusion mask.  Architecture: 3x stride-2 conv downsample -> 6 plain (non-
SPADE) spectral-norm resblocks -> nearest-upsample convs -> two heads.

TPU note: at inference the two finest levels run in space-to-depth layout
(ops/spd.py) — their channel counts (<=2*nff) waste most of the 128-wide
vector lanes in NHWC, and the phase-packed formulation is mathematically
identical (kernels scattered per ops/spd.py; parity tested).  Training and
odd-size inputs use the plain path.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.models.layers import (
    SNConv, SpadeResnetBlock, make_plain_norm, xavier_normal_init)
from fsvid2vid_tpu.models.embedder import channel_schedule
from fsvid2vid_tpu.ops.image_ops import leaky_relu, upsample_nearest
from fsvid2vid_tpu.ops.spd import depth_to_space, space_to_depth


class FlowGenerator(nn.Module):
    cfg: Config
    n_frames_G: int = 2

    @nn.compact
    def __call__(self, label, label_prev, img_prev, train: bool = False,
                 probe: str | None = None):
        """label: (B,H,W,Cl); label_prev: (B,H,W,(n-1)*Cl); img_prev: (B,H,W,(n-1)*3).

        Returns (flow (B,H,W,2), mask (B,H,W,1)).

        `probe` is a bench-only early exit for per-stage cost attribution
        (scripts/flowgen_bench.py): "trunk" returns after the downsample
        trunk, "res" after the resblocks.  Never set in the framework."""
        cfg = self.cfg
        nf = cfg.nff
        norm = cfg.norm_F
        use_sn = "spectral" in norm
        nd = cfg.n_downsample_F
        ch = channel_schedule(nf, nd)
        x = jnp.concatenate([label, label_prev, img_prev], axis=-1)

        # get_nonspade_norm_layer: spectral conv (bias removed) + affine norm
        def make(f, name, stride=1):
            conv = SNConv(f, 3, stride, use_sn=use_sn, use_bias=False,
                          name=f"{name}_conv")
            plain = make_plain_norm(norm, f, name=f"{name}_norm")
            return conv, plain

        down_first = make(nf, "down_first")
        downs = [make(ch[i + 1], f"down_{i}", stride=2) for i in range(nd)]
        ups = [make(ch[i], f"up_{i}") for i in range(nd)]
        conv_flow = SNConv(2, 3, use_sn=False,
                           kernel_init=xavier_normal_init(), name="conv_flow")
        conv_mask = SNConv(1, 3, use_sn=False,
                           kernel_init=xavier_normal_init(), name="conv_mask")

        def plain_nc(pair, h, spd=None):
            conv, plain = pair
            h = conv(h, train, spd=spd) if spd else conv(h, train)
            if plain is not None:
                if spd and spd != "s2_exit":
                    h = plain(h, train, spd=True)
                else:
                    h = plain(h, train)
            return leaky_relu(h)

        # STD fast path: levels 0 and 1 phase-packed.  Eval uses running
        # stats (tile cleanly over phases); train (cfg.spd_train) reduces
        # batch stats over the phase dim (SyncBatchNorm spd=True) and
        # spectral-normalizes the ORIGINAL kernel before the STD scatter —
        # exact unpacked math either way.  Instance norm excluded (its
        # per-position stats do not tile), sizes must be multiples of 4.
        use_spd = ((not train or cfg.spd_train) and cfg.spd_inference
                   and nd >= 2 and "instance" not in norm
                   and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)

        if use_spd:
            h = space_to_depth(x)
            h = plain_nc(down_first, h, spd="s1")        # STD@L0
            h = plain_nc(downs[0], h, spd="s2")          # STD@L1
            h = plain_nc(downs[1], h, spd="s2_exit")     # normal L2
            for i in range(2, nd):
                h = plain_nc(downs[i], h)
        else:
            h = plain_nc(down_first, x)
            for i in range(nd):
                h = plain_nc(downs[i], h)

        if probe == "trunk":
            return h

        for i in range(cfg.n_blocks_F):
            h = SpadeResnetBlock(ch[nd], ch[nd], norm=norm,
                                 name=f"res_{i}")(h, train=train)

        if probe == "res":
            return h

        if use_spd:
            for i in reversed(range(2, nd)):
                h = upsample_nearest(h)
                h = plain_nc(ups[i], h)
            # 's1_up' folds the nearest-upsample into the conv kernel
            # (ops/spd.py::spd_kernel_s1_up): 4x fewer FLOPs/input bytes
            # than conv(spd_upsample_enter(h)), identical math.
            h = plain_nc(ups[1], h, spd="s1_up")                   # STD@L1
            h = depth_to_space(h)                                  # normal L1
            h = plain_nc(ups[0], h, spd="s1_up")                   # STD@L0
            flow = depth_to_space(
                conv_flow(h, train, spd="s1")) * cfg.flow_multiplier
            mask = nn.sigmoid(depth_to_space(conv_mask(h, train, spd="s1")))
            return flow, mask

        for i in reversed(range(nd)):
            h = upsample_nearest(h)
            h = plain_nc(ups[i], h)
        flow = conv_flow(h, train) * cfg.flow_multiplier
        mask = nn.sigmoid(conv_mask(h, train))
        return flow, mask
