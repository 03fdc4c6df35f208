"""Flow estimation network (reference FlowGenerator, generator.py:456-504).

Input: current label map concatenated with n_frames_G-1 previous label maps and
previous images (for the reference branch: the reference label + image).
Output: 2-channel flow scaled by `flow_multiplier` (=20) and a sigmoid
occlusion mask.  Architecture: 3x stride-2 conv downsample -> 6 plain (non-
SPADE) spectral-norm resblocks -> nearest-upsample convs -> two heads.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.models.layers import (
    SNConv, SpadeResnetBlock, make_plain_norm, xavier_normal_init)
from fsvid2vid_tpu.models.embedder import channel_schedule
from fsvid2vid_tpu.ops.image_ops import leaky_relu, upsample_nearest


class FlowGenerator(nn.Module):
    cfg: Config
    n_frames_G: int = 2

    @nn.compact
    def __call__(self, label, label_prev, img_prev, train: bool = False):
        """label: (B,H,W,Cl); label_prev: (B,H,W,(n-1)*Cl); img_prev: (B,H,W,(n-1)*3).

        Returns (flow (B,H,W,2), mask (B,H,W,1))."""
        cfg = self.cfg
        nf = cfg.nff
        norm = cfg.norm_F
        use_sn = "spectral" in norm
        nd = cfg.n_downsample_F
        ch = channel_schedule(nf, nd)
        x = jnp.concatenate([label, label_prev, img_prev], axis=-1)

        # get_nonspade_norm_layer: spectral conv (bias removed) + affine norm
        def norm_conv(f, name, stride=1):
            def apply(h):
                h = SNConv(f, 3, stride, use_sn=use_sn, use_bias=False,
                           name=f"{name}_conv")(h, train)
                plain = make_plain_norm(norm, f, name=f"{name}_norm")
                if plain is not None:
                    h = plain(h, train)
                return leaky_relu(h)
            return apply

        x = norm_conv(nf, "down_first")(x)
        for i in range(nd):
            x = norm_conv(ch[i + 1], f"down_{i}", stride=2)(x)

        ch_r = ch[nd]
        for i in range(cfg.n_blocks_F):
            x = SpadeResnetBlock(ch_r, ch_r, norm=norm, name=f"res_{i}")(
                x, train=train)

        for i in reversed(range(nd)):
            x = upsample_nearest(x)
            x = norm_conv(ch[i], f"up_{i}")(x)

        flow = nn.Conv(2, (3, 3), padding=1, kernel_init=xavier_normal_init(),
                       name="conv_flow")(x) * cfg.flow_multiplier
        mask = nn.sigmoid(nn.Conv(1, (3, 3), padding=1,
                                  kernel_init=xavier_normal_init(),
                                  name="conv_mask")(x))
        return flow, mask
