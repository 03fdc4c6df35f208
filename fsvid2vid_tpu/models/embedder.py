"""Label / warped-image embedding pyramids (reference LabelEmbedder,
models/networks/generator.py:506-572).

Produces per-scale feature maps consumed as SPADE modulation maps.  Supports
'encoder', 'encoderdecoder' and 'unet' architectures selected by `arch`, and —
for the first `params_free_layers` up-layers of the decoder — externally
generated per-sample conv weights applied with `batch_conv`
(generator.py:541-569; weights target the UP path because the down path always
uses owned params when a decoder is present, generator.py:529-530).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.ops.batch_conv import batch_conv
from fsvid2vid_tpu.ops.image_ops import leaky_relu, upsample_nearest
from fsvid2vid_tpu.models.layers import xavier_normal_init


def channel_schedule(nf: int, n: int, nf_max: int = 1024):
    """ch = [min(nf_max, nf * 2**i)] (generator.py:29,520)."""
    return [min(nf_max, nf * (2 ** i)) for i in range(n + 1)]


class LabelEmbedder(nn.Module):
    arch: str = "encoderdecoder"   # 'encoder' | 'encoderdecoder' | 'unet'
    nf: int = 32
    n_downsample: int = 5
    params_free_layers: int = 0
    first_layer_free: bool = False

    @property
    def unet(self):
        return "unet" in self.arch

    @property
    def decode(self):
        return "decoder" in self.arch or self.unet

    @nn.compact
    def __call__(self, x, weights: Optional[Sequence] = None,
                 train: bool = False):
        """Returns list of features, index i at 1/2^i resolution with ch[i]
        channels (i = 0..n_downsample)."""
        if x is None:
            return None
        ch = channel_schedule(self.nf, self.n_downsample)
        nd = self.n_downsample

        def conv(f, name, stride=1):
            return nn.Conv(f, (3, 3), strides=(stride, stride), padding=1,
                           kernel_init=xavier_normal_init(), name=name)

        if self.first_layer_free:
            out = [leaky_relu(batch_conv(x, weights[0][0], weights[0][1]))]
            weights = weights[1:]
        else:
            out = [leaky_relu(conv(self.nf, "conv_first")(x))]

        for i in range(nd):
            if i >= self.params_free_layers or self.decode:
                h = leaky_relu(conv(ch[i + 1], f"down_{i}", stride=2)(out[-1]))
            else:
                h = leaky_relu(batch_conv(out[-1], weights[i][0],
                                          weights[i][1], stride=2))
            out.append(h)

        if not self.decode:
            return out

        if not self.unet:
            out = [out[-1]]
        for i in reversed(range(nd)):
            h = out[-1]
            if self.unet and i != nd - 1:
                h = jnp.concatenate([h, out[i + 1]], axis=-1)
            if i >= self.params_free_layers:
                h = leaky_relu(conv(ch[i], f"up_{i}")(upsample_nearest(h)))
            else:
                h = upsample_nearest(h)
                h = leaky_relu(batch_conv(h, weights[i][0], weights[i][1]))
            out.append(h)
        if self.unet:
            out = out[nd:]
        return out[::-1]
