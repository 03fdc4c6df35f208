"""Label / warped-image embedding pyramids (reference LabelEmbedder,
models/networks/generator.py:506-572).

Produces per-scale feature maps consumed as SPADE modulation maps.  Supports
'encoder', 'encoderdecoder' and 'unet' architectures selected by `arch`, and —
for the first `params_free_layers` up-layers of the decoder — externally
generated per-sample conv weights applied with `batch_conv`
(generator.py:541-569; weights target the UP path because the down path always
uses owned params when a decoder is present, generator.py:529-530).

TPU note: with `spd_inference` the two finest levels run in space-to-depth
layout at eval (ops/spd.py — exact math, 128-lane packing for the
small-channel full-res convs); outputs are converted back so consumers see
normal NHWC maps.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.ops.batch_conv import batch_conv
from fsvid2vid_tpu.ops.image_ops import leaky_relu, upsample_nearest
from fsvid2vid_tpu.ops.spd import depth_to_space, space_to_depth, spd_concat
from fsvid2vid_tpu.models.layers import SNConv, xavier_normal_init


def channel_schedule(nf: int, n: int, nf_max: int = 1024):
    """ch = [min(nf_max, nf * 2**i)] (generator.py:29,520)."""
    return [min(nf_max, nf * (2 ** i)) for i in range(n + 1)]


class LabelEmbedder(nn.Module):
    arch: str = "encoderdecoder"   # 'encoder' | 'encoderdecoder' | 'unet'
    nf: int = 32
    n_downsample: int = 5
    params_free_layers: int = 0
    first_layer_free: bool = False
    spd_inference: bool = False    # eval-time space-to-depth for levels 0-1
    spd_train: bool = False        # extend STD to train mode (round 5): the
    # embedder is norm-free plain convs, so the scattered-kernel formulation
    # is exact for forward AND gradients (tests/test_spd.py train parity)

    @property
    def unet(self):
        return "unet" in self.arch

    @property
    def decode(self):
        return "decoder" in self.arch or self.unet

    @nn.compact
    def __call__(self, x, weights: Optional[Sequence] = None,
                 train: bool = False, probe: Optional[str] = None):
        """Returns list of features, index i at 1/2^i resolution with ch[i]
        channels (i = 0..n_downsample).

        `probe` is a bench-only early exit for per-stage cost attribution
        (scripts/embed_bench.py): "down" returns after the encoder path,
        "coarse" after the decoder's coarse (non-STD) levels.  Never set in
        the framework."""
        if x is None:
            return None
        ch = channel_schedule(self.nf, self.n_downsample)
        nd = self.n_downsample

        def conv(f, name):
            # SNConv(use_sn=False) == the reference's plain conv; identical
            # (kernel, bias) param layout, plus the spd apply modes
            return SNConv(f, 3, use_sn=False,
                          kernel_init=xavier_normal_init(), name=name)

        use_spd = (self.spd_inference and (not train or self.spd_train)
                   and weights is None
                   and not self.first_layer_free and nd >= 2
                   and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
        if use_spd:
            return self._spd_forward(x, ch, nd, train, probe)

        if self.first_layer_free:
            out = [leaky_relu(batch_conv(x, weights[0][0], weights[0][1]))]
            weights = weights[1:]
        else:
            out = [leaky_relu(conv(self.nf, "conv_first")(x, train))]

        for i in range(nd):
            if i >= self.params_free_layers or self.decode:
                h = leaky_relu(
                    SNConv(ch[i + 1], 3, 2, use_sn=False,
                           kernel_init=xavier_normal_init(),
                           name=f"down_{i}")(out[-1], train))
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
                h = leaky_relu(conv(ch[i], f"up_{i}")(upsample_nearest(h),
                                                      train))
            else:
                h = upsample_nearest(h)
                h = leaky_relu(batch_conv(h, weights[i][0], weights[i][1]))
            out.append(h)
        if self.unet:
            out = out[nd:]
        return out[::-1]

    def _spd_forward(self, x, ch, nd, train, probe=None):
        """Space-to-depth eval path: identical math to the plain path with
        levels 0 and 1 phase-packed.  Owned-weight convs only."""
        def conv_s(f, name, stride=1):
            return SNConv(f, 3, stride, use_sn=False,
                          kernel_init=xavier_normal_init(), name=name)

        std0 = leaky_relu(conv_s(self.nf, "conv_first")(
            space_to_depth(x), train, spd="s1"))
        std1 = leaky_relu(conv_s(ch[1], "down_0")(std0, train, spd="s2"))
        down = [std0, std1]
        h = leaky_relu(conv_s(ch[2], "down_1")(std1, train, spd="s2_exit"))
        down.append(h)
        for i in range(2, nd):
            h = leaky_relu(conv_s(ch[i + 1], f"down_{i}", stride=2)(h, train))
            down.append(h)

        if probe == "down":
            return down

        if not self.decode:
            return ([depth_to_space(down[0]), depth_to_space(down[1])]
                    + down[2:])

        dec = {}
        h = down[nd]
        for i in reversed(range(2, nd)):
            if self.unet and i != nd - 1:
                h = jnp.concatenate([h, down[i + 1]], axis=-1)
            h = leaky_relu(conv_s(ch[i], f"up_{i}")(upsample_nearest(h), train))
            dec[i] = h
        if probe == "coarse":
            return [h]
        # level 1: (maybe concat skip) -> upsample -> conv, all phase-packed;
        # 's1_up' folds the nearest-upsample into the conv kernel
        # (ops/spd.py::spd_kernel_s1_up): 4x fewer FLOPs, identical math
        if self.unet and nd > 2:
            h = jnp.concatenate([h, down[2]], axis=-1)
        u1 = leaky_relu(conv_s(ch[1], "up_1")(h, train, spd="s1_up"))
        # level 0
        h0 = spd_concat(u1, std1) if self.unet else u1
        u0 = leaky_relu(conv_s(ch[0], "up_0")(
            depth_to_space(h0), train, spd="s1_up"))
        out = [depth_to_space(u0), depth_to_space(u1)]
        out += [dec[i] for i in range(2, nd)]
        out.append(down[nd])
        return out
