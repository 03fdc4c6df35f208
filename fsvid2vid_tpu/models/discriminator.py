"""PatchGAN discriminators (reference models/networks/discriminator.py).

* `NLayerDiscriminator`: 4x stride-2 conv PatchGAN, kw=4, spectral+instance
  norm, returning all intermediate features for the matching loss
  (discriminator.py:61-102).
* `MultiscaleDiscriminator`: num_D copies on an avg-pool(3,2,1,
  count_include_pad=False) pyramid (discriminator.py:16-58).
* `AdaptiveDiscriminator`: first `adaptive_layers` conv kernels generated
  per-sample from the reference image by fc layers (discriminator.py:104-209);
  the per-sample convs run as one grouped conv via `batch_conv` instead of the
  reference's Python loop.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.models.layers import (
    SNConv, InstanceNorm, make_plain_norm, xavier_normal_init)
from fsvid2vid_tpu.ops.batch_conv import batch_conv
from fsvid2vid_tpu.ops.image_ops import leaky_relu, avg_pool, adaptive_avg_pool


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 4
    norm: str = "spectralinstance"
    get_interm_feat: bool = True
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_sn = "spectral" in self.norm
        kw, padw = 4, 2  # ceil((4-1)/2) = 2 (discriminator.py:68)
        res = [x]
        # layer 0: plain conv + leaky — the reference does NOT wrap the
        # first conv in spectral norm or a norm layer (discriminator.py:69)
        h = SNConv(self.ndf, kw, self.stride, padding=padw, use_sn=False,
                   name="model0_conv")(x, train)
        res.append(leaky_relu(h))
        nf = self.ndf
        for n in range(1, self.n_layers + 1):
            nf = min(nf * 2, 512)
            stride = self.stride if n != self.n_layers else 1
            h = SNConv(nf, kw, stride, padding=padw, use_sn=use_sn,
                       use_bias=False, name=f"model{n}_conv")(res[-1], train)
            norm = make_plain_norm(self.norm, nf, name=f"model{n}_norm")
            if norm is not None:
                h = norm(h, train)
            res.append(leaky_relu(h))
        # final logit conv is also plain (discriminator.py:88)
        h = SNConv(1, kw, 1, padding=padw, use_sn=False,
                   name=f"model{self.n_layers + 1}_conv")(res[-1], train)
        res.append(h)
        return res[1:] if self.get_interm_feat else res[-1]


class AdaptiveDiscriminator(nn.Module):
    """First `adaptive_layers` convs use kernels generated from the reference."""
    cfg: Config
    input_nc: int
    ndf: int = 64
    n_layers: int = 4
    norm: str = "spectralinstance"
    get_interm_feat: bool = True
    adaptive_layers: int = 1

    @nn.compact
    def __call__(self, x, ref, train: bool = False):
        cfg = self.cfg
        kw, padw = 4, 2
        sw = cfg.fine_size // 8
        sh = int(sw / cfg.aspect_ratio)
        fc_in = sh * sw

        # encode reference (discriminator.py:184-188)
        encoded = []
        h = ref
        nf = self.ndf
        nf_prev = self.input_nc
        for n in range(self.adaptive_layers):
            h = leaky_relu(nn.Conv(nf, (kw, kw), strides=2, padding=padw,
                                   kernel_init=xavier_normal_init(),
                                   name=f"encoder_{n}")(h))
            encoded.append(h)
            nf_prev, nf = nf, min(nf * 2, 512)

        # generate per-sample kernels (discriminator.py:142-169)
        res = [x]
        nf = self.ndf
        nf_prev = self.input_nc
        for n in range(self.adaptive_layers):
            e = encoded[n]
            b, _, _, ch = e.shape
            pooled = adaptive_avg_pool(e, (sh, sw))
            feat = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(b * ch, fc_in)
            w = nn.Dense(nf_prev * kw * kw, kernel_init=xavier_normal_init(),
                         name=f"fc_{n}")(feat)
            w = w.reshape(b, nf, nf_prev, kw, kw)  # torch (Cout,Cin,kh,kw)
            w = jnp.transpose(w, (0, 3, 4, 2, 1))  # HWIO per sample
            # stride-2 conv with per-sample kernel, then InstanceNorm + leaky.
            # torch pads kw//2=2; replicate exactly (batch_conv pads k//2).
            h = batch_conv(res[-1], w, stride=2)
            h = InstanceNorm(nf, affine=False, eps=1e-5,
                             name=f"adaptive_norm_{n}")(h)
            res.append(leaky_relu(h))
            nf_prev, nf = nf, min(nf * 2, 512)

        # remaining fixed layers (discriminator.py:129-140)
        use_sn = "spectral" in self.norm
        for n in range(self.adaptive_layers, self.n_layers + 1):
            nf = min(nf_prev * 2, 512)
            stride = 2 if n != self.n_layers else 1
            h = SNConv(nf, kw, stride, padding=padw, use_sn=use_sn,
                       use_bias=False, name=f"model{n}_conv")(res[-1], train)
            norm = make_plain_norm(self.norm, nf, name=f"model{n}_norm")
            if norm is not None:
                h = norm(h, train)
            res.append(leaky_relu(h))
            nf_prev = nf
        h = SNConv(1, kw, 1, padding=padw, use_sn=use_sn,
                   name=f"model{self.n_layers + 1}_conv")(res[-1], train)
        res.append(h)
        return res[1:] if self.get_interm_feat else res[-1]


class MultiscaleDiscriminator(nn.Module):
    cfg: Config
    input_nc: int
    ndf: int = 64
    n_layers: int = 4
    norm: str = "spectralinstance"
    subarch: str = "n_layers"
    num_D: int = 1
    get_interm_feat: bool = True

    @nn.compact
    def __call__(self, x, ref: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """Returns list (num_D) of lists of per-layer features (coarse scales
        later), matching discriminator.py:49-58."""
        result = []
        for i in range(self.num_D):
            if self.subarch == "adaptive":
                out = AdaptiveDiscriminator(
                    self.cfg, self.input_nc, self.ndf, self.n_layers,
                    self.norm, self.get_interm_feat,
                    self.cfg.adaptive_D_layers,
                    name=f"discriminator_{i}")(x, ref, train)
            else:
                out = NLayerDiscriminator(
                    self.ndf, self.n_layers, self.norm, self.get_interm_feat,
                    name=f"discriminator_{i}")(x, train)
            result.append(out if isinstance(out, list) else [out])
            if i != self.num_D - 1:
                x = avg_pool(x, 3, 2, 1, count_include_pad=False)
                if ref is not None:
                    ref = avg_pool(ref, 3, 2, 1, count_include_pad=False)
        return result
