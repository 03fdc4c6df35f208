"""Core network layers: spectral-norm conv/dense, norm factory, SPADE blocks.

TPU-native re-design of models/networks/architecture.py and normalization.py:
  * `SNConv` / `SNDense` replace torch spectral_norm wrappers; power-iteration
    vectors live in a 'spectral' flax collection (explicit functional state).
  * `SyncBatchNorm` replaces both apex SyncBatchNorm (normalization.py:15) and
    the vendored threaded sync_batchnorm: under pjit/GSPMD a plain batch mean
    over the sharded batch axis IS the cross-replica mean — XLA inserts the
    collectives — so synchronized statistics come for free on the ICI mesh.
  * `Spade` fuses norm + multi-map gamma/beta modulation (normalization.py:18-52),
    supporting externally generated per-sample weights via `batch_conv`.
  * `SpadeConv2d` / `SpadeResnetBlock` mirror architecture.py:57-108 including
    the adaptive (generated-weight) conv path.

Weight init matches the reference ('xavier' = xavier_normal with gain 0.02,
base_network.py:96-99; BN affine init normal(1, 0.02)).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.ops.batch_conv import batch_conv
from fsvid2vid_tpu.ops.image_ops import leaky_relu, resize_nearest, avg_pool
from fsvid2vid_tpu.ops.spd import (
    spd_batch_kernel_k1_grouped, spd_conv, spd_kernel_k1_grouped,
    spd_tile_channel)
from fsvid2vid_tpu.ops.spectral_norm import (
    spectral_normalize, conv_kernel_matrix, dense_kernel_matrix)

Dtype = Any


def xavier_normal_init(gain: float = 0.02):
    """torch init.xavier_normal_(w, gain): std = gain * sqrt(2/(fan_in+fan_out))."""
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:  # HWIO
            rf = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * rf, shape[3] * rf
        else:  # (din, dout)
            fan_in, fan_out = shape[0], shape[1]
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std
    return init


class SNConv(nn.Module):
    """Conv2d with optional spectral normalization (torch sn() semantics)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None  # None => k // 2 (torch default in reference)
    use_bias: bool = True
    use_sn: bool = True
    kernel_init: Callable = xavier_normal_init()

    @nn.compact
    def __call__(self, x, train: bool = False, spd: Optional[str] = None):
        """spd: None for the normal path, or an ops.spd conv mode
        ('s1'|'s2'|'s2_exit'|'s1_up') — x is then in space-to-depth layout
        ('s1_up': the pre-upsample normal-layout tensor) and the stored
        (k,k,cin,cout) kernel is scattered into its STD equivalent
        (ops/spd.py TPU lane packing; spectral norm applies to the ORIGINAL
        kernel before the scatter, so train mode is exact too)."""
        k = self.kernel_size
        cin = x.shape[-1] // (4 if spd and spd != "s1_up" else 1)
        kernel = self.param("kernel", self.kernel_init, (k, k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None

        # Skip the sigma matvec when the 'spectral' collection was folded out
        # of the variables (inference fast path, fold.fold_spectral_norm).
        if self.use_sn and (self.is_initializing()
                            or self.has_variable("spectral", "u")):
            mat = conv_kernel_matrix(kernel)
            u = self.variable("spectral", "u",
                              lambda k_: jax.random.normal(k_, (mat.shape[0],)),
                              self.make_rng("params") if self.is_initializing() else None)
            v = self.variable("spectral", "v",
                              lambda k_: jax.random.normal(k_, (mat.shape[1],)),
                              self.make_rng("params") if self.is_initializing() else None)
            sigma, nu, nv = spectral_normalize(mat, u.value, v.value, update=train)
            if train and not self.is_initializing():
                u.value, v.value = nu, nv
            kernel = kernel / sigma.astype(kernel.dtype)

        if spd is not None:
            if spd == "k1":
                assert k == 1
            else:
                assert k == 3 and (k // 2 if self.padding is None
                                   else self.padding) == 1
            y = spd_conv(x, kernel, spd)
            if bias is not None:
                b_ = bias if spd == "s2_exit" else spd_tile_channel(bias)
                y = y + b_.astype(y.dtype)
            return y
        pad = k // 2 if self.padding is None else self.padding
        # no explicit preferred_element_type: TPU accumulates bf16 convs in
        # f32 inside the MXU regardless, and a widened primal output breaks
        # the conv transpose rule under AD with bf16 inputs.
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class SNDense(nn.Module):
    """Linear with optional spectral normalization."""
    features: int
    use_bias: bool = True
    use_sn: bool = True
    kernel_init: Callable = xavier_normal_init()

    @nn.compact
    def __call__(self, x, train: bool = False):
        din = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (din, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        if self.use_sn and (self.is_initializing()
                            or self.has_variable("spectral", "u")):
            mat = dense_kernel_matrix(kernel)
            u = self.variable("spectral", "u",
                              lambda k_: jax.random.normal(k_, (mat.shape[0],)),
                              self.make_rng("params") if self.is_initializing() else None)
            v = self.variable("spectral", "v",
                              lambda k_: jax.random.normal(k_, (mat.shape[1],)),
                              self.make_rng("params") if self.is_initializing() else None)
            sigma, nu, nv = spectral_normalize(mat, u.value, v.value, update=train)
            if train and not self.is_initializing():
                u.value, v.value = nu, nv
            kernel = kernel / sigma.astype(kernel.dtype)
        y = jnp.dot(x, kernel.astype(x.dtype))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class SyncBatchNorm(nn.Module):
    """BatchNorm whose batch statistics are global under a sharded batch.

    Train mode: mean/var over (B, H, W) of the *global* (GSPMD-sharded) batch —
    equivalent to apex SyncBatchNorm on NCCL.  Eval: running averages.
    Running stats follow torch momentum 0.1 convention.
    """
    features: int
    affine: bool = True
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, spd: bool = False):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros(self.features), None)
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones(self.features), None)
        if spd:
            # space-to-depth layout: stats + affine are per-ORIGINAL-channel,
            # tiled over the 4 phase blocks.  Train mode reduces over
            # (B, H', W', phase) — the STD packing is a bijection of spatial
            # positions per channel, so the statistics (and their gradients)
            # are bit-equal in expectation to the unpacked layout.
            if train:
                b_, h_, w_, c4 = x.shape
                xp = x.astype(jnp.float32).reshape(b_, h_, w_, 4,
                                                   self.features)
                mean = xp.mean((0, 1, 2, 3))
                var = xp.var((0, 1, 2, 3))
                if not self.is_initializing():
                    n = b_ * h_ * w_ * 4
                    unbiased = var * (n / max(n - 1, 1))
                    ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                     + self.momentum * mean)
                    ra_var.value = ((1 - self.momentum) * ra_var.value
                                    + self.momentum * unbiased)
            else:
                mean, var = ra_mean.value, ra_var.value
            mean = spd_tile_channel(mean)
            var = spd_tile_channel(var)
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
            if self.affine:
                scale = self.param(
                    "scale", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s),
                    (self.features,))
                b = self.param("bias", nn.initializers.zeros, (self.features,))
                y = y * spd_tile_channel(scale) + spd_tile_channel(b)
            return y.astype(x.dtype)
        if train:
            x32 = x.astype(jnp.float32)
            mean = x32.mean((0, 1, 2))
            var = x32.var((0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale",
                               lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s),
                               (self.features,))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + b
        return y.astype(x.dtype)


class InstanceNorm(nn.Module):
    """InstanceNorm2d; reference uses eps=0.1 (normalization.py:35,82)."""
    features: int
    affine: bool = True
    eps: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x32 = x.astype(jnp.float32)
        mean = x32.mean((1, 2), keepdims=True)
        var = x32.var((1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + b
        return y.astype(x.dtype)


def make_plain_norm(norm: str, features: int, name: Optional[str] = None):
    """Non-SPADE norm factory: 'syncbatch'|'batch' -> SyncBatchNorm,
    'instance' -> InstanceNorm, ''/'none' -> None (generalNorm /
    get_nonspade_norm_layer, architecture.py:40-55, normalization.py:54-88)."""
    if "instance" in norm:
        return InstanceNorm(features, affine=True, name=name)
    if "batch" in norm:  # covers syncbatch + batch: identical under GSPMD
        return SyncBatchNorm(features, affine=True, name=name)
    return None


class _ConvParams(nn.Module):
    """Owns an nn.Conv-shaped (kernel, bias) pair without applying it, so
    callers can fuse several convs over one input into a single MXU pass
    while the checkpoint tree stays identical to separate nn.Conv modules."""
    cin: int
    cout: int
    ks: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_normal_init(),
                            (self.ks, self.ks, self.cin, self.cout))
        bias = self.param("bias", nn.initializers.zeros, (self.cout,))
        return kernel, bias


class Spade(nn.Module):
    """SPADE modulation: param-free norm then per-map gamma/beta from conv(map).

    `hidden_ncs` lists the channel count of each modulation map
    (normalization.py:22-30); map 0's gamma/beta convs may instead come from
    externally generated per-sample weights (weights arg, batch_conv path
    normalization.py:47-50 — the generated biases are unused there, matching
    the reference exactly).

    TPU note: each map's gamma and beta convs are fused into ONE conv over
    concatenated output channels (one read of the full-res map instead of
    two); parameters keep the reference's mlp_gamma/mlp_beta layout.
    """
    norm_nc: int
    hidden_ncs: Sequence[int]
    norm: str = "batch"            # param-free inner norm selector
    ks: int = 1
    params_free: bool = False      # map 0 uses generated weights

    @nn.compact
    def __call__(self, x, maps, weights=None, train: bool = False,
                 spd: bool = False):
        """spd: x and every map are in space-to-depth layout (requires
        ks == 1 and a batch-type inner norm; train-mode stats reduce over
        the phase dim).  The 1x1 gamma/beta convs lift to block-diagonal STD
        kernels (ops/spd.py) with the gamma/beta halves kept contiguous, so
        the math is identical."""
        if not isinstance(maps, (list, tuple)):
            maps = [maps]
        if spd:
            assert self.ks == 1 and "batch" in self.norm
            normed = SyncBatchNorm(self.norm_nc, affine=False,
                                   name="norm")(x, train, spd=True)
        elif "batch" in self.norm:
            normed = SyncBatchNorm(self.norm_nc, affine=False, name="norm")(x, train)
        else:
            normed = InstanceNorm(self.norm_nc, affine=False, eps=0.1, name="norm")(x, train)
        out = normed
        nc = self.norm_nc
        pad = self.ks // 2
        for i, m in enumerate(maps):
            if m is None:
                continue
            if not spd:
                m = resize_nearest(m, x.shape[1:3])
            if weights is not None and i == 0:
                # generated per-sample conv weights, no bias
                # (normalization.py:47-50); fused along out-channels
                w = jnp.concatenate([weights[0], weights[1]], axis=-1)
                if spd:
                    assert m.shape[1:3] == x.shape[1:3]
                    gb = batch_conv(m, spd_batch_kernel_k1_grouped(w, 2))
                    gamma, beta = gb[..., :4 * nc], gb[..., 4 * nc:]
                else:
                    gb = batch_conv(m, w)
                    gamma, beta = gb[..., :nc], gb[..., nc:]
            else:
                s = str(i + 1) if i > 0 else ""
                cin = m.shape[-1] // (4 if spd else 1)
                gk, gbias = _ConvParams(cin, nc, self.ks,
                                        name=f"mlp_gamma{s}")()
                bk, bbias = _ConvParams(cin, nc, self.ks,
                                        name=f"mlp_beta{s}")()
                w = jnp.concatenate([gk, bk], axis=-1)
                if spd:
                    assert m.shape[1:3] == x.shape[1:3]
                    gb = jax.lax.conv_general_dilated(
                        m, spd_kernel_k1_grouped(w, 2).astype(m.dtype),
                        window_strides=(1, 1), padding=((0, 0), (0, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    gb = gb + jnp.concatenate(
                        [spd_tile_channel(gbias),
                         spd_tile_channel(bbias)]).astype(gb.dtype)
                    gamma, beta = gb[..., :4 * nc], gb[..., 4 * nc:]
                else:
                    gb = jax.lax.conv_general_dilated(
                        m, w.astype(m.dtype), window_strides=(1, 1),
                        padding=((pad, pad), (pad, pad)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    gb = gb + jnp.concatenate([gbias, bbias]).astype(gb.dtype)
                    gamma, beta = gb[..., :nc], gb[..., nc:]
            out = out * (1 + gamma) + beta
        return out


class SpadeConv2d(nn.Module):
    """sn-conv -> norm -> leaky(0.2) (architecture.py:57-69)."""
    features: int
    norm: str = "batch"
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_sn = "spectral" in self.norm
        x = SNConv(self.features, self.kernel_size, self.stride,
                   use_sn=use_sn, name="conv")(x, train)
        norm = make_plain_norm(self.norm, self.features, name="bn")
        if norm is not None:
            x = norm(x, train)
        return leaky_relu(x)


class SpadeResnetBlock(nn.Module):
    """Two-conv residual block with SPADE (or plain) norms; each conv/norm can
    run with externally generated per-sample weights (architecture.py:71-108)."""
    fin: int
    fout: int
    norm: str = "batch"
    hidden_ncs: Sequence[int] = (0,)
    conv_ks: int = 3
    spade_ks: int = 1
    stride: int = 1
    conv_params_free: bool = False
    norm_params_free: bool = False

    @nn.compact
    def __call__(self, x, label=None, conv_weights=None, norm_weights=None,
                 train: bool = False, spd: bool = False):
        """spd: run in space-to-depth layout — x and every modulation map
        phase-packed, k3 convs via scattered STD kernels and 1x1 convs via
        block-diagonal ones (exact math, ops/spd.py).  Requires stride 1,
        conv_ks 3, owned conv params, and batch-type norms.  Train mode is
        exact too: SyncBatchNorm(spd=True) reduces stats over the phase dim
        and SNConv spectral-normalizes the original kernel pre-scatter."""
        fhidden = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        use_spade = "spade" in self.norm
        use_sn = "spectral" in self.norm and not self.conv_params_free
        cw = conv_weights if conv_weights is not None else [None] * 3
        nw = norm_weights if norm_weights is not None else [None] * 3
        if spd:
            assert (self.stride == 1 and self.conv_ks == 3
                    and not self.conv_params_free)

        def make_norm(features, name):
            if use_spade:
                return lambda h, w_: Spade(
                    features, self.hidden_ncs, self.norm, self.spade_ks,
                    params_free=self.norm_params_free, name=name,
                )(h, label, weights=w_, train=train, spd=spd)
            plain = make_plain_norm(self.norm, features, name=name)
            if plain is None:
                return lambda h, w_: h
            if spd:
                assert isinstance(plain, SyncBatchNorm)
                return lambda h, w_: plain(h, train, spd=True)
            return lambda h, w_: plain(h, train)

        def make_conv(features, ks, name, stride=1, use_bias=True):
            if self.conv_params_free:
                return lambda h, w_: batch_conv(h, w_[0], w_[1], stride=stride)
            conv = SNConv(features, ks, stride, use_sn=use_sn,
                          use_bias=use_bias, name=name)
            if spd:
                return lambda h, w_: conv(h, train,
                                          spd=("k1" if ks == 1 else "s1"))
            return lambda h, w_: conv(h, train)

        bn_0 = make_norm(self.fin, "bn_0")
        bn_1 = make_norm(fhidden, "bn_1")
        conv_0 = make_conv(fhidden, self.conv_ks, "conv_0", stride=self.stride)
        conv_1 = make_conv(self.fout, self.conv_ks, "conv_1")

        if learned_shortcut:
            bn_s = make_norm(self.fin, "bn_s")
            conv_s = make_conv(self.fout, 1, "conv_s", stride=self.stride,
                               use_bias=False)
            x_s = conv_s(bn_s(x, nw[2]), cw[2])
        elif self.stride != 1:
            x_s = avg_pool(x, 3, 2, 1)
        else:
            x_s = x

        dx = conv_0(leaky_relu(bn_0(x, nw[0])), cw[0])
        dx = conv_1(leaky_relu(bn_1(dx, nw[1])), cw[1])
        return x_s + dx
