"""FlowNet2 flow-estimation stack (reference
models/networks/flownet2_pytorch/): FlowNetC (correlation cost volume) ->
FlowNetS x2 refinement + FlowNetSD, fused by FlowNetFusion — 162,518,834
parameters (models.py:17), used as the frozen pseudo-ground-truth flow
teacher (models/flownet.py).

TPU-native: NHWC, the correlation CUDA extension replaced by the XLA/Pallas
cost volume (ops/cost_volume.py), Resample2d by ops/warp.flow_warp, and
ChannelNorm by a fused channel L2 norm.  Weights load from the user-supplied
torch checkpoint via utils/torch_port.import_flownet2 (the reference requires
the same out-of-band download, README setup).

All configs use batchNorm=False (FlowNet2() default, models.py:24): convs have
bias + leaky 0.1.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.ops.cost_volume import correlation
from fsvid2vid_tpu.ops.image_ops import channel_norm, upsample_nearest
from fsvid2vid_tpu.ops.warp import flow_warp


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


class Conv(nn.Module):
    """conv + leaky(0.1) (submodules.py:7-18, batchNorm=False path)."""
    features: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=pad, name="conv")(x)
        return _leaky(x)


class IConv(nn.Module):
    """conv, no activation (submodules.py:20-29)."""
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding=1, name="conv")(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1) with exact torch semantics:
    conv_general_dilated with lhs_dilation=2 and padding k-1-p=2, kernel
    stored HWIO (importer flips/transposes the torch weight)."""
    features: int
    kernel_size: int = 4
    stride: int = 2
    torch_padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (k, k, cin, self.features))
        pad = k - 1 - self.torch_padding
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class Deconv(nn.Module):
    """deconv + leaky(0.1) (submodules.py:34-38)."""
    features: int

    @nn.compact
    def __call__(self, x):
        return _leaky(TorchConvTranspose(self.features, name="deconv")(x))


def _predict_flow(x, name):
    return nn.Conv(2, (3, 3), padding=1, name=name)(x)


def upsample_bilinear(x, factor):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), "bilinear")


class FlowNetC(nn.Module):
    """39,175,298 params (FlowNetC.py:11)."""

    @nn.compact
    def __call__(self, x1, x2):
        conv1 = Conv(64, 7, 2, name="conv1")
        conv2 = Conv(128, 5, 2, name="conv2")
        conv3 = Conv(256, 5, 2, name="conv3")
        a3 = conv3(conv2(conv1(x1)))
        b3 = conv3(conv2(conv1(x2)))

        corr = _leaky(correlation(a3, b3, max_displacement=20, stride=2))
        redir = Conv(32, 1, name="conv_redir")(a3)
        x = jnp.concatenate([redir, corr], axis=-1)  # 473ch

        out3_1 = Conv(256, name="conv3_1")(x)
        out4 = Conv(512, name="conv4_1")(Conv(512, 3, 2, name="conv4")(out3_1))
        out5 = Conv(512, name="conv5_1")(Conv(512, 3, 2, name="conv5")(out4))
        out6 = Conv(1024, name="conv6_1")(Conv(1024, 3, 2, name="conv6")(out5))

        flow6 = _predict_flow(out6, "predict_flow6")
        flow6_up = TorchConvTranspose(2, name="upsampled_flow6_to_5")(flow6)
        deconv5 = Deconv(512, name="deconv5")(out6)
        concat5 = jnp.concatenate([out5, deconv5, flow6_up], axis=-1)

        flow5 = _predict_flow(concat5, "predict_flow5")
        flow5_up = TorchConvTranspose(2, name="upsampled_flow5_to_4")(flow5)
        deconv4 = Deconv(256, name="deconv4")(concat5)
        concat4 = jnp.concatenate([out4, deconv4, flow5_up], axis=-1)

        flow4 = _predict_flow(concat4, "predict_flow4")
        flow4_up = TorchConvTranspose(2, name="upsampled_flow4_to_3")(flow4)
        deconv3 = Deconv(128, name="deconv3")(concat4)
        concat3 = jnp.concatenate([out3_1, deconv3, flow4_up], axis=-1)

        flow3 = _predict_flow(concat3, "predict_flow3")
        flow3_up = TorchConvTranspose(2, name="upsampled_flow3_to_2")(flow3)
        deconv2 = Deconv(64, name="deconv2")(concat3)
        a2 = conv2(conv1(x1))
        concat2 = jnp.concatenate([a2, deconv2, flow3_up], axis=-1)
        flow2 = _predict_flow(concat2, "predict_flow2")
        return flow2


class FlowNetS(nn.Module):
    """38,676,504 params (FlowNetS.py:13).  ConvTranspose flow upsamplers are
    bias-free (FlowNetS.py:42-45)."""
    input_channels: int = 12

    @nn.compact
    def __call__(self, x):
        out1 = Conv(64, 7, 2, name="conv1")(x)
        out2 = Conv(128, 5, 2, name="conv2")(out1)
        out3 = Conv(256, name="conv3_1")(Conv(256, 5, 2, name="conv3")(out2))
        out4 = Conv(512, name="conv4_1")(Conv(512, 3, 2, name="conv4")(out3))
        out5 = Conv(512, name="conv5_1")(Conv(512, 3, 2, name="conv5")(out4))
        out6 = Conv(1024, name="conv6_1")(Conv(1024, 3, 2, name="conv6")(out5))

        flow6 = _predict_flow(out6, "predict_flow6")
        flow6_up = TorchConvTranspose(2, use_bias=False,
                                      name="upsampled_flow6_to_5")(flow6)
        deconv5 = Deconv(512, name="deconv5")(out6)
        concat5 = jnp.concatenate([out5, deconv5, flow6_up], axis=-1)

        flow5 = _predict_flow(concat5, "predict_flow5")
        flow5_up = TorchConvTranspose(2, use_bias=False,
                                      name="upsampled_flow5_to_4")(flow5)
        deconv4 = Deconv(256, name="deconv4")(concat5)
        concat4 = jnp.concatenate([out4, deconv4, flow5_up], axis=-1)

        flow4 = _predict_flow(concat4, "predict_flow4")
        flow4_up = TorchConvTranspose(2, use_bias=False,
                                      name="upsampled_flow4_to_3")(flow4)
        deconv3 = Deconv(128, name="deconv3")(concat4)
        concat3 = jnp.concatenate([out3, deconv3, flow4_up], axis=-1)

        flow3 = _predict_flow(concat3, "predict_flow3")
        flow3_up = TorchConvTranspose(2, use_bias=False,
                                      name="upsampled_flow3_to_2")(flow3)
        deconv2 = Deconv(64, name="deconv2")(concat3)
        concat2 = jnp.concatenate([out2, deconv2, flow3_up], axis=-1)
        return _predict_flow(concat2, "predict_flow2")


class FlowNetSD(nn.Module):
    """45,371,666 params (FlowNetSD.py:9)."""

    @nn.compact
    def __call__(self, x):
        out0 = Conv(64, name="conv0")(x)
        out1 = Conv(128, name="conv1_1")(Conv(64, 3, 2, name="conv1")(out0))
        out2 = Conv(128, name="conv2_1")(Conv(128, 3, 2, name="conv2")(out1))
        out3 = Conv(256, name="conv3_1")(Conv(256, 3, 2, name="conv3")(out2))
        out4 = Conv(512, name="conv4_1")(Conv(512, 3, 2, name="conv4")(out3))
        out5 = Conv(512, name="conv5_1")(Conv(512, 3, 2, name="conv5")(out4))
        out6 = Conv(1024, name="conv6_1")(Conv(1024, 3, 2, name="conv6")(out5))

        flow6 = _predict_flow(out6, "predict_flow6")
        flow6_up = TorchConvTranspose(2, name="upsampled_flow6_to_5")(flow6)
        deconv5 = Deconv(512, name="deconv5")(out6)
        concat5 = jnp.concatenate([out5, deconv5, flow6_up], axis=-1)
        inter5 = IConv(512, name="inter_conv5")(concat5)

        flow5 = _predict_flow(inter5, "predict_flow5")
        flow5_up = TorchConvTranspose(2, name="upsampled_flow5_to_4")(flow5)
        deconv4 = Deconv(256, name="deconv4")(concat5)
        concat4 = jnp.concatenate([out4, deconv4, flow5_up], axis=-1)
        inter4 = IConv(256, name="inter_conv4")(concat4)

        flow4 = _predict_flow(inter4, "predict_flow4")
        flow4_up = TorchConvTranspose(2, name="upsampled_flow4_to_3")(flow4)
        deconv3 = Deconv(128, name="deconv3")(concat4)
        concat3 = jnp.concatenate([out3, deconv3, flow4_up], axis=-1)
        inter3 = IConv(128, name="inter_conv3")(concat3)

        flow3 = _predict_flow(inter3, "predict_flow3")
        flow3_up = TorchConvTranspose(2, name="upsampled_flow3_to_2")(flow3)
        deconv2 = Deconv(64, name="deconv2")(concat3)
        concat2 = jnp.concatenate([out2, deconv2, flow3_up], axis=-1)
        inter2 = IConv(64, name="inter_conv2")(concat2)
        return _predict_flow(inter2, "predict_flow2")


class FlowNetFusion(nn.Module):
    """581,226 params (FlowNetFusion.py:9)."""

    @nn.compact
    def __call__(self, x):
        out0 = Conv(64, name="conv0")(x)
        out1 = Conv(128, name="conv1_1")(Conv(64, 3, 2, name="conv1")(out0))
        out2 = Conv(128, name="conv2_1")(Conv(128, 3, 2, name="conv2")(out1))

        flow2 = _predict_flow(out2, "predict_flow2")
        flow2_up = TorchConvTranspose(2, name="upsampled_flow2_to_1")(flow2)
        deconv1 = Deconv(32, name="deconv1")(out2)
        concat1 = jnp.concatenate([out1, deconv1, flow2_up], axis=-1)
        inter1 = IConv(32, name="inter_conv1")(concat1)

        flow1 = _predict_flow(inter1, "predict_flow1")
        flow1_up = TorchConvTranspose(2, name="upsampled_flow1_to_0")(flow1)
        deconv0 = Deconv(16, name="deconv0")(concat1)
        concat0 = jnp.concatenate([out0, deconv0, flow1_up], axis=-1)
        inter0 = IConv(16, name="inter_conv0")(concat0)
        return _predict_flow(inter0, "predict_flow0")


class FlowNet2(nn.Module):
    """Full cascade (models.py:116-182).  im1/im2: (B, H, W, 3) with H, W
    multiples of 64; returns pixel-space flow (B, H, W, 2)."""
    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, im1, im2):
        # per-(sample, channel) mean over both frames (models.py:117-119)
        stacked = jnp.stack([im1, im2], axis=1)
        rgb_mean = stacked.mean(axis=(1, 2, 3), keepdims=True)[:, 0]
        x1 = (im1 - rgb_mean) / self.rgb_max
        x2 = (im2 - rgb_mean) / self.rgb_max

        # flownetc
        c_flow2 = FlowNetC(name="flownetc")(x1, x2)
        c_flow = upsample_bilinear(c_flow2 * self.div_flow, 4)

        warped1 = flow_warp(x2, c_flow)
        diff = channel_norm(x1 - warped1)
        concat1 = jnp.concatenate(
            [x1, x2, warped1, c_flow / self.div_flow, diff], axis=-1)

        # flownets1
        s1_flow2 = FlowNetS(name="flownets_1")(concat1)
        s1_flow = upsample_bilinear(s1_flow2 * self.div_flow, 4)
        warped1 = flow_warp(x2, s1_flow)
        diff = channel_norm(x1 - warped1)
        concat2 = jnp.concatenate(
            [x1, x2, warped1, s1_flow / self.div_flow, diff], axis=-1)

        # flownets2
        s2_flow2 = FlowNetS(name="flownets_2")(concat2)
        s2_flow = upsample_nearest(s2_flow2 * self.div_flow, 4)
        norm_s2 = channel_norm(s2_flow)
        warped_s2 = flow_warp(x2, s2_flow)
        diff_s2 = channel_norm(x1 - warped_s2)

        # flownetsd
        sd_flow2 = FlowNetSD(name="flownets_d")(
            jnp.concatenate([x1, x2], axis=-1))
        sd_flow = upsample_nearest(sd_flow2 / self.div_flow, 4)
        norm_sd = channel_norm(sd_flow)
        warped_sd = flow_warp(x2, sd_flow)
        diff_sd = channel_norm(x1 - warped_sd)

        concat3 = jnp.concatenate(
            [x1, sd_flow, s2_flow, norm_sd, norm_s2, diff_sd, diff_s2],
            axis=-1)  # 11ch
        return FlowNetFusion(name="flownetfusion")(concat3)


# ---------------------------------------------------------------------------
# Standalone sub-variants (models.py:185-470): the vendored repo exposes
# single-network and partial-cascade flow estimators; unused by the
# few-shot-vid2vid training path but part of the FlowNet2 model family.
# Each takes (im1, im2) in [0, rgb_max] and returns 1/4-res flow upsampled
# x4, scaled by div_flow (matching the torch wrappers' outputs).  All
# upsample bilinearly except FlowNet2CSS, whose final head is nearest
# (reference models.py:451 upsample3).
# ---------------------------------------------------------------------------

class _RgbNorm(nn.Module):
    rgb_max: float = 1.0

    def __call__(self, im1, im2):
        stacked = jnp.stack([im1, im2], axis=1)
        rgb_mean = stacked.mean(axis=(1, 2, 3), keepdims=True)[:, 0]
        return (im1 - rgb_mean) / self.rgb_max, (im2 - rgb_mean) / self.rgb_max


class FlowNet2C(nn.Module):
    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, im1, im2):
        x1, x2 = _RgbNorm(self.rgb_max)(im1, im2)
        flow2 = FlowNetC(name="flownetc")(x1, x2)
        return upsample_bilinear(flow2 * self.div_flow, 4)


class FlowNet2S(nn.Module):
    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, im1, im2):
        x1, x2 = _RgbNorm(self.rgb_max)(im1, im2)
        flow2 = FlowNetS(input_channels=6, name="flownets")(
            jnp.concatenate([x1, x2], axis=-1))
        return upsample_bilinear(flow2 * self.div_flow, 4)


class FlowNet2SD(nn.Module):
    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, im1, im2):
        x1, x2 = _RgbNorm(self.rgb_max)(im1, im2)
        flow2 = FlowNetSD(name="flownets_d")(
            jnp.concatenate([x1, x2], axis=-1))
        return upsample_bilinear(flow2 * self.div_flow, 4)


class FlowNet2CS(nn.Module):
    """FlowNetC -> warp -> FlowNetS refinement (models.py:350-413)."""
    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, im1, im2):
        x1, x2 = _RgbNorm(self.rgb_max)(im1, im2)
        c_flow = upsample_bilinear(
            FlowNetC(name="flownetc")(x1, x2) * self.div_flow, 4)
        warped = flow_warp(x2, c_flow)
        diff = channel_norm(x1 - warped)
        concat1 = jnp.concatenate(
            [x1, x2, warped, c_flow / self.div_flow, diff], axis=-1)
        s1_flow2 = FlowNetS(name="flownets_1")(concat1)
        return upsample_bilinear(s1_flow2 * self.div_flow, 4)


class FlowNet2CSS(nn.Module):
    """FlowNet2CS + a second FlowNetS stage (models.py:415-470)."""
    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, im1, im2):
        x1, x2 = _RgbNorm(self.rgb_max)(im1, im2)
        c_flow = upsample_bilinear(
            FlowNetC(name="flownetc")(x1, x2) * self.div_flow, 4)
        warped = flow_warp(x2, c_flow)
        diff = channel_norm(x1 - warped)
        concat1 = jnp.concatenate(
            [x1, x2, warped, c_flow / self.div_flow, diff], axis=-1)
        s1_flow = upsample_bilinear(
            FlowNetS(name="flownets_1")(concat1) * self.div_flow, 4)
        warped = flow_warp(x2, s1_flow)
        diff = channel_norm(x1 - warped)
        concat2 = jnp.concatenate(
            [x1, x2, warped, s1_flow / self.div_flow, diff], axis=-1)
        s2_flow2 = FlowNetS(name="flownets_2")(concat2)
        # reference quirk: the CSS final head upsamples NEAREST (models.py:451
        # upsample3), unlike every other stage's bilinear x4
        return upsample_nearest(s2_flow2 * self.div_flow, 4)
