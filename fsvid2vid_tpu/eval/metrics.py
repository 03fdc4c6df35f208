"""Quality metrics for synthesis parity tracking: PSNR, SSIM, LPIPS, FID.

The reference repo ships no eval code at all (BASELINE.md); the paper
(arXiv:1910.12713) reports LPIPS/FID, so this harness is what closes
BASELINE.json's "LPIPS/FID parity" metric.  TPU-native: everything is jittable
jax; torch appears nowhere (weights are imported from user-supplied torch
state_dicts via utils/torch_port-style converters, same policy as the VGG19
loss and the FlowNet2 teacher — this environment has no egress to download
them).

LPIPS follows the official lpips-vgg recipe (Zhang et al. 2018): VGG16
backbone taps after relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel
unit-normalization, learned 1x1 linear weights, spatial mean, layer sum, with
the official input scaling.  Without the calibration/backbone checkpoints it
still runs (random-projection backbone, uniform linear weights) but results
are flagged `calibrated: false` and are only comparable to themselves.

FID is the Frechet distance between Gaussian fits of feature distributions.
The canonical extractor is InceptionV3 pool3; any extractor can be plugged in,
and without an Inception checkpoint we default to the VGG16 relu4_3 tap
(flagged in the output as `feature_space`), which preserves ordering for
convergence tracking even though absolute values differ from Inception FID.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fsvid2vid_tpu.ops.image_ops import max_pool

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# pixel metrics
# ---------------------------------------------------------------------------

def psnr(a: Array, b: Array, data_range: float = 2.0) -> Array:
    """PSNR in dB.  Inputs in the generator's [-1, 1] range by default."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def ssim(a: Array, b: Array, data_range: float = 2.0) -> Array:
    """Mean SSIM over (B, H, W, C) batches (standard Gaussian 11x11 window,
    K1=0.01, K2=0.03 — Wang et al. 2004)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c = a.shape[-1]
    win = jnp.asarray(_gaussian_kernel(), jnp.float32)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu_ab + c1) * (2 * s_ab + c2) /
                ((mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)))
    return ssim_map.mean(axis=(-3, -2, -1))


# ---------------------------------------------------------------------------
# LPIPS (vgg16 backbone)
# ---------------------------------------------------------------------------

# torchvision vgg16.features: position == torchvision layer index.
_C, _R, _P = "conv", "relu", "pool"
VGG16_LAYERS = [
    (_C, 64), _R, (_C, 64), _R, _P,
    (_C, 128), _R, (_C, 128), _R, _P,
    (_C, 256), _R, (_C, 256), _R, (_C, 256), _R, _P,
    (_C, 512), _R, (_C, 512), _R, (_C, 512), _R, _P,
    (_C, 512), _R, (_C, 512), _R, (_C, 512), _R, _P,
]
# taps AFTER the relu at these indices: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_TAPS = (3, 8, 15, 22, 29)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

# official lpips input normalization (scaling_layer shift/scale)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class Vgg16Features(nn.Module):
    """vgg16.features activations at LPIPS tap indices."""
    taps: Sequence[int] = LPIPS_TAPS

    @nn.compact
    def __call__(self, x) -> List[Array]:
        results = []
        last = max(self.taps)
        for idx, layer in enumerate(VGG16_LAYERS):
            if layer == _R:
                x = nn.relu(x)
            elif layer == _P:
                x = max_pool(x, 2, 2, 0)
            else:
                x = nn.Conv(layer[1], (3, 3), padding=1, name=f"conv_{idx}")(x)
            if idx in self.taps:
                results.append(x)
            if idx >= last:
                break
        return results


@dataclasses.dataclass
class LpipsModel:
    """LPIPS distance.  `lin_weights[i]`: (C_i,) non-negative calibration
    weights (the official 1x1 convs); uniform 1/C_i when uncalibrated."""
    backbone_params: Dict
    lin_weights: List[np.ndarray]
    calibrated: bool
    _net: Vgg16Features = dataclasses.field(default_factory=Vgg16Features)

    def __call__(self, a: Array, b: Array) -> Array:
        """a, b: (B, H, W, 3) in [-1, 1].  Returns (B,) distances."""
        shift = jnp.asarray(_LPIPS_SHIFT)
        scale = jnp.asarray(_LPIPS_SCALE)
        fa = self._net.apply({"params": self.backbone_params},
                             (a - shift) / scale)
        fb = self._net.apply({"params": self.backbone_params},
                             (b - shift) / scale)
        total = 0.0
        for xa, xb, w in zip(fa, fb, self.lin_weights):
            na = xa * jax.lax.rsqrt(jnp.sum(xa * xa, -1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb * xb, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            total = total + jnp.mean(
                jnp.sum(d * jnp.asarray(w, d.dtype), axis=-1), axis=(-2, -1))
        return total


def make_lpips(vgg16_ckpt: Optional[str] = None,
               lpips_ckpt: Optional[str] = None,
               rng_seed: int = 0) -> LpipsModel:
    """Build LPIPS.  vgg16_ckpt: torchvision vgg16 state_dict (torch file);
    lpips_ckpt: official lpips vgg.pth (lin0..lin4.model.1.weight).  Either
    may be None -> uncalibrated fallback."""
    net = Vgg16Features()
    params = net.init(jax.random.PRNGKey(rng_seed),
                      jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree.map(np.asarray, params)
    calibrated = True
    if vgg16_ckpt:
        from fsvid2vid_tpu.utils.torch_port import import_vgg_features
        params = import_vgg_features(params, vgg16_ckpt)
    else:
        calibrated = False
    if lpips_ckpt:
        lin = import_lpips_lin(lpips_ckpt)
    else:
        lin = [np.full((c,), 1.0 / c, np.float32) for c in LPIPS_CHANNELS]
        calibrated = False
    return LpipsModel(backbone_params=params, lin_weights=lin,
                      calibrated=calibrated)


def import_lpips_lin(ckpt_path: str) -> List[np.ndarray]:
    """Official lpips vgg.pth: linK.model.1.weight of shape (1, C, 1, 1)."""
    import torch
    payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    lins = []
    for k in range(5):
        w = payload[f"lin{k}.model.1.weight"].detach().numpy()
        lins.append(np.maximum(w.reshape(-1), 0.0).astype(np.float32))
    return lins


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------

def feature_stats(feats: np.ndarray):
    """Gaussian fit of (N, D) features."""
    mu = feats.mean(0)
    cov = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 (C1 C2)^{1/2}), via eigendecomposition
    of the symmetrized product (scipy-free)."""
    diff = mu1 - mu2
    # sqrtm(C1 C2) trace == sum of sqrt eigenvalues of C1 C2; use the
    # symmetric form S = C1^{1/2} C2 C1^{1/2} whose eigs are real >= 0.
    vals1, vecs1 = np.linalg.eigh(cov1 + eps * np.eye(cov1.shape[0]))
    sq1 = (vecs1 * np.sqrt(np.maximum(vals1, 0))) @ vecs1.T
    s = sq1 @ (cov2 + eps * np.eye(cov2.shape[0])) @ sq1
    svals = np.linalg.eigvalsh((s + s.T) / 2)
    tr_sqrt = np.sqrt(np.maximum(svals, 0)).sum()
    # the eps regularizers can push an exact-zero distance a hair negative
    return float(max(0.0, diff @ diff + np.trace(cov1) + np.trace(cov2)
                     - 2 * tr_sqrt))


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    mu_r, c_r = feature_stats(real)
    mu_f, c_f = feature_stats(fake)
    return frechet_distance(mu_r, c_r, mu_f, c_f)


def make_vgg_fid_extractor(lpips_model: LpipsModel,
                           tap_index: int = 3) -> Callable:
    """Feature extractor for FID using the LPIPS backbone's relu4_3 tap,
    global-average-pooled to (B, 512).  Not Inception FID — values are only
    comparable within this feature space (reported as such by eval.py)."""
    net = lpips_model._net

    @jax.jit
    def extract(imgs: Array) -> Array:
        shift = jnp.asarray(_LPIPS_SHIFT)
        scale = jnp.asarray(_LPIPS_SCALE)
        feats = net.apply({"params": lpips_model.backbone_params},
                          (imgs - shift) / scale)
        return feats[tap_index].mean(axis=(1, 2))
    return extract
