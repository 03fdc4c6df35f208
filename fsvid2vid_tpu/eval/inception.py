"""InceptionV3 pool3 feature extractor for standard FID.

The canonical FID statistic (Heusel et al. 2017; pytorch-fid) uses the
2048-d InceptionV3 "pool3" features.  The reference repo ships no eval code
at all and this environment cannot download checkpoints, so eval/metrics.py
defaults FID to VGG-space features; this module makes FID *standard* the
moment a user supplies a torchvision-layout `inception_v3` state_dict
(torchvision's `Inception_V3_Weights` file or pytorch-fid's converted
`pt_inception-2015-12-05` weights — both use the same
`Mixed_5b.branch1x1.conv.weight`-style key paths for the feature trunk).

Architecture transcribed from the torchvision inception_v3 feature trunk
(aux head excluded; BasicConv2d = bias-free conv + BN(eps=1e-3) + relu),
NHWC, eval-mode BN with imported running statistics.  Flax module names
mirror the torch key paths exactly, so the importer is a mechanical walk.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fsvid2vid_tpu.ops.image_ops import max_pool

Array = jnp.ndarray


class BasicConv2d(nn.Module):
    """conv(bias=False) + BatchNorm(eps=0.001, eval) + relu."""
    features: int
    kernel: Sequence[int]
    stride: int = 1
    padding: Sequence = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=(self.stride, self.stride),
                    padding=tuple(self.padding), use_bias=False,
                    name="conv")(x)
        # eval-only: scale/bias/mean/var are imported buffers
        c = x.shape[-1]
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool3(x):
    """3x3 stride-1 avg pool, pad 1, count_include_pad=True (torch default
    for InceptionA/C/E branch_pool)."""
    s = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jax.lax.reduce_window(s, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), "VALID")
    return out / 9.0


def _p(k):
    return ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_p((5, 5)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_p((3, 3)),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_p((3, 3)),
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_p((3, 3)),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2, 0)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2, 0)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3_2b")(b3)], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_p((3, 3)),
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3dbl_3b")(bd)], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """Feature trunk up to the 2048-d global average pool."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_p((3, 3)),
                        name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2, 0)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2, 0)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))          # (B, 2048)


def _resize_bilinear(x: Array, size: int = 299) -> Array:
    return jax.image.resize(
        x, (x.shape[0], size, size, x.shape[-1]), "bilinear")


def make_inception_extractor(ckpt_path: str, batch: int = 16):
    """Returns imgs(B,H,W,3 in [-1,1]) -> (B, 2048) pool3 features, jitted.

    ckpt_path: torch state_dict with torchvision inception_v3 key layout
    (also matches pytorch-fid's converted FID weights for the trunk)."""
    net = InceptionV3Pool3()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 299, 299, 3)))["params"]
    params = import_inception(jax.tree.map(np.asarray, params), ckpt_path)

    @jax.jit
    def extract(imgs: Array) -> Array:
        return net.apply({"params": params},
                         _resize_bilinear(imgs.astype(jnp.float32)))
    return extract


_BN_LEAF = {"bn_scale": "bn.weight", "bn_bias": "bn.bias",
            "bn_mean": "bn.running_mean", "bn_var": "bn.running_var"}


def import_inception(flax_params: Dict, ckpt_path: str) -> Dict:
    """torchvision inception_v3 state_dict -> InceptionV3Pool3 params.

    Flax module names mirror the torch key paths, so each leaf maps to
    '<dotted.path>.conv.weight' (OIHW->HWIO) or '<dotted.path>.bn.*'."""
    from fsvid2vid_tpu.utils.torch_port import _load_torch_state_dict, \
        conv_to_hwio
    sd = _load_torch_state_dict(ckpt_path)

    # flax tree: {module: {conv: {kernel}, bn_scale...}} — BasicConv2d stores
    # the conv kernel under its 'conv' submodule and bn_* as its own params
    def walk2(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict):
                out[k] = walk2(v, p)
            else:
                # leaf: path like [..., 'Conv2d_1a_3x3', 'conv', 'kernel']
                # or [..., 'Conv2d_1a_3x3', 'bn_scale']
                if k == "kernel":
                    torch_key = ".".join(path) + ".weight"
                    w = conv_to_hwio(sd[torch_key])
                else:
                    mod_path = ".".join(path)
                    torch_key = f"{mod_path}.{_BN_LEAF[k]}"
                    w = np.asarray(sd[torch_key], np.float32)
                assert w.shape == np.shape(v), (torch_key, w.shape,
                                                np.shape(v))
                out[k] = w
        return out

    return walk2(flax_params, [])
