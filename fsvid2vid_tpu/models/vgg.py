"""VGG19 feature extractor for the perceptual loss (reference
models/networks/vgg.py: VGG_Activations over torchvision vgg19 features with
taps at layer indices [1, 6, 11, 20, 29] = relu1_1, relu2_1, relu3_1, relu4_1,
relu5_1; no input renormalization — images stay in the generator's [-1, 1]
range, matching loss.py:110 usage).

Pretrained ImageNet weights are not bundled (the reference downloads them via
torchvision at runtime; this environment has no egress).  Use
`fsvid2vid_tpu.utils.torch_port.import_vgg19` to load a user-supplied
torchvision `vgg19` state_dict; otherwise the extractor runs with fixed
random weights — still a valid multi-scale random-projection perceptual loss,
but not numerically comparable to the reference.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.ops.image_ops import max_pool

# torchvision vgg19.features sequence: ('conv', out_ch) | 'relu' | 'pool',
# list position == torchvision layer index.
_C, _R, _P = "conv", "relu", "pool"
VGG19_LAYERS = [
    (_C, 64), _R, (_C, 64), _R, _P,
    (_C, 128), _R, (_C, 128), _R, _P,
    (_C, 256), _R, (_C, 256), _R, (_C, 256), _R, (_C, 256), _R, _P,
    (_C, 512), _R, (_C, 512), _R, (_C, 512), _R, (_C, 512), _R, _P,
    (_C, 512), _R, (_C, 512), _R, (_C, 512), _R, (_C, 512), _R, _P,
]
VGG_LOSS_TAPS = (1, 6, 11, 20, 29)      # loss.py:110
VGG_LOSS_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)  # loss.py:112


class Vgg19Features(nn.Module):
    """Runs vgg19.features, returning activations at `taps` layer indices
    (tap semantics: output AFTER applying the layer at that index, matching
    VGG_Activations.forward vgg.py:53-58)."""
    taps: Sequence[int] = VGG_LOSS_TAPS

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        results = []
        last = max(self.taps)
        for idx, layer in enumerate(VGG19_LAYERS):
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
