"""Classic GAN fake-image replay pool (reference util/image_pool.py:10-37).

The reference instantiates it with size 0 (loss_collector.py:31), making it a
pass-through; the full replay behavior is implemented for parity.  Host-side
numpy state (pools are inherently stateful and tiny)."""
from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.rng = np.random.RandomState(seed)
        self.num_imgs = 0
        self.images = []

    def query(self, images: np.ndarray) -> np.ndarray:
        """images: (B, ...) batch; returns a batch mixing current fakes with
        replayed history (50% swap probability once the pool is full)."""
        if self.pool_size == 0:
            return images
        out = []
        for image in np.asarray(images):
            if self.num_imgs < self.pool_size:
                self.num_imgs += 1
                self.images.append(image.copy())
                out.append(image)
            elif self.rng.rand() > 0.5:
                idx = self.rng.randint(self.pool_size)
                out.append(self.images[idx].copy())
                self.images[idx] = image.copy()
            else:
                out.append(image)
        return np.stack(out)
