"""GAN objectives (reference models/networks/loss.py:17-142).

Operates on multiscale-discriminator outputs: a list (per scale) of lists of
per-layer features, where the last entry of each inner list is the logit map.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _loss_single(logits: Array, target_is_real: bool, mode: str,
                 for_discriminator: bool) -> Array:
    x = logits.astype(jnp.float32)
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -jnp.mean(jnp.minimum(x - 1, 0.0))
            return -jnp.mean(jnp.minimum(-x - 1, 0.0))
        assert target_is_real, "generator hinge loss aims for real"
        return -jnp.mean(x)
    if mode == "ls":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((x - target) ** 2)
    if mode == "original":
        target = jnp.full_like(x, 1.0 if target_is_real else 0.0)
        return jnp.mean(
            jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))
    if mode == "w":
        return -jnp.mean(x) if target_is_real else jnp.mean(x)
    raise ValueError(f"unknown gan mode {mode}")


def gan_loss(pred: Union[Array, List], target_is_real: bool, mode: str = "hinge",
             for_discriminator: bool = True) -> Array:
    """Mean loss over scales; inner lists use their final (logit) entry
    (loss.py:92-104)."""
    if isinstance(pred, (list, tuple)):
        losses = []
        for p in pred:
            if isinstance(p, (list, tuple)):
                p = p[-1]
            losses.append(_loss_single(p, target_is_real, mode,
                                       for_discriminator))
        return sum(losses) / len(losses)
    return _loss_single(pred, target_is_real, mode, for_discriminator)


def feature_matching_loss(pred_real, pred_fake, lambda_feat: float) -> Array:
    """L1 between D features of fake and (detached) real at every layer but
    the logits, averaged over scales (loss_collector.py:206-215)."""
    num_D = len(pred_fake)
    loss = 0.0
    for i in range(num_D):
        for j in range(len(pred_fake[i]) - 1):
            real = jax.lax.stop_gradient(pred_real[i][j])
            loss += jnp.mean(jnp.abs(pred_fake[i][j] - real)) / num_D
    return loss * lambda_feat


def masked_l1_loss(x: Array, target: Array, mask) -> Array:
    """mean(|x*m - t*m|) (loss.py:130-138: mask multiplies both operands)."""
    return jnp.mean(jnp.abs(x * mask - target * mask))


def l1_loss(x: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(x - target))


def kld_loss(mu: Array, logvar: Array) -> Array:
    """-0.5 * sum(1 + logvar - mu^2 - e^logvar) (loss.py:140-142)."""
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
