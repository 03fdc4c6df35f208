"""Spectral normalization as pure functions over explicit power-iteration state.

The reference wraps nearly every conv/linear in torch spectral_norm
(architecture.py:60,78-84; generator.py:106-109; normalization.py:64-66).  Torch
keeps `u`/`v` as buffers mutated in-place each forward; here the power-iteration
vectors are explicit state threaded through the functional train step (stored in
a 'spectral' flax collection), keeping everything jit-pure.

Semantics match torch.nn.utils.spectral_norm: weight matrix W is the tensor
reshaped to (dim0, -1) with dim0 = out_features; one power iteration per
training step under stop_gradient; sigma = u^T W v with gradients flowing only
through W; normalized weight = W / sigma.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12

# Power iterations per training step.  torch advances u/v once per FORWARD
# and the reference runs every net's forward twice per training iteration
# (no-grad D phase + grad G phase), so its effective advancement is 2x/step;
# our single-generation step advances 1x.  Default 1 preserves exact step-1
# parity with the reference's D phase; 2 matches its long-horizon dynamics
# (measured: docs/CONVERGENCE.md "Drift diagnosis").  Set once before model
# tracing via set_power_iters (training/state.py::build_models reads
# cfg.sn_power_iters); the value is baked into traced programs.
_POWER_ITERS = 1


def set_power_iters(n: int) -> None:
    global _POWER_ITERS
    assert n >= 1
    _POWER_ITERS = int(n)


def _l2norm(x: jnp.ndarray) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x) + _EPS)


def spectral_normalize(w_mat: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                       update: bool) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normalize a (dout, din) matrix by its leading singular value.

    Returns (sigma, new_u, new_v).  When `update`, runs _POWER_ITERS power
    iterations (torch does one per forward in train mode); otherwise uses
    the stored vectors.
    """
    w32 = w_mat.astype(jnp.float32)
    if update:
        for _ in range(_POWER_ITERS):
            v = _l2norm(jax.lax.stop_gradient(w32).T @ u)
            u = _l2norm(jax.lax.stop_gradient(w32) @ v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (w32 @ v)
    return sigma, u, v


def conv_kernel_matrix(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO conv kernel -> torch-style (Cout, Cin*kh*kw) matrix.

    torch stores (Cout, Cin, kh, kw) and flattens trailing dims; replicate the
    exact element order so ported checkpoints give identical sigmas.
    """
    kh, kw, cin, cout = kernel.shape
    return jnp.transpose(kernel, (3, 2, 0, 1)).reshape(cout, cin * kh * kw)


def dense_kernel_matrix(kernel: jnp.ndarray) -> jnp.ndarray:
    """flax (din, dout) dense kernel -> torch-style (dout, din) matrix."""
    return kernel.T
