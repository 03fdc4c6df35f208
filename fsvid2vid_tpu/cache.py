"""Persistent XLA compilation cache setup.

512px programs take minutes to compile through the remote-TPU tunnel; caching
compiled executables on disk makes repeated bench/train invocations start in
seconds.  Call early (before the first jit execution)."""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax
    cache_dir = cache_dir or os.environ.get(
        "FSV2V_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    # segregate per backend: CPU AOT artifacts are machine-feature-specific
    # and must not collide with the TPU tunnel's compiles
    cache_dir = os.path.join(cache_dir, jax.default_backend())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
