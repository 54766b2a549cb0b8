"""Persistent XLA compilation cache across processes.

The reference pays PyTorch's CUDA warmup once per process; under JAX the
equivalent cost is XLA compilation — ~75 s for the 512 px one-step graph on
the remote-compile TPU backend, which dominates any single-image CLI
session. jax ships a persistent on-disk compilation cache keyed by the HLO
fingerprint; enabling it makes the second process start of the same CLI
skip compilation entirely.

Enabled automatically by every CLI main; opt out with
OMGSR_COMPILATION_CACHE=0, redirect with OMGSR_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/omgsr_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache. Returns the cache dir,
    or None if disabled via OMGSR_COMPILATION_CACHE=0. Safe to call more
    than once and before/after backend initialization."""
    if os.environ.get("OMGSR_COMPILATION_CACHE", "1") == "0":
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("OMGSR_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # keep jax's default compile-time/size floors: the cache has no
    # eviction, and persisting every tiny per-shape helper graph (the
    # exact-VAE op plan, degradation variants) would grow it without bound
    # for graphs that recompile in well under a second anyway
    return cache_dir
