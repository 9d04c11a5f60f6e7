"""Process-level runtime setup shared by the CLI entry points."""

from __future__ import annotations

import os


def enable_compile_cache(default_dir: str = "/tmp/jax_cache") -> None:
    """Turn on the persistent XLA compilation cache.

    Remote TPU compiles of the full train step take minutes; the persistent
    cache makes re-runs (and the train -> evaluate CLI sequence, which shares
    the eval-forward program) near-instant.  Override the location with
    ``HSPOSE_COMPILE_CACHE`` (set it to ``0``/``off`` to disable).
    """
    loc = os.environ.get("HSPOSE_COMPILE_CACHE", default_dir)
    if loc.lower() in ("0", "off", "none", ""):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", loc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
