"""Persistent XLA compilation cache.

First compiles through the remote-TPU tunnel are slow (tens of seconds to
minutes); enabling jax's on-disk compilation cache makes every subsequent
process reuse them. Import-and-call from every entry point.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    import jax

    cache_dir = str(path or os.environ.get("GOSSIPNET_JAX_CACHE", _DEFAULT))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: cache simply disabled
