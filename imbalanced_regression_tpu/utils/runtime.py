"""Runtime/compiler configuration helpers.

The reference has no compile step to manage; under XLA every new process
pays 20-60 s to compile the train program (first jit). The persistent
compilation cache amortizes that across processes — sweeps, multi-seed
studies, babysitter restarts, and production relaunches all reuse the
on-disk executable when shapes and flags match.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_ENV_VAR = "DIR_TPU_COMPILE_CACHE"


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument, the ``DIR_TPU_COMPILE_CACHE`` env
    var, else disabled (returns None). Safe to call more than once; must run
    before the first compilation to help that compilation."""
    import jax

    cache_dir = cache_dir or os.environ.get(_ENV_VAR, "")
    if not cache_dir:
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default thresholds skip small/fast programs; sweeps want everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    logger.info("Persistent compilation cache: %s", cache_dir)
    return cache_dir
