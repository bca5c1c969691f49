"""Persistent XLA compilation cache wiring.

The reference has nothing to replace here — PyTorch eager pays no compile
step — but this framework's serving path is one large jitted program whose
REMOTE compile costs minutes per shape (CLAUDE.md).  JAX's persistent
compilation cache serializes the compiled executable keyed on (HLO, compile
options, backend); the axon TPU backend round-trips it correctly (verified:
cache HITS through the tunnel), so a warm cache turns every serving-CLI
restart and every bench rerun into a seconds-long startup.

Best-effort by design: a backend that cannot serialize executables just
logs and compiles normally, so callers never need to guard the call.
"""

from __future__ import annotations

import os
import sys

DEFAULT_DIR = "/tmp/mdrt_jax_cache"
_ENV = "MDRT_COMPILE_CACHE"


def enable_compile_cache(cache_dir: str | None = None,
                         min_compile_secs: float = 1.0) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Resolution order: explicit `cache_dir` arg, then the MDRT_COMPILE_CACHE
    env var, then DEFAULT_DIR.  The literal value "off" disables.  Returns
    the directory in use, or None when disabled/unavailable.  Safe to call
    any time before (or after — affects later compiles) first device use.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(_ENV) or DEFAULT_DIR
    if not cache_dir or cache_dir == "off":
        return None
    try:
        changed = (jax.config.jax_compilation_cache_dir != cache_dir)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # entries cheaper than this recompile faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        if changed:
            # the cache backend binds its directory at first use; without a
            # reset, re-arming with a different dir in an already-compiled
            # process silently keeps writing to the old one
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
    except Exception as e:  # never let cache plumbing break the caller
        print(f"# compile cache unavailable: {str(e)[-120:]}",
              file=sys.stderr)
        return None
    return cache_dir
