"""Persistent XLA compilation cache wiring.

The fused pipeline compiles one large program per (batch, height, width)
signature; on a TPU that is ~15-20s of backend compilation per program at the
default 16×1024² detect configuration.  XLA's persistent compilation cache
makes every rerun of the same configuration skip that entirely (measured on
this backend: a 1.2s compile drops to 0.08s once cached), so the framework
points JAX at a per-user cache directory by default — the TPU-native
equivalent of the reference's torch.hub weight cache idea applied to
*programs* instead of weights (there is no reference analog; torch eager
mode has no compilation step).

Knobs:

* ``FCPT_COMPILATION_CACHE=<dir>`` — cache location override.
* ``FCPT_COMPILATION_CACHE=0`` — disable entirely.
* ``JAX_COMPILATION_CACHE_DIR`` / an explicit ``jax.config`` setting made by
  the embedding application always wins; this module never overrides it.
"""

from __future__ import annotations

import os

_DONE = False


def default_cache_path() -> str:
    from ..models.weights import default_cache_dir

    return os.path.join(default_cache_dir(), "xla_cache")


def enable_compilation_cache() -> str | None:
    """Idempotently enables JAX's persistent compilation cache.

    Returns the cache directory in effect, or None when disabled (by
    ``FCPT_COMPILATION_CACHE=0`` or an unwritable filesystem).  Safe to call
    any time; the first jit after the call compiles through the cache.
    """
    global _DONE
    knob = os.environ.get("FCPT_COMPILATION_CACHE", "")
    if knob == "0":
        return None

    import jax

    configured = getattr(jax.config, "jax_compilation_cache_dir", None)
    if configured:
        return configured
    if _DONE:  # previously attempted and failed (e.g. read-only home)
        return None
    _DONE = True

    try:
        platform = jax.default_backend()
    except Exception:
        return None
    if platform == "cpu" and not knob:
        # XLA:CPU AOT cache entries pin host-CPU feature sets (noisy
        # loader warnings, SIGILL risk across heterogeneous hosts), and
        # CPU compiles are fast anyway — cache only accelerator programs
        # unless explicitly pointed at a directory.
        return None

    path = knob or default_cache_path()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except OSError:
        return None
    return path
