"""Persistent XLA compilation cache setup.

Compiles on the tunneled TPU backend go through a remote AOT helper and can
take minutes for large grids (256^3 step ~1-6 min). The persistent cache
makes every compile a one-time cost per (program, shape, flags) across
processes. Wired into the CLI and bench entrypoints but OPT-IN via
MSM_COMPILE_CACHE=1 (see note in enable_compilation_cache).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    # Opt-in (MSM_COMPILE_CACHE=1 or a path): a cache-enabled run was
    # observed to stall indefinitely against the axon remote-compile helper,
    # so the default stays off until that interaction is understood.
    if os.environ.get("MSM_NO_COMPILE_CACHE") == "1":
        return
    if not os.environ.get("MSM_COMPILE_CACHE"):
        return
    import jax

    path = cache_dir or os.environ.get(
        "MSM_COMPILE_CACHE", os.path.expanduser("~/.cache/msm_tpu/jax")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never fail startup on it
        pass
