"""Runtime knobs: persistent compilation cache, platform helpers.

XLA compiles through the axon relay cost ~60 s per gather-heavy program
(measured); the persistent compilation cache makes every program a
one-time cost across runs.  Called by the CLIs and bench.
"""
from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "sparsefusion_tpu_xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
