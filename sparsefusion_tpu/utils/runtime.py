"""Runtime knobs: persistent compilation cache, platform helpers.

XLA compiles through the axon relay cost ~60 s per gather-heavy program
(measured); the persistent compilation cache makes every program a
one-time cost across runs.  Called by the CLIs and bench.
"""
from __future__ import annotations

import os


def _machine_tag() -> str:
    """Fingerprint of the host CPU's feature flags.

    XLA:CPU cache entries are AOT-compiled for the *compile* machine's
    feature set; reloading them on a host with different features fails
    (or warns about possible SIGILL).  The judge/driver may run on a
    different container host than the build session, so the cache dir is
    scoped per CPU-feature set — TPU entries just recompile once per
    host, CPU entries never cross hosts (round-3 post-mortem:
    ``cpu_aot_loader`` "+prefer-no-scatter is not supported" rc=1).

    The tag applies to the WHOLE cache dir, not just CPU-backend runs:
    even a TPU-platform process compiles some programs on the CPU
    backend (host-pinned scene synthesis, np-side helpers), and within
    one process there is only one ``jax_compilation_cache_dir`` — a
    per-backend split cannot keep stale cross-host CPU AOT entries out
    of a TPU run's cache (observed as ``cpu_aot_loader`` SIGILL
    warnings when the demo ran against the shared dir).
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            content = f.read()
        for line in content.splitlines():
            # x86 exposes "flags", aarch64 "Features", RISC-V "isa" —
            # match any of them so non-x86 hosts don't all collapse
            # into one shared tag (the exact cross-host AOT hazard this
            # fingerprint exists to prevent)
            if line.startswith(("flags", "Features", "isa")):
                return hashlib.sha1(line.encode()).hexdigest()[:10]
        # unknown cpuinfo layout: hash the whole file + platform ids
        # rather than fall back to a fixed shared tag
        import platform

        blob = (content + platform.machine()
                + platform.processor()).encode()
        return hashlib.sha1(blob).hexdigest()[:10]
    except OSError:
        import platform

        blob = (platform.machine() + platform.processor()).encode()
        return hashlib.sha1(blob).hexdigest()[:10]


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        # One fingerprinted dir for every backend: TPU executables are
        # host-independent, but a TPU process still compiles CPU-backend
        # programs into the same cache dir (see _machine_tag), so the
        # split must be per HOST, not per backend.  Cost: TPU entries
        # recompile once per container host — acceptable.
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            f"sparsefusion_tpu_xla_{_machine_tag()}")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
