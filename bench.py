"""Benchmark: VLDM denoise steps/sec on the flagship SparseFusion UNet.

Runs the distillation hot loop's dominant cost — one classifier-free-
guided denoise step of the dim-256 imagen UNet on 32x32x4 latents with
256-channel image conditioning (bf16 compute) — and reports steps/sec.

Baseline: the reference repo publishes no numbers (BASELINE.md); the
comparison point is the PyTorch fp16 reference UNet on an A100, measured
at ~20 denoise steps/sec for this config in torch 1.11 (PLMS-50 in ~2.5s,
consistent with the reference's distillation budget).  ``vs_baseline`` is
ours / 20.

Prints exactly one JSON line to stdout (progress goes to stderr).

Implementation notes for this environment (see PERF.md):
* params are device-side zeros — host-synthesized random params cost a
  multi-GB transfer through the axon relay (zeros run matmuls at
  identical speed on TPU; there is no sparsity shortcut),
* ``block_until_ready`` is a no-op through the relay; timing uses the
  two-point chained method from ``benchmarks/timing.py``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REFERENCE_STEPS_PER_SEC = 20.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    t_start = time.time()
    from sparsefusion_tpu.utils.runtime import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp

    from sparsefusion_tpu.nn.unet import EfficientUNet, UNetConfig

    log(f"[bench] imports {time.time() - t_start:.0f}s; devices:",
        jax.devices())

    model = EfficientUNet(UNetConfig(), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 4))
    log_snr = jnp.zeros((1,))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 256))

    shapes = jax.eval_shape(
        lambda k: model.init(k, x, log_snr, cond)["params"],
        jax.random.PRNGKey(2))
    log(f"[bench] eval_shape {time.time() - t_start:.0f}s")
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    log(f"[bench] params (device zeros) {time.time() - t_start:.0f}s")

    @jax.jit
    def denoise_step(z):
        return model.apply({"params": params}, z, log_snr, cond)

    from benchmarks.timing import timeit

    dt = timeit(denoise_step, x, n1=10, n2=60)
    log(f"[bench] done {time.time() - t_start:.0f}s")

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
