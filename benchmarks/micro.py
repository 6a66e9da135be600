"""Micro-benchmarks for the hot ops (run on TPU; prints one line each).

    python benchmarks/micro.py [grid|render|unet|all]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    return (time.perf_counter() - t0) / iters


def bench_grid_encode():
    from sparsefusion_tpu.nn.ngp import NGPConfig
    from sparsefusion_tpu.ops.grid_encode import grid_encode_bound, init_grid_params

    enc = NGPConfig().encoding()
    table = init_grid_params(jax.random.PRNGKey(0), enc)
    n = 2_097_152  # 128x128 rays x 128 samples
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-4,
                           maxval=4)

    f = jax.jit(lambda x, t: grid_encode_bound(x, t, enc, bound=4.0))
    dt = timeit(f, x, table)
    print(f"grid_encode fwd: {n / dt / 1e6:.1f} Mpts/s  ({dt*1e3:.2f} ms "
          f"for {n} pts)")

    g = jax.jit(jax.grad(
        lambda t, x: grid_encode_bound(x, t, enc, bound=4.0).sum()))
    dt = timeit(g, table, x)
    print(f"grid_encode fwd+bwd: {n / dt / 1e6:.1f} Mpts/s ({dt*1e3:.2f} ms)")


def bench_render():
    from sparsefusion_tpu.nn.ngp import NGPConfig, NGPField
    from sparsefusion_tpu.render.volume import (
        VolumeRendererConfig,
        render_rays_chunked,
    )

    model = NGPField(NGPConfig())
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)))["params"]
    n_rays = 128 * 128
    o = jnp.tile(jnp.array([[0.0, 0.0, -8.0]]), (n_rays, 1))
    d = jax.random.normal(jax.random.PRNGKey(1), (n_rays, 3)) * 0.05 \
        + jnp.array([0.0, 0.0, 1.0])
    cfg = VolumeRendererConfig()

    def fwd(params, o, d, key):
        field = lambda x: model.apply({"params": params}, x)
        return render_rays_chunked(field, o, d, cfg, key, perturb=True,
                                   det_importance=False, remat=True)["image"]

    f = jax.jit(fwd)
    dt = timeit(f, params, o, d, jax.random.PRNGKey(2), iters=10)
    print(f"ngp render fwd: {n_rays / dt / 1e6:.2f} Mrays/s ({dt*1e3:.1f} ms"
          f" for 128x128 @ 64+64 samples)")

    def loss(params, o, d, key):
        return fwd(params, o, d, key).mean()

    g = jax.jit(jax.grad(loss))
    dt = timeit(g, params, o, d, jax.random.PRNGKey(2), iters=10)
    print(f"ngp render fwd+bwd: {n_rays / dt / 1e6:.2f} Mrays/s "
          f"({dt*1e3:.1f} ms)")


def bench_unet():
    from sparsefusion_tpu.nn.unet import EfficientUNet, UNetConfig

    model = EfficientUNet(UNetConfig(), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 4))
    log_snr = jnp.zeros((1,))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 256))
    shapes = jax.eval_shape(
        lambda k: model.init(k, x, log_snr, cond)["params"],
        jax.random.PRNGKey(2))
    host = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            host.standard_normal(s.shape).astype(np.float32) * 0.02),
        shapes)
    f = jax.jit(lambda p, x: model.apply({"params": p}, x, log_snr, cond))
    dt = timeit(f, params, x)
    print(f"unet denoise: {1 / dt:.1f} steps/s ({dt*1e3:.1f} ms/step, "
          f"batch 1, 32x32x4, bf16)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("grid", "all"):
        bench_grid_encode()
    if which in ("render", "all"):
        bench_render()
    if which in ("unet", "all"):
        bench_unet()
