"""Micro-benchmarks for the hot ops (run on TPU; prints one line each).

    python benchmarks/micro.py [grid|render|unet|matmul|all]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timeit


def bench_matmul():
    x = jnp.ones((8192, 8192), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    dt = timeit(f, x)
    print(f"matmul 8k bf16: {dt*1e3:.2f} ms -> "
          f"{2 * 8192**3 / dt / 1e12:.1f} TFLOP/s")


def bench_grid_encode(n = 2_097_152, reference_path: bool = False):
    from sparsefusion_tpu.nn.ngp import NGPConfig
    from sparsefusion_tpu.ops.grid_encode import (
        grid_encode_bound,
        init_grid_params,
    )
    from sparsefusion_tpu.ops.grid_encode_blocked import (
        blocked_grid_encode_bound,
        make_blocked_encoding,
    )

    enc = NGPConfig().encoding()
    blk = make_blocked_encoding(enc)
    table = init_grid_params(jax.random.PRNGKey(0), enc)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-4,
                           maxval=4)

    if reference_path:
        step = jax.jit(
            lambda t: t + 1e-12 * jnp.sum(grid_encode_bound(x, t, enc, 4.0)))
        dt = timeit(step, table, n1=2, n2=6)
        print(f"grid_encode (per-corner) fwd: {n / dt / 1e6:.1f} Mpts/s "
              f"({dt*1e3:.2f} ms for {n} pts)")

    bstep = jax.jit(lambda t: t + 1e-12 * jnp.sum(
        blocked_grid_encode_bound(x, t, blk, 4.0)))
    dt = timeit(bstep, table, n1=2, n2=10)
    print(f"grid_encode (blocked) fwd: {n / dt / 1e6:.1f} Mpts/s "
          f"({dt*1e3:.2f} ms for {n} pts)")

    gstep = jax.jit(lambda t: t - 1e-12 * jax.grad(
        lambda tt: blocked_grid_encode_bound(x, tt, blk, 4.0).sum())(t))
    dt = timeit(gstep, table, n1=2, n2=10)
    print(f"grid_encode (blocked) fwd+bwd: {n / dt / 1e6:.1f} Mpts/s "
          f"({dt*1e3:.2f} ms)")


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

    from sparsefusion_tpu.nn.ngp import NGPField

    def render(params):
        tables = model.apply({"params": params},
                             method=NGPField.expand_tables)
        field = lambda x: model.apply({"params": params}, x, tables)
        return render_rays_chunked(field, o, d, cfg, jax.random.PRNGKey(2),
                                   perturb=True, det_importance=False,
                                   remat=True)["image"]

    step = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda q: q + 1e-12 * jnp.sum(render(p)), p))
    dt = timeit(step, params, n1=2, n2=8)
    print(f"ngp render fwd: {n_rays / dt / 1e6:.2f} Mrays/s ({dt*1e3:.1f} ms"
          f" for 128x128 @ 64+64 samples)")

    gstep = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda a, b: a - 1e-12 * b, p,
        jax.grad(lambda q: render(q).mean())(p)))
    dt = timeit(gstep, params, n1=2, n2=8)
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
    step = jax.jit(
        lambda z: model.apply({"params": params}, z, log_snr, cond))
    dt = timeit(step, x)
    print(f"unet denoise: {1 / dt:.1f} steps/s ({dt*1e3:.2f} ms/step, "
          f"batch 1, 32x32x4, bf16)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("matmul", "all"):
        bench_matmul()
    if which in ("grid", "all"):
        bench_grid_encode()
    if which in ("render", "all"):
        bench_render()
    if which in ("unet", "all"):
        bench_unet()
