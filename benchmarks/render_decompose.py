"""Decompose the distillation input-step time (v5e, tpu preset shapes).

Times each stage of the NGP render pipeline independently so the
optimization target is measured, not guessed:

  1. blocked-table expand              (rolls + transpose)
  2. encode fwd                        (1 gather row / point / level)
  3. encode fwd+bwd wrt master         (the round-1 bottleneck: scatter)
  4. field fwd (encode + MLP + act)
  5. field fwd+bwd
  6. full render fwd  (64 samples, chunked, occupancy off)
  7. full render fwd+bwd + adam        (= the distill input step)

Run on the real chip:  python benchmarks/render_decompose.py [n_rays]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timeit
from sparsefusion_tpu.nn.ngp import NGPConfig, NGPField
from sparsefusion_tpu.render.volume import (
    VolumeRendererConfig,
    render_rays_chunked,
)


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cfg = NGPConfig(num_levels=8, level_dim=4, table_dtype="bfloat16")
    model = NGPField(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)))["params"]
    n_pts = n_rays * samples
    print(f"rays={n_rays} samples={samples} pts={n_pts} "
          f"levels={cfg.num_levels} C={cfg.level_dim}")

    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (n_pts, 3), minval=-1.0, maxval=1.0)

    def report(name, fn, carry):
        dt = timeit(fn, carry, n1=2, n2=8)
        print(f"{name:34s} {1e3 * dt:9.2f} ms", flush=True)
        return dt

    # 1. expand
    @jax.jit
    def expand(c):
        t = model.apply({"params": jax.tree_util.tree_map(
            lambda p: p + c * 0, params)}, method=NGPField.expand_tables)
        return t

    report("1. table expand", lambda c: jnp.sum(
        expand(c)[0, :1].astype(jnp.float32)) * 0 + c + 1, jnp.zeros(()))

    from sparsefusion_tpu.ops.grid_encode_blocked import (
        blocked_grid_encode_bound,
        expand_blocked_tables,
        make_blocked_encoding,
    )

    enc = cfg.encoding()
    blk = make_blocked_encoding(enc)
    master = params["grid"]

    @jax.jit
    def enc_fwd(c):
        t = expand_blocked_tables(master + c * 0, blk)
        if cfg.table_dtype:
            t = t.astype(cfg.table_dtype)
        out = blocked_grid_encode_bound(pts, master, blk, bound=cfg.bound,
                                        tables=t)
        return jnp.sum(out[:, 0]) * 0 + c + 1

    report("2. encode fwd", enc_fwd, jnp.zeros(()))

    @jax.jit
    def enc_bwd(c):
        def loss(m):
            t = expand_blocked_tables(m, blk)
            if cfg.table_dtype:
                t = t.astype(cfg.table_dtype)
            out = blocked_grid_encode_bound(pts, m, blk, bound=cfg.bound,
                                            tables=t)
            return jnp.sum(out * out)

        g = jax.grad(loss)(master + c * 0)
        return jnp.sum(g[0]) * 0 + c + 1

    report("3. encode fwd+bwd", enc_bwd, jnp.zeros(()))

    @jax.jit
    def field_fwd(c):
        tables = model.apply({"params": params}, method=NGPField.expand_tables)
        sig, alb = model.apply({"params": params}, pts + c * 0, tables)
        return jnp.sum(sig) * 0 + c + 1

    report("4. field fwd", field_fwd, jnp.zeros(()))

    @jax.jit
    def field_bwd(c):
        def loss(p):
            tables = model.apply({"params": p}, method=NGPField.expand_tables)
            sig, alb = model.apply({"params": p}, pts + c * 0, tables)
            return jnp.sum(sig * sig) + jnp.sum(alb * alb)

        g = jax.grad(loss)(params)
        return jnp.sum(g["grid"][0]) * 0 + c + 1

    report("5. field fwd+bwd", field_bwd, jnp.zeros(()))

    vcfg = VolumeRendererConfig(num_steps=samples // 2,
                                upsample_steps=samples // 2,
                                max_ray_batch=min(16384, n_rays))
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 2] = -3.0
    d = np.random.RandomState(0).normal(size=(n_rays, 3))
    d[:, 2] = np.abs(d[:, 2]) + 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)

    @jax.jit
    def render_fwd(c):
        tables = model.apply({"params": params}, method=NGPField.expand_tables)
        field = lambda x: model.apply({"params": params}, x, tables)
        out = render_rays_chunked(field, o + c * 0, d, vcfg,
                                  rng=jax.random.PRNGKey(2), perturb=True,
                                  det_importance=False, remat=True)
        return jnp.sum(out["image"][:, 0]) * 0 + c + 1

    report("6. render fwd (32+32)", render_fwd, jnp.zeros(()))

    import optax

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, c):
        tables = model.apply({"params": p}, method=NGPField.expand_tables)
        field = lambda x: model.apply({"params": p}, x, tables)
        out = render_rays_chunked(field, o + c * 0, d, vcfg,
                                  rng=jax.random.PRNGKey(2), perturb=True,
                                  det_importance=False, remat=True)
        return jnp.mean(out["image"] ** 2) + jnp.mean(out["weights_sum"])

    @jax.jit
    def step(carry):
        p, s, c = carry
        loss, g = jax.value_and_grad(loss_fn)(p, c)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, c + loss * 0

    report("7. input step (fwd+bwd+adam)",
           lambda carry: step(carry), (params, opt_state, jnp.zeros(())))

    def loss_fn_noremat(p, c):
        tables = model.apply({"params": p}, method=NGPField.expand_tables)
        field = lambda x: model.apply({"params": p}, x, tables)
        out = render_rays_chunked(field, o + c * 0, d, vcfg,
                                  rng=jax.random.PRNGKey(2), perturb=True,
                                  det_importance=False, remat=False)
        return jnp.mean(out["image"] ** 2) + jnp.mean(out["weights_sum"])

    @jax.jit
    def step_noremat(carry):
        p, s, c = carry
        loss, g = jax.value_and_grad(loss_fn_noremat)(p, c)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, c + loss * 0

    report("8. input step (no remat)",
           lambda carry: step_noremat(carry),
           (params, opt_state, jnp.zeros(())))

    for sub in (8192, 4096):
        vcfg_s = VolumeRendererConfig(num_steps=samples // 2,
                                      upsample_steps=samples // 2,
                                      max_ray_batch=sub)

        def loss_sub(p, c, sub=sub, vcfg_s=vcfg_s):
            k_sel, k_r = jax.random.split(jax.random.PRNGKey(3))
            ridx = jax.random.randint(k_sel, (sub,), 0, n_rays)
            oo = jnp.take(o, ridx, axis=0) + c * 0
            dd = jnp.take(d, ridx, axis=0)
            tables = model.apply({"params": p},
                                 method=NGPField.expand_tables)
            field = lambda x: model.apply({"params": p}, x, tables)
            out = render_rays_chunked(field, oo, dd, vcfg_s, rng=k_r,
                                      perturb=True, det_importance=False,
                                      remat=False)
            return jnp.mean(out["image"] ** 2) + jnp.mean(
                out["weights_sum"])

        @jax.jit
        def step_sub(carry, loss_sub=loss_sub):
            p, s, c = carry
            loss, g = jax.value_and_grad(loss_sub)(p, c)
            up, s = tx.update(g, s, p)
            return optax.apply_updates(p, up), s, c + loss * 0

        report(f"9. input step ({sub} rays, no remat)",
               lambda carry, f=step_sub: f(carry),
               (params, opt_state, jnp.zeros(())))


if __name__ == "__main__":
    main()
