"""Decompose the fusion-iteration wall-clock on hardware.

Times each stage of the diffusion-fusion step separately (all with the
two-point chained method — ``block_until_ready`` is a no-op through the
relay): the full-image no-grad render, VAE encode/decode, one CFG UNet
eval (f32 and bf16), and the jitted PLMS step0 and masked-scan tail
(the subsampled grad steps are covered by ``bench.py``'s
``input_step_ms`` / ``full_grad_step_ms``).

``--march K`` decomposes the SHIPPED preset instead (single-pass
occupancy marching with K samples, ``occ_march_steps``); default is the
two-phase ``num_steps+upsample_steps`` sampler.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from sparsefusion_tpu.utils.runtime import enable_persistent_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--march", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="time the PLMS step0/tail with bf16 activations "
                         "AND pre-cast bf16 params (halved weight "
                         "traffic; models.unet_params_half)")
    ap.add_argument("--pallas-gather", action="store_true",
                    help="serve the NGP row gathers from VMEM "
                         "(kernels/grid_gather.py) in the render")
    args = ap.parse_args()

    enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp

    from benchmarks.timing import timeit
    from sparsefusion_tpu.core.cameras import get_camera_slice
    from sparsefusion_tpu.data.synthetic import make_synthetic_scene
    from sparsefusion_tpu.diffusion.plms import (
        _eval_eps_jit,
        _scan_tail_jit,
        _step0_jit,
    )
    from sparsefusion_tpu.distill.loop import _render_cam, tpu_distill_config
    from sparsefusion_tpu.models import build_models
    from sparsefusion_tpu.nn.ngp import NGPField
    from sparsefusion_tpu.render.occupancy import (
        OccupancyGrid,
        occupancy_near_far,
    )
    from sparsefusion_tpu.render.volume import VolumeRendererConfig

    t0 = time.time()
    models = build_models(jax.random.PRNGKey(0))
    print(f"[dec] models built {time.time() - t0:.0f}s", flush=True)

    cfg = tpu_distill_config()
    if args.pallas_gather:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, ngp=dataclasses.replace(cfg.ngp, pallas_gather=True))
        print("[dec] pallas VMEM gather ON", flush=True)
    vcfg = VolumeRendererConfig(
        num_steps=cfg.num_steps, upsample_steps=cfg.upsample_steps,
        bound=cfg.bound, min_near=cfg.min_near,
        max_ray_batch=cfg.max_ray_batch)
    if args.march:
        import dataclasses
        vcfg = dataclasses.replace(vcfg, march_steps=int(args.march))
        print(f"[dec] march mode, {args.march} samples", flush=True)
    ngp_model = NGPField(cfg.ngp)
    ngp_params = jax.jit(
        lambda k: ngp_model.init(k, jnp.zeros((8, 3)))["params"])(
            jax.random.PRNGKey(3))
    print(f"[dec] ngp init {time.time() - t0:.0f}s", flush=True)
    occ = OccupancyGrid(bound=cfg.bound, density_thresh=cfg.density_thresh)
    bitfield = occ.full_bitfield()
    print(f"[dec] occ ready {time.time() - t0:.0f}s", flush=True)
    nff = lambda o, d, n, f: occupancy_near_far(
        bitfield, o, d, n, f, cfg.bound, occ.grid_size, occ.cascade,
        cfg.occupancy_probe)[:2]

    scene = make_synthetic_scene(n_views=3, image_size=256, seed=0)
    cam = get_camera_slice(scene.cameras(), [0])
    print(f"[dec] scene ready {time.time() - t0:.0f}s", flush=True)

    # ---- full-image no-grad render @128 + bilinear up to 256 -------------
    from sparsefusion_tpu.ops.image import resize_bilinear

    @jax.jit
    def render_up(p, key):
        img, _ = _render_cam(ngp_model, p, cam, 128, vcfg, key,
                             perturb=True, near_far_fn=nff)
        return resize_bilinear(img[None], (256, 256))[0]

    dt = timeit(lambda c: c + jnp.mean(render_up(ngp_params,
                                                 jax.random.PRNGKey(0))),
                jnp.zeros(()), n1=4, n2=12)
    print(f"[dec] render_fwd_full {1e3 * dt:.0f} ms", flush=True)

    # ---- VAE encode / decode at 256^2 ------------------------------------
    vae_enc = jax.jit(lambda vv, img: models.vae_encode_p(vv, img[None]))
    vae_dec = jax.jit(lambda vv, z: models.vae_decode_p(vv, z)[0])
    img256 = jax.random.uniform(jax.random.PRNGKey(1), (256, 256, 3))
    z0 = vae_enc(models.vae_vars, img256)

    dt_ed = timeit(
        lambda img: vae_dec(models.vae_vars,
                            vae_enc(models.vae_vars, img)) * 0.5,
        img256, n1=4, n2=12)
    print(f"[dec] vae_enc+dec {1e3 * dt_ed:.0f} ms", flush=True)

    # ---- UNet CFG eval: f32 vs bf16 --------------------------------------
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 256))
    for tag, bf16, precast in (("f32", False, False),
                               ("bf16", True, False),
                               ("bf16_precast", True, True)):
        apply = models.unet_apply_fn(bf16=bf16)
        eps = _eval_eps_jit(models.ddpm, apply, cfg.cond_scale, 1,
                            with_params=True)
        up = models.unet_params_half() if precast else models.unet_params
        dt_e = timeit(
            lambda z: eps(up, z, 0.5, cond) * 0.99,
            z0, n1=4, n2=16)
        print(f"[dec] cfg_eval_{tag} {1e3 * dt_e:.1f} ms", flush=True)

    # ---- PLMS step0 + tail (25 masked steps) ------------------------------
    sampler_bf16 = bool(args.bf16) or cfg.sampler_bf16
    sampler_params = models.sampler_unet_params(sampler_bf16)
    apply = models.unet_apply_fn(bf16=sampler_bf16)
    step0 = _step0_jit(models.ddpm, apply, cfg.cond_scale, 1,
                       with_params=True)
    tail = _scan_tail_jit(models.ddpm, apply, cfg.cond_scale, 1,
                          cfg.plms_steps, with_params=True)
    times_all = [0.5 * max(25.0 - i, 0.0) / 25.0 for i in range(51)]
    t_pairs = jnp.asarray([[times_all[i], times_all[i + 1]]
                           for i in range(50)], jnp.float32)

    def chain_step0(z):
        img, hist, key = step0(sampler_params, jax.random.PRNGKey(3),
                               z, 0.5, 0.48, cond)
        return img

    dt_s0 = timeit(chain_step0, z0, n1=3, n2=9)
    print(f"[dec] plms_step0 {1e3 * dt_s0:.0f} ms", flush=True)

    img1, hist, key = step0(sampler_params, jax.random.PRNGKey(3),
                            z0, 0.5, 0.48, cond)

    def chain_tail(z):
        return tail(sampler_params, key, z, hist, jnp.int32(1),
                    jnp.int32(25), t_pairs, cond)

    dt_tl = timeit(chain_tail, img1, n1=2, n2=6)
    print(f"[dec] plms_tail(25 steps) {1e3 * dt_tl:.0f} ms", flush=True)

    print(f"[dec] total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
