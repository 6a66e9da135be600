"""Short full-scale distillation drive on hardware: times each phase.

Runs the real 256^2 pipeline (full-size EFT/VAE/UNet) on a synthetic
scene with the tpu preset: phase A EFT cache, N bootstrap iters, M
fusion iters, and the 256^2 eval — printing wall-clock per phase and
extrapolated minutes for a full 3000-iter scene (1000 bootstrap + 2000
fusion after warmup, the reference schedule).

Usage: python benchmarks/distill_drive.py [n_iters] [start_fusion] [samples]

``samples`` (optional) overrides the per-phase sample budget: the render
uses samples stratified + samples importance steps (preset: 32+32).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sparsefusion_tpu.utils.runtime import enable_persistent_compilation_cache


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    start_fusion = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else None
    enable_persistent_compilation_cache()

    import jax

    from sparsefusion_tpu.data.synthetic import make_synthetic_scene
    from sparsefusion_tpu.distill.loop import (
        distillation_loop,
        tpu_distill_config,
    )
    from sparsefusion_tpu.models import build_models

    t0 = time.time()
    models = build_models(jax.random.PRNGKey(0))
    print(f"[drive] models built {time.time() - t0:.0f}s", flush=True)

    scene = make_synthetic_scene(n_views=4, image_size=256, seed=0)
    print(f"[drive] scene ready {time.time() - t0:.0f}s", flush=True)

    over = {}
    if samples is not None:
        over = dict(num_steps=samples, upsample_steps=samples)
    cfg = tpu_distill_config(
        max_itr=n_iters, start_fusion_step=start_fusion,
        n_aug_cameras=4, eval_every=0, **over)

    t1 = time.time()
    out = distillation_loop(
        models, scene, [0, 1], cfg, jax.random.PRNGKey(1),
        save_dir="/tmp/distill_drive_out", use_diffusion=True,
        verbose=True)
    wall = time.time() - t1
    print(f"[drive] {n_iters} iters ({start_fusion} bootstrap) "
          f"+ eval in {wall:.1f}s total", flush=True)
    print(f"[drive] psnr {out['metrics']['psnr']:.2f}", flush=True)

    import numpy as np

    ts = np.asarray(out["iter_times"])
    dts = np.diff(ts)
    # skip the first iter of each phase (compile); steady-state medians
    boot = dts[1:start_fusion - 1]
    fuse = dts[start_fusion + 2:]
    boot_s = float(np.median(boot)) if len(boot) else float("nan")
    fuse_s = float(np.median(fuse)) if len(fuse) else float("nan")
    est_min = (1000 * boot_s + 2000 * fuse_s) / 60.0
    print(f"[drive] bootstrap iter {1e3 * boot_s:.0f} ms | fusion iter "
          f"{1e3 * fuse_s:.0f} ms | est 3000-iter scene "
          f"{est_min:.1f} min", flush=True)


if __name__ == "__main__":
    main()
