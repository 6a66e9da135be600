"""Short full-scale distillation drive on hardware: times each phase.

Runs the real 256^2 pipeline (full-size EFT/VAE/UNet) on a synthetic
scene with the tpu preset: phase A EFT cache, bootstrap iters, fusion
iters, and the 256^2 eval — printing wall-clock per phase and an
extrapolated minutes number for a full 3000-iter scene (1000 bootstrap
+ 2000 fusion, the reference schedule, ``demo.py:101``).

Timing uses the loop's ``sync_times`` (host<->device sync boundaries,
every loss_fetch_every iters) — per-iter host timestamps are dispatch
times only now that loss fetches are batched.

Usage:
  python benchmarks/distill_drive.py [--iters N] [--start-fusion N]
      [--samples S] [--march K] [--occ-start N] [--fetch-every N]

--samples S   : two-phase budget S stratified + S importance (preset 32)
--march K     : single-pass occupancy marching with K samples once the
                occupancy grid is live (occ_march_steps=K)
--occ-start N : occupancy_start override (preset 500) — lower it so
                short drives exercise the march path
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sparsefusion_tpu.utils.runtime import enable_persistent_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--start-fusion", type=int, default=8)
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--march", type=int, default=None)
    ap.add_argument("--occ-start", type=int, default=None)
    ap.add_argument("--polish-start", type=int, default=None,
                    help="switch back to two-phase sampling from this "
                         "iteration on (quality polish tail)")
    ap.add_argument("--fetch-every", type=int, default=20)
    ap.add_argument("--levels", type=int, default=None,
                    help="NGP table levels (preset: 8)")
    ap.add_argument("--level-dim", type=int, default=None,
                    help="NGP features per level (preset: 4); gather "
                         "rows scale with levels, row width with dim")
    ap.add_argument("--reference-preset", action="store_true",
                    help="EXACT DistillConfig() defaults — 64+64 "
                         "two-phase sampling, full-grid input+fusion "
                         "steps, fp32 16-level tables, no occupancy "
                         "(get_default_torch_ngp_opt semantics, "
                         "distillation.py:500-526) — the quality anchor "
                         "for the shipped tpu preset")
    ap.add_argument("--ref-objective", action="store_true",
                    help="disable the preset's 4096-ray subsampling: "
                         "full-image input/bootstrap/fusion steps with "
                         "the bilinear-upsampled image-size comparison "
                         "(the reference objective, distillation.py:"
                         "294-329) — the quality anchor for the preset "
                         "A/B")
    ap.add_argument("--sampler-bf16", action="store_true",
                    help="run the PLMS sampler in bf16 with pre-cast "
                         "bf16 UNet params (halved weight traffic)")
    ap.add_argument("--mm-scatter", type=int, default=0,
                    help="levels with <= this many blocked rows use the "
                         "one-hot-matmul segment reduction for their "
                         "backward table grad (0 = XLA scatter)")
    ap.add_argument("--pallas-gather", action="store_true",
                    help="serve the NGP row gathers from VMEM "
                         "(kernels/grid_gather.py)")
    ap.add_argument("--scenes", type=int, default=1,
                    help="S>1 drives the scene-BATCHED loop "
                         "(distill/batched.py): S fixtures in lockstep; "
                         "the printed per-scene estimate divides by S")
    ap.add_argument("--remat", action="store_true",
                    help="re-render chunks in backward instead of "
                         "storing residuals (the preset stores; S>=4 "
                         "batched needs remat to fit v5e HBM)")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable fused per-iteration programs "
                         "(cfg.fused_steps=False) — the pre-round-4 "
                         "dispatch structure, for the A/B")
    ap.add_argument("--save-dir", default="/tmp/distill_drive_out")
    # backwards-compatible positional form: iters start_fusion [samples]
    ap.add_argument("pos", nargs="*", type=int)
    args = ap.parse_args()
    if args.pos:
        args.iters = args.pos[0]
        if len(args.pos) > 1:
            args.start_fusion = args.pos[1]
        if len(args.pos) > 2:
            args.samples = args.pos[2]

    enable_persistent_compilation_cache()

    import jax
    import numpy as np

    from sparsefusion_tpu.data.synthetic import make_synthetic_scene
    from sparsefusion_tpu.distill.loop import (
        distillation_loop,
        tpu_distill_config,
    )
    from sparsefusion_tpu.models import build_models

    t0 = time.time()
    models = build_models(jax.random.PRNGKey(0))
    print(f"[drive] models built {time.time() - t0:.0f}s", flush=True)

    # cache the fixtures on disk: regenerating one costs minutes of
    # CPU-backend renders per drive on the 1-core host
    from sparsefusion_tpu.data.contract import SceneData

    def load_scene(seed):
        cache = f"/tmp/sf_drive_scene_4_256_{seed}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            return SceneData(
                images=z["images"], R=z["R"], T=z["T"], f=z["f"],
                c=z["c"], valid_region=z["valid_region"],
                image_size=z["image_size"], masks=z["masks"],
                sequence_name=str(z["seq"]))
        s = make_synthetic_scene(n_views=4, image_size=256, seed=seed)
        np.savez(cache, images=s.images, R=s.R, T=s.T, f=s.f, c=s.c,
                 valid_region=s.valid_region, image_size=s.image_size,
                 masks=s.masks, seq=s.sequence_name)
        return s

    scenes = [load_scene(seed) for seed in range(args.scenes)]
    scene = scenes[0]
    print(f"[drive] {len(scenes)} scene(s) ready {time.time() - t0:.0f}s",
          flush=True)

    over = {}
    if args.samples is not None:
        over = dict(num_steps=args.samples, upsample_steps=args.samples)
    if args.march is not None:
        over["occ_march_steps"] = args.march
    occ_start = args.occ_start
    if occ_start is not None:
        over["occupancy_start"] = occ_start
    if args.polish_start is not None:
        over["polish_start"] = args.polish_start
    if args.remat:
        over["remat"] = True
    if args.sampler_bf16:
        over["sampler_bf16"] = True
    if args.ref_objective:
        over["input_rays"] = None
        over["fusion_rays"] = None
    if args.no_fused:
        over["fused_steps"] = False
    if args.levels is not None or args.level_dim is not None \
            or args.pallas_gather or args.mm_scatter:
        from sparsefusion_tpu.nn.ngp import NGPConfig
        over["ngp"] = NGPConfig(
            num_levels=args.levels or 8, level_dim=args.level_dim or 4,
            table_dtype="bfloat16", pallas_gather=args.pallas_gather,
            mm_scatter_rows=args.mm_scatter)
    if args.reference_preset:
        from sparsefusion_tpu.distill.loop import DistillConfig

        cfg = DistillConfig(
            max_itr=args.iters, start_fusion_step=args.start_fusion,
            n_aug_cameras=4, eval_every=0,
            loss_fetch_every=args.fetch_every, **over)
    else:
        cfg = tpu_distill_config(
            max_itr=args.iters, start_fusion_step=args.start_fusion,
            n_aug_cameras=4, eval_every=0,
            loss_fetch_every=args.fetch_every, **over)

    t1 = time.time()
    if args.scenes > 1:
        from sparsefusion_tpu.distill.batched import (
            batched_distillation_loop,
        )

        outs = batched_distillation_loop(
            models, scenes, [[0, 1]] * len(scenes), cfg,
            jax.random.PRNGKey(1), save_dir=args.save_dir,
            use_diffusion=True, verbose=True)
        out = outs[0]
    else:
        out = distillation_loop(
            models, scene, [0, 1], cfg, jax.random.PRNGKey(1),
            save_dir=args.save_dir, use_diffusion=True, verbose=True)
    wall = time.time() - t1
    print(f"[drive] {args.iters} iters ({args.start_fusion} bootstrap) "
          f"+ eval in {wall:.1f}s total", flush=True)
    print(f"[drive] psnr {out['metrics']['psnr']:.2f}", flush=True)

    # ---- per-phase rates from sync boundaries ---------------------------
    # classify each sync interval by (bootstrap|fusion) x (pre|post occ)
    occ0 = cfg.occupancy_start if cfg.use_occupancy else 10 ** 9
    marching = bool(cfg.use_occupancy and cfg.occ_march_steps)

    def phase_of(itr):
        f = "fus" if itr > cfg.start_fusion_step else "boot"
        o = "march" if (marching and itr >= occ0) else "two"
        if marching and cfg.polish_start is not None \
                and itr >= cfg.polish_start:
            o = "pol"
        return f"{f}_{o}"

    sync = [(-1, t1)] + list(out["sync_times"])
    rates = {}
    for (i0, w0), (i1, w1) in zip(sync[:-1], sync[1:]):
        if i1 <= i0:
            continue
        p0, p1 = phase_of(i0 + 1), phase_of(i1)
        if p0 != p1:
            continue  # mixed interval
        rates.setdefault(p1, []).append((w1 - w0) / (i1 - i0))

    med = {}
    for k, v in rates.items():
        v = v[1:] if len(v) > 2 else v  # drop the compile interval
        med[k] = float(np.median(v))
        print(f"[drive] {k}: {1e3 * med[k]:.0f} ms/iter "
              f"({len(v)} intervals)", flush=True)

    # full-scene estimate under the reference schedule: 1000 bootstrap
    # (500 pre-occ + 500 post-occ) + 2000 fusion (post-occ)
    bt = med.get("boot_two")
    bm = med.get("boot_march", bt)
    fm = med.get("fus_march", med.get("fus_two"))
    fp = med.get("fus_pol")
    if bt is not None and fm is not None:
        # scale the drive's polish share of fusion iters onto the
        # reference 2000-fusion-iter schedule (a short drive's
        # polish_start is drive-relative, not on the 3000-iter scale)
        n_pol = 0
        if fp is not None and cfg.polish_start is not None:
            frac = (cfg.max_itr - cfg.polish_start) \
                / max(1, cfg.max_itr - cfg.start_fusion_step)
            n_pol = int(round(2000 * min(max(frac, 0.0), 1.0)))
        est = (500 * bt + 500 * (bm if bm is not None else bt)
               + (2000 - n_pol) * fm + n_pol * (fp or 0.0)) / 60.0
        pol_txt = f" | polish {1e3 * fp:.0f}" if fp is not None else ""
        per_scene = est / max(1, args.scenes)
        batch_txt = (f" = {per_scene:.1f} min/scene at S={args.scenes}"
                     if args.scenes > 1 else "")
        print(f"[drive] est 3000-iter scene {est:.1f} min{batch_txt} "
              f"(boot_two {1e3 * bt:.0f} | boot_march "
              f"{1e3 * (bm or bt):.0f} | fusion {1e3 * fm:.0f}"
              f"{pol_txt} ms)", flush=True)


if __name__ == "__main__":
    main()
