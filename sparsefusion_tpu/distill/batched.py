"""Scene-BATCHED diffusion distillation: S scenes per chip, in lockstep.

The reference distills one scene per GPU process (``demo.py:59-88``
shards the scene list; ``distillation.py:26`` runs one NGP at a time).
On TPU the per-scene programs are small — a 4096-ray grad step keeps the
chip busy for ~130 ms but leaves the MXU/VPU far from saturated and pays
fixed per-dispatch cost through the runtime — so the TPU-native scaling
move is to vmap the per-scene step functions over a leading scene axis
and optimize S independent NGPs in ONE program per iteration
(BASELINE.md's "batch multiple scenes per chip" stretch config).

Everything per-scene (NGP params, optimizer state, occupancy grid +
bitfield, feature cache, camera choice) carries a leading S axis; the
step bodies themselves are the SAME pure functions the sequential loop
jits (``loop.make_scene_step_fns``), so the two paths cannot drift.

Schedule semantics match the sequential loop exactly (same iteration
count, fusion/bootstrap switch, occupancy cadence); randomness differs
only in bookkeeping: each scene draws its camera indices from its own
host RandomState, and the fusion ``max_thres`` is drawn ONCE per
iteration and shared by all scenes in the batch (each scene's marginal
stays Uniform[0, 1) — only the cross-scene correlation changes, and
scenes are independent optimizations, ``distillation.py:303``).

Constraints: all scenes must share the image size and frame count
(stackable caches); callers with ragged scene lists should bucket by
``(image_size, n_frames)`` and fall back to :func:`distillation_loop`
for singletons.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sparsefusion_tpu.core.cameras import (
    Cameras,
    concat_cameras,
    get_camera_slice,
    get_relative_cameras,
)
from sparsefusion_tpu.core.paths import get_interpolated_path
from sparsefusion_tpu.data.contract import SceneData
from sparsefusion_tpu.distill.loop import (
    DistillConfig,
    _render_cam,
    _save_outputs,
    _scene_depth_range,
    make_ngp_optimizer,
    make_scene_step_fns,
)
from sparsefusion_tpu.models import SparseFusionModels
from sparsefusion_tpu.nn.ngp import NGPField
from sparsefusion_tpu.ops.image import resize_bilinear
from sparsefusion_tpu.render.lightfield import render_light_field
from sparsefusion_tpu.render.volume import VolumeRendererConfig
from sparsefusion_tpu.utils.metrics import psnr, ssim


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _tree_at(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def batched_distillation_loop(
    models: SparseFusionModels,
    scenes: Sequence[SceneData],
    input_idx_list: Sequence[Sequence[int]],
    cfg: DistillConfig,
    rng: jax.Array,
    save_dir: Optional[str] = None,
    use_diffusion: bool = True,
    verbose: bool = True,
    lpips_fn=None,
    mesh=None,
) -> List[Dict[str, Any]]:
    """Optimize S NGPs (one per scene) in lockstep; returns per-scene
    result dicts with the same keys as :func:`distillation_loop`.

    ``mesh``: an optional 1-D ``jax.sharding.Mesh`` over the LOCAL
    devices.  Every per-scene array (NGP params, optimizer state,
    occupancy grids, caches, targets) is placed with its leading scene
    axis sharded over the mesh, so the vmapped per-scene programs
    partition one-scene-per-chip with ZERO cross-device communication —
    the TPU-native realization of the reference's one-scene-per-GPU
    ``mp.spawn`` (``demo.py:18-60``).  The scene list is padded (by
    cycling) to a multiple of the mesh size; padded slots are optimized
    but never evaluated or saved.
    """
    S_real = len(scenes)
    if S_real == 0:
        return []
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = int(np.prod(mesh.devices.shape))
        pad = (-S_real) % n_dev
        if pad:
            scenes = list(scenes) + [scenes[i % S_real]
                                     for i in range(pad)]
            input_idx_list = (list(input_idx_list)
                              + [input_idx_list[i % S_real]
                                 for i in range(pad)])
        shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    S = len(scenes)

    def _place(tree):
        """Commit a leading-S pytree to the scene-sharded layout."""
        if shard is None or tree is None:
            return tree
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, shard), tree)
    image_size = scenes[0].images.shape[1]
    n_frames = len(scenes[0])
    for s in scenes:
        if s.images.shape[1] != image_size or len(s) != n_frames:
            raise ValueError(
                "batched distillation needs equal image sizes and frame "
                f"counts; got {[(len(x), x.images.shape[1]) for x in scenes]}"
                " — bucket scenes by (n_frames, image_size) first")
    render_hw = image_size // cfg.hw_scale
    eft_hw = image_size // cfg.eft_scale
    input_idx_list = [list(int(i) for i in idx) for idx in input_idx_list]
    n_ctx = len(input_idx_list[0])
    if any(len(idx) != n_ctx for idx in input_idx_list):
        raise ValueError("batched distillation needs equal context sizes")

    on_cpu = jax.default_backend() == "cpu"
    _donate = () if on_cpu else (0, 1)

    # ---- per-scene camera frames (host-side, same as the sequential loop)
    scene_vox_list, aug_rel_list, aug_vox_list, depth_ranges = [], [], [], []
    for s in scenes:
        cams = s.cameras()
        scene_vox_list.append(
            get_relative_cameras(cams, [0], center_at_origin=False))
        aug = get_interpolated_path(cams, n=cfg.n_aug_cameras,
                                    theta_offset_max=cfg.theta_offset_max,
                                    rng=np.random.RandomState(0))
        aug_all = concat_cameras([cams, aug])
        aug_rel_list.append(
            get_relative_cameras(aug_all, [0], center_at_origin=True))
        aug_vox_list.append(
            get_relative_cameras(aug_all, [0], center_at_origin=False))
        depth_ranges.append(_scene_depth_range(cams))
    n_cache = n_frames + cfg.n_aug_cameras

    rgb_all = _place(jnp.stack([jnp.asarray(s.images) for s in scenes]))
    has_mask = all(s.masks is not None for s in scenes)
    mask_all = _place(jnp.stack([jnp.asarray(s.masks) for s in scenes])
                      if has_mask else None)
    scene_vox_all = _place(_stack_trees(scene_vox_list))  # (S, N, ...)
    aug_vox_all = _place(_stack_trees(aug_vox_list))      # (S, M, ...)

    vcfg = VolumeRendererConfig(
        num_steps=cfg.num_steps, upsample_steps=cfg.upsample_steps,
        bound=cfg.bound, min_near=cfg.min_near,
        max_ray_batch=cfg.max_ray_batch)
    march_on = bool(cfg.use_occupancy and cfg.occ_march_steps)
    vcfg_march = dataclasses.replace(
        vcfg, march_steps=int(cfg.occ_march_steps)) if march_on else vcfg

    def active_vcfg(itr: int) -> VolumeRendererConfig:
        if march_on and cfg.polish_start is not None \
                and itr >= cfg.polish_start:
            return vcfg
        return vcfg_march if (march_on and itr >= cfg.occupancy_start) \
            else vcfg

    # ---- Phase A: per-scene EFT feature caches ---------------------------
    # one jitted program defined once, re-USED for every scene in the
    # batch (identical shapes -> one trace + one compile); depth range
    # and context indices enter as arguments so per-scene values don't
    # split the program cache
    feats_all = eft_imgs_all = None
    if use_diffusion:
        t0 = time.time()
        eft_model = models.eft_model

        @jax.jit
        def encode_ctx(eft_vars, imgs):
            return eft_model.apply(eft_vars, imgs,
                                   method=type(eft_model).encode)

        def cache_fn(eft_vars, cams_all: Cameras, ctx_idx, ctx_rgb,
                     latent, depth_lo, depth_hi):
            def one(ci):
                rel_ci = get_relative_cameras(cams_all, ci[None],
                                              center_at_origin=True)
                q_cam = get_camera_slice(rel_ci, ci[None])
                c_cams = get_camera_slice(rel_ci, ctx_idx)

                def ray_fn(o, d, lengths):
                    return eft_model.apply(eft_vars, o, d, lengths,
                                           c_cams, ctx_rgb, latent)

                rgb, feat = render_light_field(
                    ray_fn, q_cam, eft_hw, eft_hw, depth_lo, depth_hi,
                    n_pts_per_ray=cfg.eft_n_pts, n_batches=16)
                eft_img = resize_bilinear(rgb, (image_size, image_size),
                                          align_corners=False)
                return feat[0], eft_img[0]

            return jax.lax.map(one, jnp.arange(n_cache))

        if shard is not None:
            # mesh mode: ONE program caches all S scenes — vmapped over
            # the sharded scene axis, each chip caches its own scene(s)
            aug_rel_all = _place(_stack_trees(aug_rel_list))
            ctx_idx_all = _place(jnp.asarray(input_idx_list))
            ctx_rgb_all = _place(jnp.stack([
                jnp.asarray(np.asarray(scenes[si].images)[
                    np.asarray(input_idx_list[si])]) for si in range(S)]))
            lo_vec = _place(jnp.asarray([d[0] for d in depth_ranges],
                                        jnp.float32))
            hi_vec = _place(jnp.asarray([d[1] for d in depth_ranges],
                                        jnp.float32))
            encode_b = jax.jit(jax.vmap(
                lambda v, imgs: eft_model.apply(
                    v, imgs, method=type(eft_model).encode),
                in_axes=(None, 0)))
            latent_all = encode_b(models.eft_vars, ctx_rgb_all)
            cache_b = jax.jit(jax.vmap(
                cache_fn, in_axes=(None, 0, 0, 0, 0, 0, 0)))
            feats_all, eft_imgs_all = cache_b(
                models.eft_vars, aug_rel_all, ctx_idx_all, ctx_rgb_all,
                latent_all, lo_vec, hi_vec)
        else:
            cache_all = jax.jit(cache_fn)
            feats_l, imgs_l = [], []
            for si in range(S):
                ctx_idx = jnp.asarray(input_idx_list[si])
                ctx_rgb = rgb_all[si][ctx_idx]
                latent = encode_ctx(models.eft_vars, ctx_rgb)
                lo, hi = depth_ranges[si]
                f, im = cache_all(models.eft_vars, aug_rel_list[si],
                                  ctx_idx, ctx_rgb, latent, float(lo),
                                  float(hi))
                feats_l.append(f)
                imgs_l.append(im)
            feats_all = jnp.stack(feats_l)    # (S, M, eft, eft, C)
            eft_imgs_all = jnp.stack(imgs_l)  # (S, M, H, W, 3)
        if verbose:
            print(f"cached {S}x{n_cache} features in "
                  f"{time.time() - t0:.1f}s")

    # ---- Phase B: S NGPs in lockstep -------------------------------------
    ngp_model = NGPField(cfg.ngp)
    rng, k_init = jax.random.split(rng)
    init_method = (NGPField.init_all if cfg.ngp.bg_radius > 0
                   else NGPField.__call__)

    @jax.jit
    def init_params_b(keys):
        def one(k):
            return ngp_model.init(k, jnp.zeros((8, 3)),
                                  method=init_method)["params"]

        return jax.vmap(one)(keys)

    params_b = _place(init_params_b(jax.random.split(k_init, S)))
    tx = make_ngp_optimizer(cfg)
    opt_b = _place(jax.jit(jax.vmap(tx.init))(params_b))

    occ_cascade = 1 + int(np.ceil(np.log2(max(cfg.bound, 1.0))))
    occ_n = 128 ** 3
    if cfg.use_occupancy:
        grids_b = _place(jnp.zeros((S, occ_cascade, occ_n), jnp.float32))
        bf_b = _place(jnp.full((S, occ_cascade * occ_n // 8), 255,
                               jnp.uint8))
    else:
        grids_b = None
        bf_b = _place(jnp.zeros((S, 8), jnp.uint8))

    steps = make_scene_step_fns(ngp_model, cfg, tx, render_hw,
                                image_size, lpips_fn=lpips_fn)

    def _pick_cam(cams_all, idx_vec):
        """(S, M, ...) cameras + (S,) indices -> (S, 1, ...) cameras."""
        s_idx = jnp.arange(idx_vec.shape[0])
        return jax.tree_util.tree_map(
            lambda a: a[s_idx, idx_vec][:, None], cams_all)

    # one jitted program per (vc, mode): gather this iteration's
    # per-scene camera/target on-device, then vmap the per-scene step
    _prog_cache: Dict[Any, Any] = {}

    def _program(name, vc, builder):
        key = (name, vc)
        if key not in _prog_cache:
            _prog_cache[key] = builder(vc)
        return _prog_cache[key]

    def _build_input(vc):
        step_v = jax.vmap(partial(steps.input_step, vc))

        def run(params, opt, cams_all, rgb, mask, bi_vec, keys, bf):
            s_idx = jnp.arange(bi_vec.shape[0])
            cam_b = _pick_cam(cams_all, bi_vec)
            gt = rgb[s_idx, bi_vec]
            m = mask[s_idx, bi_vec] if mask is not None else None
            return step_v(params, opt, cam_b, gt, m, keys, bf)

        return jax.jit(run, donate_argnums=_donate)

    def _build_bootstrap(vc):
        step_v = jax.vmap(partial(steps.bootstrap_step, vc))

        def run(params, opt, cams_all, eft_imgs, ci_vec, keys, bf):
            s_idx = jnp.arange(ci_vec.shape[0])
            cam_b = _pick_cam(cams_all, ci_vec)
            tgt = eft_imgs[s_idx, ci_vec]
            return step_v(params, opt, cam_b, tgt, keys, bf)

        return jax.jit(run, donate_argnums=_donate)

    def _build_render(vc):
        rend_v = jax.vmap(partial(steps.render_up_img, vc))

        def run(params, cams_all, feats, ci_vec, keys, bf):
            s_idx = jnp.arange(ci_vec.shape[0])
            cam_b = _pick_cam(cams_all, ci_vec)
            return rend_v(params, cam_b, keys, bf), feats[s_idx, ci_vec]

        return jax.jit(run)

    def _build_fusion_grad(vc):
        step_v = jax.vmap(partial(steps.fusion_grad_step, vc))

        def run(params, opt, cams_all, pred, w_vec, ci_vec, keys, bf):
            cam_b = _pick_cam(cams_all, ci_vec)
            return step_v(params, opt, cam_b, pred, w_vec, keys, bf)

        return jax.jit(run, donate_argnums=_donate)

    # occupancy maintenance for all S grids in one program
    from sparsefusion_tpu.render.occupancy import density_grid_update

    @jax.jit
    def occ_update_b(grids, params, keys):
        def one(grid, p, k):
            return density_grid_update(
                grid, lambda pts: ngp_model.apply({"params": p}, pts)[0],
                k, cfg.bound, 128, occ_cascade, cfg.density_thresh)

        return jax.vmap(one)(grids, params, keys)

    # batched diffusion target: S renders -> VAE encode -> ONE batched
    # PLMS chain (shared max_thres => shared step count) -> VAE decode
    if use_diffusion:
        unet_apply = models.unet_apply_fn(bf16=cfg.sampler_bf16)
        use_host_plms = cfg.plms_host_loop
        if use_host_plms is None:
            use_host_plms = not on_cpu
        vae_enc = jax.jit(models.vae_encode_p)
        vae_dec = jax.jit(models.vae_decode_p)

        from sparsefusion_tpu.diffusion.plms import (
            plms_sample,
            plms_sample_host,
        )

        def fusion_sample_b(imgs, feats_b, k_s, max_thres):
            latents = vae_enc(models.vae_vars, imgs)
            sampler = plms_sample_host if use_host_plms else (
                lambda ddpm, dfn, k, lat, mt, **kw: plms_sample(
                    ddpm, models.denoise_fn(), k, lat, mt,
                    **{k2: v for k2, v in kw.items()
                       if k2 not in ("scan_tail", "unet_params")}))
            pred_x0, _, _, alpha_cumprod = sampler(
                models.ddpm, unet_apply, k_s, latents, max_thres,
                cond_images=feats_b, cond_scale=cfg.cond_scale,
                plms_steps=cfg.plms_steps, scan_tail=cfg.plms_scan_tail,
                unet_params=models.sampler_unet_params(cfg.sampler_bf16))
            return vae_dec(models.vae_vars, pred_x0), 1.0 - alpha_cumprod

    # per-scene host RNGs (camera choice), mirroring the sequential
    # loop's RandomState(17) per scene
    host_rngs = [np.random.RandomState(17 + 1013 * s) for s in range(S)]
    mt_rng = np.random.RandomState(29)
    losses: List[List[float]] = [[] for _ in range(S)]
    fusion_losses_log: List[List[float]] = [[] for _ in range(S)]
    pending, pending_f = [], []
    iter_times = []
    sync_times = []
    fetch_every = max(1, int(cfg.loss_fetch_every))

    def _drain(itr):
        if pending:
            for v in jax.device_get(pending):
                for s in range(S):
                    losses[s].append(float(v[s]))
            pending.clear()
        if pending_f:
            for v in jax.device_get(pending_f):
                for s in range(S):
                    fusion_losses_log[s].append(float(v[s]))
            pending_f.clear()
        sync_times.append((itr, time.time()))

    t0 = time.time()
    for itr in range(cfg.max_itr):
        rng, k1, k2 = jax.random.split(rng, 3)
        vc = active_vcfg(itr)

        if (cfg.use_occupancy and itr >= cfg.occupancy_start
                and (itr - cfg.occupancy_start)
                % cfg.occupancy_update_every == 0):
            rng, k_occ = jax.random.split(rng)
            grids_b, bf_b, _ = occ_update_b(
                grids_b, params_b, jax.random.split(k_occ, S))

        bi_vec = jnp.asarray([idx[r.randint(len(idx))]
                              for idx, r in zip(input_idx_list, host_rngs)])
        input_prog = _program("input", vc, _build_input)
        params_b, opt_b, loss = input_prog(
            params_b, opt_b, scene_vox_all, rgb_all, mask_all, bi_vec,
            jax.random.split(k1, S), bf_b)

        floss = None
        if use_diffusion:
            ci_vec = jnp.asarray([r.randint(n_cache) for r in host_rngs])
            keys2 = jax.random.split(k2, S)
            if itr > cfg.start_fusion_step:
                mt = min(float(mt_rng.uniform()), 0.99)
                k_s = jax.random.fold_in(k2, itr)
                render_prog = _program("render", vc, _build_render)
                imgs, feats_b = render_prog(params_b, aug_vox_all,
                                            feats_all, ci_vec, keys2, bf_b)
                pred, w_vec = fusion_sample_b(imgs, feats_b, k_s, mt)
                pred = jax.lax.stop_gradient(pred)
                fusion_prog = _program("fusion", vc, _build_fusion_grad)
                params_b, opt_b, floss = fusion_prog(
                    params_b, opt_b, aug_vox_all, pred, w_vec, ci_vec,
                    keys2, bf_b)
            else:
                boot_prog = _program("bootstrap", vc, _build_bootstrap)
                params_b, opt_b, floss = boot_prog(
                    params_b, opt_b, aug_vox_all, eft_imgs_all, ci_vec,
                    keys2, bf_b)

        pending.append(loss)
        if floss is not None:
            pending_f.append(floss)
        if (itr + 1) % fetch_every == 0 or itr == cfg.max_itr - 1:
            _drain(itr)
        iter_times.append(time.time())

        if verbose and itr % 200 == 0 and losses[0]:
            print(f"itr {itr:5d} loss {np.mean([l[-1] for l in losses]):.4f}"
                  f" ({S * (itr + 1) / (time.time() - t0):.2f} "
                  "scene-it/s)")

    # ---- Phase C: per-scene eval (programs shared across scenes) ---------
    vcfg_eval = active_vcfg(cfg.max_itr)
    nff = steps.make_nff

    @jax.jit
    def eval_render_views(params, cams, keys, bitfield):
        # all N scene views in one program + one bulk fetch (mirrors
        # the sequential loop's Phase-C batching)
        def one(i):
            return _render_cam(ngp_model, params,
                               get_camera_slice(cams, i[None]),
                               image_size, vcfg_eval, keys[i],
                               perturb=True, near_far_fn=nff(bitfield))

        return jax.lax.map(one, jnp.arange(n_frames))

    n_circle = cfg.n_aug_cameras

    @jax.jit
    def eval_orbit(params, cams, keys, bitfield):
        def one(i):
            return _render_cam(ngp_model, params,
                               get_camera_slice(cams, i[None]),
                               image_size, vcfg_eval, keys[i],
                               perturb=True, near_far_fn=nff(bitfield))

        return jax.lax.map(one, jnp.arange(n_circle))

    lpips_jit = (jax.jit(lambda a, b: lpips_fn(a, b))
                 if lpips_fn is not None else None)
    results = []
    for si in range(S_real):  # padded mesh slots are never evaluated
        params = _tree_at(params_b, si)
        bitfield = bf_b[si]
        scene = scenes[si]
        scene_vox = scene_vox_list[si]
        rng, k_eval = jax.random.split(rng)
        imgs_d, sils_d = eval_render_views(
            params, scene_vox, jax.random.split(k_eval, n_frames),
            bitfield)
        renders = list(np.asarray(imgs_d))
        sils = list(np.asarray(sils_d))
        metrics = {"psnr": [], "ssim": []}
        if lpips_jit is not None:
            metrics["lpips"] = [
                float(v) for v in np.asarray(
                    lpips_jit(imgs_d, jnp.asarray(scene.images)))]
        for ci in range(n_frames):
            gt = np.asarray(scene.images[ci])
            metrics["psnr"].append(psnr(renders[ci], gt))
            metrics["ssim"].append(ssim(renders[ci], gt))
        summary = {k: float(np.mean(v)) for k, v in metrics.items()}
        if verbose:
            print(f"scene {scene.sequence_name} psnr: "
                  f"{summary['psnr']:.2f} ssim: {summary['ssim']:.3f}")

        circle_cams = get_interpolated_path(scene_vox, n=n_circle)
        rng, k_orbit = jax.random.split(rng)
        c_imgs, c_sils = eval_orbit(params, circle_cams,
                                    jax.random.split(k_orbit, n_circle),
                                    bitfield)
        c_imgs, c_sils = np.asarray(c_imgs), np.asarray(c_sils)
        circle_renders = np.stack([
            np.hstack([c_imgs[i], np.repeat(c_sils[i], 3, axis=-1)])
            for i in range(n_circle)
        ])

        result = {
            "ngp_params": params,
            "renders": np.stack(renders),
            "silhouettes": np.stack(sils),
            "circle_renders": circle_renders,
            "metrics": summary,
            "losses": losses[si],
            "fusion_losses": fusion_losses_log[si],
            "iter_times": iter_times,
            "sync_times": sync_times,
        }
        if save_dir is not None:
            cache = None
            if use_diffusion:
                cache = {"eft_images": np.asarray(eft_imgs_all[si])}
            _save_outputs(result, scene, cache, save_dir, verbose)
        results.append(result)
    return results
