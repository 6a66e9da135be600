"""Per-scene diffusion distillation: EFT cache -> NGP optimization -> eval.

TPU-first re-design of ``sparsefusion/distillation.py:26-526``.  The three
phases map onto three jitted programs:

* Phase A — feature cache: one jitted (query-camera -> EFT feature image +
  rgb render) program, looped over the ~N+50 augmented orbit cameras.
* Phase B — the 3000-iter loop runs exactly two jitted steps per
  iteration, mirroring the reference's two optimizer steps:
  (1) input-view photometric step (render at H/2, huber color+silhouette
  + opacity reg), and (2) a fusion step — either the EFT bootstrap
  (iters <= start_fusion_step) or the diffusion step: render -> VAE
  encode -> masked-scan PLMS partial denoise -> VAE decode -> (1-alpha)
  weighted L1 — all inside ONE compiled graph per mode, with the sampler
  under stop_gradient exactly like the reference's no_grad blocks.
* Phase C — eval: chunked full-res renders per scene camera, PSNR/SSIM
  (+LPIPS when weights are available), gif/metrics dumps, param save.

Randomized quantities (camera choice, max_thres) are drawn on host or
passed as scalars so each mode stays a single XLA executable.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparsefusion_tpu.core.cameras import (
    Cameras,
    camera_centers,
    concat_cameras,
    get_camera_slice,
    get_relative_cameras,
)
from sparsefusion_tpu.core.paths import get_interpolated_path
from sparsefusion_tpu.core.rays import grid_ray_bundle
from sparsefusion_tpu.data.contract import SceneData
from sparsefusion_tpu.diffusion.plms import plms_sample
from sparsefusion_tpu.models import SparseFusionModels
from sparsefusion_tpu.nn.ngp import NGPConfig, NGPField
from sparsefusion_tpu.render.lightfield import render_light_field
from sparsefusion_tpu.render.volume import (
    VolumeRendererConfig,
    render_rays_chunked,
)
from sparsefusion_tpu.ops.image import resize_bilinear, resize_nearest
from sparsefusion_tpu.utils.image import huber, to_uint8
from sparsefusion_tpu.utils.metrics import psnr, ssim


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Merges ``get_default_torch_ngp_opt`` + loop hyperparameters."""

    max_itr: int = 3000
    start_fusion_step: int = 1000
    lambda_color: float = 1.0
    lambda_sil: float = 1.0
    lambda_opacity: float = 1e-3
    lambda_entropy: float = 0.0
    lambda_percep: float = 0.1   # enabled after start_fusion_step
    lr: float = 5e-4
    # the torch StepLR(3000) ticks once per iteration; optax schedules
    # tick per optimizer update and we apply two updates per iteration
    # (input + fusion, mirroring distillation.py:244/352) -> 6000
    lr_decay_step: int = 6000
    lr_decay_gamma: float = 0.2
    hw_scale: int = 2
    eft_scale: int = 8
    eft_n_pts: int = 20
    n_aug_cameras: int = 50
    theta_offset_max: float = 0.17
    bound: float = 4.0
    min_near: float = 0.1
    num_steps: int = 64
    upsample_steps: int = 64
    max_ray_batch: int = 4096
    plms_steps: int = 50
    cond_scale: float = 1.0
    # host-driven PLMS loop: compiles one small x_prev program + reuses
    # the single UNet program per step, instead of one giant scan program
    # (which the axon remote-compile relay cannot digest at full model
    # size).  Bit-equal to the scan (tests/test_plms_host.py).  None =
    # auto: host loop on non-CPU platforms, scan on CPU.
    plms_host_loop: Optional[bool] = None
    # host-PLMS steps 1..49 as one jitted masked scan (single dispatch)
    # instead of 2 dispatches per step; None = SF_PLMS_SCAN_TAIL env
    plms_scan_tail: Optional[bool] = None
    # bfloat16 activations for the sampler UNet (no grads flow through
    # it; params stay f32) — ~2x on the MXU for the PLMS denoise chain
    sampler_bf16: bool = False
    eval_every: int = 0           # 0 disables intermediate eval dumps
    ngp: NGPConfig = NGPConfig()
    # occupancy-guided sampling (TPU-native replacement for the cuda_ray
    # path): tighten [near, far] to the occupied span so a smaller fixed
    # sample budget lands on matter.  Off by default (reference demo uses
    # cuda_ray=False).
    use_occupancy: bool = False
    occupancy_start: int = 500
    occupancy_update_every: int = 16
    occupancy_probe: int = 64
    # single-pass occupancy marching (the TPU equivalent of the
    # reference's cuda_ray path, ``raymarching.cu:312-480``): once the
    # occupancy grid is live (itr >= occupancy_start), render with
    # occ_march_steps stratified samples inside the occupancy-tightened
    # [near, far] span — ONE field eval instead of the coarse+importance
    # double eval, no argsort/searchsorted.  ~half the gather rows (the
    # TPU bottleneck) at comparable effective sample density, because
    # the tightened span concentrates the whole budget on matter.
    # None = keep two-phase sampling throughout (reference semantics).
    occ_march_steps: Optional[int] = None
    # polish tail: from this iteration on, drop back from single-pass
    # marching to the two-phase num_steps+upsample_steps sampler (still
    # inside the occupancy-tightened [near, far] span).  The march-32
    # preset trades ~0.2 dB for 1.65x wall-clock at full length (PERF.md
    # round 3); a short two-phase tail buys the quality back at ~214 ms
    # extra per polish iter.  None = march to the end.
    polish_start: Optional[int] = None
    # fetch loss scalars from device every N iterations instead of every
    # iteration (the reference's eval cadence, ``distillation.py:355``):
    # a per-iter float() fetch costs a host<->device round trip that
    # serializes the dispatch pipeline on relay-latency backends.
    loss_fetch_every: int = 20
    # torch-ngp opt density_thresh (``distillation.py:513``) — the raw-sigma
    # cutoff for marking a grid cell occupied (NOT the density-blob prior
    # amplitude, which is cfg.ngp.density_blob_scale).
    density_thresh: float = 10.0
    # input/bootstrap steps on a random ray subset instead of the full
    # render_hw^2 grid (torch-ngp's own NeRF training idiom): the huber
    # photometric + silhouette losses are means over pixels, so a uniform
    # pixel subset is an unbiased estimate at 1/4 the points.  The fusion
    # step always renders the full image (the VAE needs it).  None = full
    # grid (the reference renders full images every step).
    input_rays: Optional[int] = None
    # fusion GRAD step on a ray subset, comparing against the
    # box-downsampled PLMS prediction at render_hw — only taken when the
    # perceptual term is inactive (LPIPS needs the full image; with
    # lpips_fn set the grad step always renders the full grid).  The
    # no-grad render feeding the VAE is always full.
    fusion_rays: Optional[int] = None
    # store render residuals instead of re-rendering chunks in backward
    # (chunked renders at tpu-preset sizes fit HBM comfortably)
    remat: bool = True
    # fuse each loop iteration's dispatch chain into a few large jitted
    # programs: bootstrap iters become ONE program (rng split + input
    # step + bootstrap step), fusion iters become FOUR (front: split +
    # input step + full render + VAE encode + q_sample; PLMS step0;
    # PLMS scan tail; back: clip + VAE decode + fusion grad step) —
    # instead of ~12 dispatches incl. the eager q_sample/normal ops.
    # Each dispatch costs host Python + relay latency that the device
    # cannot overlap once the pipeline drains; measured on the v5e drive
    # (PERF.md round 4).  Key-split structure is reproduced exactly, so
    # the fused loop is numerically identical to the unfused one
    # (asserted in tests/test_distill_fused.py).  The fused fusion path
    # uses the host-PLMS scan-tail programs; it requires
    # plms_host_loop + plms_scan_tail semantics (forced internally).
    # None = auto: fused on non-CPU platforms, unfused on CPU (where
    # the extra program compiles dominate tiny-test runtimes).
    fused_steps: Optional[bool] = None

    def __post_init__(self):
        # subset sizes above max_ray_batch would hit the chunked
        # renderer's opaque `n % chunk == 0` assert (render/volume.py);
        # validate at config time with an actionable message instead
        for name in ("input_rays", "fusion_rays"):
            v = getattr(self, name)
            if v and v > self.max_ray_batch \
                    and v % self.max_ray_batch != 0:
                raise ValueError(
                    f"{name}={v} exceeds max_ray_batch="
                    f"{self.max_ray_batch} but is not a multiple of it; "
                    "the chunked renderer needs equal chunks — use a "
                    f"multiple of {self.max_ray_batch} or raise "
                    "max_ray_batch")


def tpu_distill_config(**overrides) -> DistillConfig:
    """TPU-tuned preset: fewer/wider hash levels (8 x C4 keeps the same
    32-d encoding but halves gather rows — the TPU bottleneck),
    two-phase 32+32 sampling until the occupancy grid matures, then
    SINGLE-PASS 32-sample occupancy marching (``occ_march_steps`` — the
    cuda_ray-path equivalent: the whole budget lands inside the
    occupancy-tightened span; one field eval, no sort), bf16 expanded
    tables, one 16k-ray chunk per 128^2 render, stored render residuals
    instead of remat (v5e HBM fits them comfortably), and 4096-ray
    subsampled input/bootstrap steps (the torch-ngp NeRF-training
    idiom; unbiased for the pixel-mean losses).

    Measured on v5e (benchmarks/distill_drive.py, round 3): bootstrap
    195 ms/iter, march fusion 307-313 ms/iter (was ~490 two-phase), and
    PSNR 25.76 vs 25.56 for the two-phase preset on the 300-iter
    fixture drive — faster AND slightly better, because the tightened
    span concentrates all 32 samples on matter.  The 24+24 two-phase
    budget (144 ms bootstrap) measured -1.0 dB and is NOT the default."""
    base = dict(
        ngp=NGPConfig(num_levels=8, level_dim=4, table_dtype="bfloat16"),
        use_occupancy=True,
        num_steps=32,
        upsample_steps=32,
        occ_march_steps=32,
        max_ray_batch=16384,
        input_rays=4096,
        fusion_rays=4096,
        remat=False,
        plms_scan_tail=True,
        # measured SLOWER in bf16 at 32x32x4/batch-1 (5.9 vs 4.8 ms per
        # CFG eval, benchmarks/fusion_decompose.py) — cast overhead beats
        # MXU gains at these activation sizes
        sampler_bf16=False,
    )
    base.update(overrides)
    return DistillConfig(**base)


def make_ngp_optimizer(cfg: DistillConfig):
    """Adam with 10x LR on the grid table (``network_grid.py:223-233``)
    and StepLR decay (``distillation.py:166``)."""

    def sched(base):
        return optax.exponential_decay(
            base, transition_steps=cfg.lr_decay_step,
            decay_rate=cfg.lr_decay_gamma, staircase=True)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "grid" if any(
                getattr(p, "key", None) == "grid" for p in path) else "mlp",
            params)

    return optax.multi_transform(
        {"grid": optax.adam(sched(cfg.lr * 10)),
         "mlp": optax.adam(sched(cfg.lr))},
        label_fn)


def _scene_depth_range(cams: Cameras):
    dist = float(np.mean(np.linalg.norm(np.asarray(camera_centers(cams)),
                                        axis=1)))
    return dist - 5.0, dist + 5.0


def _render_cam(ngp_model, ngp_params, cam: Cameras, hw: int,
                vcfg: VolumeRendererConfig, rng, perturb: bool,
                near_far_fn=None, ray_idx=None, remat: bool = True):
    """Render a camera; with ``ray_idx`` (K,) only those grid rays."""
    bundle = grid_ray_bundle(cam, hw, hw, 2, 1.0, 2.0)
    o = bundle.origins.reshape(-1, 3)
    d = bundle.directions.reshape(-1, 3)
    if ray_idx is not None:
        o = jnp.take(o, ray_idx, axis=0)
        d = jnp.take(d, ray_idx, axis=0)
    # expand the blocked grid tables once per render, shared by all chunks
    tables = ngp_model.apply({"params": ngp_params},
                             method=NGPField.expand_tables)
    field = lambda x: ngp_model.apply({"params": ngp_params}, x, tables)
    # view-direction background net when bg_radius > 0
    # (``renderer_df.py:448-456``, ``network_grid.py:211-220``)
    bg_fn = None
    if ngp_model.config.bg_radius > 0:
        bg_fn = lambda d: ngp_model.apply({"params": ngp_params}, d,
                                          method=NGPField.background)
    out = render_rays_chunked(field, o, d, vcfg, rng, perturb=perturb,
                              det_importance=False, bg_color=0.0,
                              remat=remat, near_far_fn=near_far_fn,
                              bg_fn=bg_fn)
    if ray_idx is not None:
        return out["image"], out["weights_sum"][:, None]
    img = out["image"].reshape(hw, hw, 3)
    sil = out["weights_sum"].reshape(hw, hw, 1)
    return img, sil


def make_scene_step_fns(ngp_model, cfg: DistillConfig, tx,
                        render_hw: int, image_size: int, lpips_fn=None):
    """Build the PER-SCENE pure step functions of the distillation loop.

    Shared by :func:`distillation_loop` (which jits them with a static
    render config + donated params) and the scene-batched loop
    (``distill/batched.py``, which vmaps them over a leading scene axis
    before jitting) — the loss plumbing is defined once.  Every function
    takes ``(vc, ...)`` explicitly; nothing device-sized is closed over.

    Returns an object with ``input_step`` / ``bootstrap_step`` /
    ``fusion_grad_step`` (each ``(vc, params, opt_state, ...) ->
    (params, opt_state, loss)``), ``render_up`` / ``render_up_img``
    (full-image no-grad render + bilinear upsample), and ``make_nff``
    (occupancy near/far tightening factory).
    """
    import math as _math

    from sparsefusion_tpu.render.occupancy import occupancy_near_far

    # OccupancyGrid geometry (defaults mirrored; the loop constructs
    # OccupancyGrid(bound=cfg.bound) whose grid_size/cascade are these)
    occ_grid_size = 128
    occ_cascade = 1 + int(_math.ceil(_math.log2(max(cfg.bound, 1.0))))

    def make_nff(bitfield):
        if not cfg.use_occupancy:
            return None
        return lambda o, d, n, f: occupancy_near_far(
            bitfield, o, d, n, f, cfg.bound, occ_grid_size,
            occ_cascade, cfg.occupancy_probe)[:2]

    def _ray_subset(key):
        """(ray_idx, render_key): uniform pixel subset (with replacement)
        of the render_hw grid — unbiased for the pixel-mean losses."""
        if not cfg.input_rays or cfg.input_rays >= render_hw * render_hw:
            return None, key
        k_sel, k_render = jax.random.split(key)
        ray_idx = jax.random.randint(k_sel, (cfg.input_rays,), 0,
                                     render_hw * render_hw)
        return ray_idx, k_render

    def _at_rays(img_hw, ray_idx):
        if ray_idx is None:
            return img_hw
        flat = img_hw.reshape(-1, img_hw.shape[-1])
        return jnp.take(flat, ray_idx, axis=0)

    def input_losses(vc, params, cam, gt_rgb, gt_mask, key, bitfield):
        ray_idx, key = _ray_subset(key)
        img, sil = _render_cam(ngp_model, params, cam, render_hw, vc, key,
                               perturb=True, near_far_fn=make_nff(bitfield),
                               ray_idx=ray_idx, remat=cfg.remat)
        gt_rgb_ds = resize_nearest(gt_rgb[None], (render_hw, render_hw))[0]
        color_err = jnp.mean(jnp.abs(huber(img, _at_rays(gt_rgb_ds,
                                                         ray_idx))))
        loss = cfg.lambda_color * color_err
        if gt_mask is not None:
            gt_mask_ds = resize_nearest(gt_mask[None],
                                        (render_hw, render_hw))[0]
            loss += cfg.lambda_sil * jnp.mean(
                jnp.abs(huber(sil, _at_rays(gt_mask_ds, ray_idx))))
        if cfg.lambda_opacity > 0:
            loss += cfg.lambda_opacity * jnp.mean(
                jnp.sqrt(sil ** 2 + 0.01))
        return loss

    def input_step(vc, params, opt_state, cam, gt_rgb, gt_mask, key,
                   bitfield):
        loss, grads = jax.value_and_grad(input_losses, argnums=1)(
            vc, params, cam, gt_rgb, gt_mask, key, bitfield)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def render_up(vc, params, cam, key, bitfield):
        img, sil = _render_cam(ngp_model, params, cam, render_hw, vc, key,
                               perturb=True, near_far_fn=make_nff(bitfield),
                               remat=cfg.remat)
        img = resize_bilinear(img[None], (image_size, image_size))[0]
        sil = resize_bilinear(sil[None], (image_size, image_size))[0]
        return img, sil

    def render_up_img(vc, params, cam, k_r, bitfield):
        img, _ = render_up(vc, params, cam, k_r, bitfield)
        return img

    def bootstrap_losses(vc, params, cam, eft_img, key, bitfield):
        if cfg.input_rays:
            # subsampled variant: compare at render_hw scale against the
            # box-downsampled EFT target (the full-grid reference path
            # compares the bilinear-upsampled render at image_size)
            ray_idx, key = _ray_subset(key)
            img, sil = _render_cam(
                ngp_model, params, cam, render_hw, vc, key, perturb=True,
                near_far_fn=make_nff(bitfield), ray_idx=ray_idx,
                remat=cfg.remat)
            eft_ds = resize_bilinear(eft_img[None],
                                     (render_hw, render_hw))[0]
            target = _at_rays(eft_ds, ray_idx)
        else:
            img, sil = render_up(vc, params, cam, key, bitfield)
            target = eft_img
        noisy_mask = jnp.mean(target, axis=-1, keepdims=True)
        noisy_mask = (noisy_mask > 0.1).astype(jnp.float32)
        loss = cfg.lambda_color * jnp.mean(jnp.abs(huber(img, target)))
        loss += cfg.lambda_sil * jnp.mean(jnp.abs(huber(sil, noisy_mask)))
        loss += cfg.lambda_opacity * jnp.mean(jnp.sqrt(sil ** 2 + 0.01))
        return loss

    def bootstrap_step(vc, params, opt_state, cam, eft_img, key, bitfield):
        loss, grads = jax.value_and_grad(bootstrap_losses, argnums=1)(
            vc, params, cam, eft_img, key, bitfield)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    use_percep = lpips_fn is not None and cfg.lambda_percep > 0
    subsample_fusion = bool(cfg.fusion_rays) and not use_percep \
        and cfg.fusion_rays < render_hw * render_hw

    def fusion_losses(vc, params, cam, pred_img, fusion_weight, k_r,
                      bitfield):
        if subsample_fusion:
            k_sel, k_r = jax.random.split(k_r)
            ray_idx = jax.random.randint(k_sel, (cfg.fusion_rays,), 0,
                                         render_hw * render_hw)
            img, sil = _render_cam(
                ngp_model, params, cam, render_hw, vc, k_r, perturb=True,
                near_far_fn=make_nff(bitfield), ray_idx=ray_idx,
                remat=cfg.remat)
            pred_ds = resize_bilinear(pred_img[None],
                                      (render_hw, render_hw))[0]
            loss = fusion_weight * jnp.mean(
                jnp.abs(img - _at_rays(pred_ds, ray_idx)))
            loss += cfg.lambda_opacity * jnp.mean(
                jnp.sqrt(sil ** 2 + 0.01))
            return loss
        img, sil = render_up(vc, params, cam, k_r, bitfield)
        loss = fusion_weight * jnp.mean(jnp.abs(img - pred_img))
        if use_percep:
            # perceptual term active after start_fusion_step
            # (distillation.py:176-178, 312-314); grads flow through img
            loss += cfg.lambda_percep * jnp.mean(
                lpips_fn(img[None], pred_img[None]))
        loss += cfg.lambda_opacity * jnp.mean(jnp.sqrt(sil ** 2 + 0.01))
        return loss

    def fusion_grad_step(vc, params, opt_state, cam, pred_img,
                         fusion_weight, k_r, bitfield):
        loss, grads = jax.value_and_grad(fusion_losses, argnums=1)(
            vc, params, cam, pred_img, fusion_weight, k_r, bitfield)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    class _Steps:
        pass

    s = _Steps()
    s.make_nff = make_nff
    s.input_losses = input_losses
    s.input_step = input_step
    s.render_up = render_up
    s.render_up_img = render_up_img
    s.bootstrap_losses = bootstrap_losses
    s.bootstrap_step = bootstrap_step
    s.fusion_losses = fusion_losses
    s.fusion_grad_step = fusion_grad_step
    s.subsample_fusion = subsample_fusion
    s.use_percep = use_percep
    return s


def distillation_loop(
    models: SparseFusionModels,
    scene: SceneData,
    input_idx,
    cfg: DistillConfig,
    rng: jax.Array,
    save_dir: Optional[str] = None,
    use_diffusion: bool = True,
    verbose: bool = True,
    lpips_fn=None,
) -> Dict[str, Any]:
    """Optimize an NGP for one scene; returns params + metrics + renders."""
    image_size = scene.images.shape[1]
    render_hw = image_size // cfg.hw_scale
    eft_hw = image_size // cfg.eft_scale

    scene_cameras = scene.cameras()
    scene_rgb = jnp.asarray(scene.images)
    scene_mask = jnp.asarray(scene.masks) if scene.masks is not None else None

    # ---- camera frames (distillation.py:64-79) ---------------------------
    scene_rel = get_relative_cameras(scene_cameras, [0], center_at_origin=True)
    scene_vox = get_relative_cameras(scene_cameras, [0],
                                     center_at_origin=False)
    aug = get_interpolated_path(scene_cameras, n=cfg.n_aug_cameras,
                                theta_offset_max=cfg.theta_offset_max,
                                rng=np.random.RandomState(0))
    aug_all = concat_cameras([scene_cameras, aug])
    aug_rel = get_relative_cameras(aug_all, [0], center_at_origin=True)
    aug_vox = get_relative_cameras(aug_all, [0], center_at_origin=False)

    min_depth, max_depth = _scene_depth_range(scene_cameras)
    vcfg = VolumeRendererConfig(
        num_steps=cfg.num_steps, upsample_steps=cfg.upsample_steps,
        bound=cfg.bound, min_near=cfg.min_near,
        max_ray_batch=cfg.max_ray_batch)
    # single-pass marching config, active once the occupancy grid is live
    # (every jitted step below takes the render config as a STATIC arg,
    # so the two modes are two cache entries of the same function)
    march_on = bool(cfg.use_occupancy and cfg.occ_march_steps)
    vcfg_march = dataclasses.replace(
        vcfg, march_steps=int(cfg.occ_march_steps)) if march_on else vcfg

    def active_vcfg(itr: int) -> VolumeRendererConfig:
        if march_on and cfg.polish_start is not None \
                and itr >= cfg.polish_start:
            return vcfg  # two-phase polish tail (occupancy-tightened)
        return vcfg_march if (march_on and itr >= cfg.occupancy_start) \
            else vcfg

    # donating params/opt_state lets XLA reuse their buffers in-place;
    # CPU backends don't implement donation (noisy warnings in tests)
    _donate = (1, 2) if jax.default_backend() != "cpu" else ()

    def _jit_step(fn):
        return jax.jit(fn, static_argnums=(0,), donate_argnums=_donate)

    input_idx = list(int(i) for i in input_idx)
    n_cache = len(aug_rel)

    # ---- Phase A: EFT feature cache (distillation.py:92-141) -------------
    feature_cache = None
    if use_diffusion:
        t0 = time.time()
        eft_model = models.eft_model
        ctx_idx = jnp.asarray(input_idx)

        # ONE jitted program for the whole cache: the relativization +
        # render of every query camera rides a lax.map (the reference
        # loops renderer calls per camera, distillation.py:92-141 — here
        # a per-camera host loop would pay a relay dispatch each).  EFT
        # params enter as ARGUMENTS (embedding them as HLO constants
        # bloats the program; see the UNet lesson in PERF.md).
        @jax.jit
        def cache_all(eft_vars, cams_all: Cameras, ctx_rgb, latent):
            def one(ci):
                rel_ci = get_relative_cameras(cams_all, ci[None],
                                              center_at_origin=True)
                q_cam = get_camera_slice(rel_ci, ci[None])
                c_cams = get_camera_slice(rel_ci, ctx_idx)

                def ray_fn(o, d, lengths):
                    return eft_model.apply(eft_vars, o, d, lengths,
                                           c_cams, ctx_rgb, latent)

                rgb, feat = render_light_field(
                    ray_fn, q_cam, eft_hw, eft_hw, min_depth, max_depth,
                    n_pts_per_ray=cfg.eft_n_pts, n_batches=16)
                eft_img = resize_bilinear(rgb, (image_size, image_size),
                                          align_corners=False)
                return feat[0], eft_img[0]

            return jax.lax.map(one, jnp.arange(n_cache))

        ctx_rgb = scene_rgb[ctx_idx]
        # the ResNet encode depends only on the context images — hoist it
        # out of the per-query-camera map (the reference re-encodes per
        # camera, distillation.py:110)
        ctx_latent = jax.jit(
            lambda vv, imgs: eft_model.apply(
                vv, imgs, method=type(eft_model).encode))(
                    models.eft_vars, ctx_rgb)
        feats, imgs = cache_all(models.eft_vars, aug_rel, ctx_rgb,
                                ctx_latent)

        # per-camera voxel-frame camera slices, cut on HOST numpy (the
        # jnp fancy-index per camera would be ~5 eager relay dispatches
        # each); re-device-ing happens lazily at first use
        aug_vox_np = jax.tree_util.tree_map(np.asarray, aug_vox)
        cams_vox_list = [
            jax.tree_util.tree_map(lambda a, i=ci: a[i:i + 1], aug_vox_np)
            for ci in range(n_cache)
        ]
        feature_cache = {
            "features": feats,                        # (M, eft, eft, 256)
            "eft_images": imgs,                       # (M, H, W, 3)
            "cameras_vox": cams_vox_list,
        }
        if verbose:
            print(f"cached {n_cache} features in {time.time() - t0:.1f}s")

    # ---- Phase B: NGP optimization (distillation.py:163-352) -------------
    ngp_model = NGPField(cfg.ngp)
    rng, k_init = jax.random.split(rng)
    if cfg.ngp.bg_radius > 0:
        ngp_params = ngp_model.init(k_init, jnp.zeros((8, 3)),
                                    method=NGPField.init_all)["params"]
    else:
        ngp_params = ngp_model.init(k_init, jnp.zeros((8, 3)))["params"]
    tx = make_ngp_optimizer(cfg)
    opt_state = tx.init(ngp_params)

    occ_grid = None
    bitfield = jnp.zeros((8,), jnp.uint8)  # placeholder when unused
    if cfg.use_occupancy:
        from sparsefusion_tpu.render.occupancy import OccupancyGrid

        occ_grid = OccupancyGrid(bound=cfg.bound,
                                 density_thresh=cfg.density_thresh)
        bitfield = occ_grid.full_bitfield()

    # per-scene pure step bodies, shared with the scene-batched loop
    steps = make_scene_step_fns(ngp_model, cfg, tx, render_hw,
                                image_size, lpips_fn=lpips_fn)
    make_nff = steps.make_nff
    input_step = _jit_step(steps.input_step)
    bootstrap_step = _jit_step(steps.bootstrap_step)

    # models may be None when use_diffusion=False (the NGP-only demo path
    # needs no EFT/VAE/UNet at all).  The host path passes UNet/VAE
    # params as jit ARGUMENTS (models.unet_apply / vae_*_p): closing over
    # them embeds ~GBs of literal constants in the HLO, which the
    # remote-compile relay cannot ingest (broken-pipe at upload).
    denoise_fn = models.denoise_fn() if use_diffusion else None
    unet_apply = (models.unet_apply_fn(bf16=cfg.sampler_bf16)
                  if use_diffusion else None)

    # The diffusion target is compiled in PIECES: one program holding
    # render + 4 UNet instances + VAE enc/dec + the render backward
    # exceeded the remote compiler (connection dropped after ~40 min).
    # The reference runs the sampler under no_grad anyway
    # (distillation.py:298-309); rendering twice with the same key
    # reproduces the identical image in both programs.
    fusion_render_fwd = partial(jax.jit, static_argnums=(0,))(
        steps.render_up_img)

    use_host_plms = cfg.plms_host_loop
    if use_host_plms is None:
        use_host_plms = jax.default_backend() != "cpu"

    if use_host_plms:
        from sparsefusion_tpu.diffusion.plms import plms_sample_host

        vae_enc = jax.jit(lambda vv, img: models.vae_encode_p(vv,
                                                              img[None]))
        vae_dec = jax.jit(lambda vv, z: models.vae_decode_p(vv, z)[0])

        def fusion_sample(img, features, k_t, k_s, max_thres):
            # max_thres is drawn on HOST (host_rng in the loop body,
            # mirroring distillation.py:303) — a device uniform would
            # force a blocking scalar fetch at the top of every fusion
            # iteration, serializing the dispatch pipeline
            latents = vae_enc(models.vae_vars, img)
            pred_x0, _, _, alpha_cumprod = plms_sample_host(
                models.ddpm, unet_apply, k_s, latents, max_thres,
                cond_images=features[None], cond_scale=cfg.cond_scale,
                plms_steps=cfg.plms_steps, scan_tail=cfg.plms_scan_tail,
                unet_params=models.sampler_unet_params(cfg.sampler_bf16))
            return vae_dec(models.vae_vars, pred_x0), 1.0 - alpha_cumprod[0]
    else:
        @jax.jit
        def fusion_sample(img, features, k_t, k_s, max_thres=None):
            latents = models.vae_encode(img[None])
            max_thres = jnp.clip(jax.random.uniform(k_t), 0.0, 0.99)
            pred_x0, _, _, alpha_cumprod = plms_sample(
                models.ddpm, denoise_fn, k_s, latents, max_thres,
                cond_images=features[None], cond_scale=cfg.cond_scale,
                plms_steps=cfg.plms_steps)
            pred_img = models.vae_decode(pred_x0)[0]
            return pred_img, 1.0 - alpha_cumprod[0]

    def fusion_target(vc, params, cam, features, k_r, k_t, k_s, bitfield,
                      max_thres):
        img = fusion_render_fwd(vc, params, cam, k_r, bitfield)
        return fusion_sample(img, features, k_t, k_s, max_thres)

    fusion_grad_step = _jit_step(steps.fusion_grad_step)

    def fusion_step(vc, params, opt_state, cam, features, key, bitfield,
                    max_thres=None):
        k_r, k_t, k_s = jax.random.split(key, 3)
        pred_img, weight = fusion_target(vc, params, cam, features, k_r,
                                         k_t, k_s, bitfield, max_thres)
        pred_img = jax.lax.stop_gradient(pred_img)
        return fusion_grad_step(vc, params, opt_state, cam, pred_img,
                                weight, k_r, bitfield)

    # ---- fused per-iteration programs (cfg.fused_steps) -------------------
    # Collapse each iteration's dispatch chain into a few large programs;
    # the key-split structure reproduces the unfused path EXACTLY (split3
    # at the top, then the fusion_step/plms_sample_host split tree), so
    # fused and unfused loops are numerically identical
    # (tests/test_distill_fused.py).
    use_fused = cfg.fused_steps
    if use_fused is None:
        use_fused = jax.default_backend() != "cpu"

    input_iter_fused = boot_iter_fused = None
    fused_fusion_iter = None
    if use_fused:

        def _input_iter(vc, params, opt_state, rng, cam, gt_rgb, gt_mask,
                        bitfield):
            rng, k1, _ = jax.random.split(rng, 3)
            params, opt_state, loss = steps.input_step(
                vc, params, opt_state, cam, gt_rgb, gt_mask, k1, bitfield)
            return params, opt_state, rng, loss

        input_iter_fused = _jit_step(_input_iter)

        if use_diffusion:
            from sparsefusion_tpu.diffusion.plms import (
                _scan_tail_jit,
                _step0_jit,
                host_schedule,
            )

            def _boot_iter(vc, params, opt_state, rng, cam, gt_rgb,
                           gt_mask, cam_f, eft_images, ci, bitfield):
                rng, k1, k2 = jax.random.split(rng, 3)
                params, opt_state, loss = steps.input_step(
                    vc, params, opt_state, cam, gt_rgb, gt_mask, k1,
                    bitfield)
                params, opt_state, floss = steps.bootstrap_step(
                    vc, params, opt_state, cam_f, eft_images[ci], k2,
                    bitfield)
                return params, opt_state, rng, loss, floss

            boot_iter_fused = _jit_step(_boot_iter)

            def _fusion_front(vc, params, opt_state, rng, cam, gt_rgb,
                              gt_mask, cam_f, feats_all, ci, vae_vars,
                              max_thres, bitfield):
                rng, k1, k2 = jax.random.split(rng, 3)
                params, opt_state, loss = steps.input_step(
                    vc, params, opt_state, cam, gt_rgb, gt_mask, k1,
                    bitfield)
                # fusion_step's split tree (k_t unused: max_thres is
                # host-drawn, mirroring distillation.py:303)
                k_r, _, k_s = jax.random.split(k2, 3)
                img = steps.render_up_img(vc, params, cam_f, k_r, bitfield)
                cond = feats_all[ci][None]
                latents = models.vae_encode_p(vae_vars, img[None])
                # plms_sample_host's q_sample prologue
                k_init, k_loop = jax.random.split(k_s)
                noise = jax.random.normal(k_init, latents.shape,
                                          latents.dtype)
                x_noisy, log_snr = models.ddpm.schedule.q_sample(
                    latents, max_thres, noise)
                weight = 1.0 - jax.nn.sigmoid(log_snr)[0]
                return (params, opt_state, rng, loss, latents, x_noisy,
                        cond, k_loop, k_r, weight)

            fusion_front_fused = _jit_step(_fusion_front)

            def _fusion_back(vc, params, opt_state, cam_f, pred_x0,
                             weight, k_r, vae_vars, bitfield):
                dcfg = models.ddpm.config
                if dcfg.clip_output:
                    pred_x0 = jnp.clip(pred_x0, -dcfg.clip_value,
                                       dcfg.clip_value)
                pred_img = models.vae_decode_p(vae_vars, pred_x0)[0]
                pred_img = jax.lax.stop_gradient(pred_img)
                return steps.fusion_grad_step(
                    vc, params, opt_state, cam_f, pred_img, weight, k_r,
                    bitfield)

            fusion_back_fused = _jit_step(_fusion_back)

            def fused_fusion_iter(vc, params, opt_state, rng, cam, gt_rgb,
                                  gt_mask, cam_f, ci, mt, bitfield):
                (params, opt_state, rng, loss, latents, x_noisy, cond,
                 k_loop, k_r, weight) = fusion_front_fused(
                    vc, params, opt_state, rng, cam, gt_rgb, gt_mask,
                    cam_f, feature_cache["features"], np.int32(ci),
                    models.vae_vars, np.float32(mt), bitfield)
                full_start, n_steps, times = host_schedule(
                    mt, cfg.plms_steps)
                img = latents if full_start else x_noisy
                s_params = models.sampler_unet_params(cfg.sampler_bf16)
                if n_steps > 0:
                    step0 = _step0_jit(models.ddpm, unet_apply,
                                       cfg.cond_scale, 1, with_params=True)
                    img, hist, k_loop = step0(s_params, k_loop, img,
                                              float(times[0]),
                                              float(times[1]), cond)
                    if n_steps > 1:
                        tail = _scan_tail_jit(models.ddpm, unet_apply,
                                              cfg.cond_scale, 1,
                                              cfg.plms_steps,
                                              with_params=True)
                        # host numpy: the transfer rides the tail call
                        # (jnp.asarray here would be an extra dispatch)
                        t_pairs = np.asarray(
                            [[times[i], times[i + 1]]
                             for i in range(cfg.plms_steps)], np.float32)
                        img = tail(s_params, k_loop, img, hist,
                                   np.int32(1), np.int32(n_steps),
                                   t_pairs, cond)
                params, opt_state, floss = fusion_back_fused(
                    vc, params, opt_state, cam_f, img, weight, k_r,
                    models.vae_vars, bitfield)
                return params, opt_state, rng, loss, floss

    @jax.jit
    def occ_density_fn(params, pts):
        sigma, _ = ngp_model.apply({"params": params}, pts)
        return sigma

    host_rng = np.random.RandomState(17)
    losses, fusion_losses_log = [], []
    pending, pending_f = [], []   # device scalars awaiting a bulk fetch
    iter_times = []
    sync_times = []               # (itr, wall) at each loss-fetch sync
    fetch_every = max(1, int(cfg.loss_fetch_every))

    def _drain_pending(itr):
        # one bulk device_get for up to 2*fetch_every scalars — the
        # per-iter float() fetch it replaces serialized the dispatch
        # pipeline with one host<->device round trip per iteration
        if pending:
            losses.extend(float(v) for v in jax.device_get(pending))
            pending.clear()
        if pending_f:
            fusion_losses_log.extend(
                float(v) for v in jax.device_get(pending_f))
            pending_f.clear()
        sync_times.append((itr, time.time()))

    t0 = time.time()
    for itr in range(cfg.max_itr):
        vc = active_vcfg(itr)

        # occupancy maintenance (cuda_ray-path equivalent,
        # distillation.py:181-182) — its rng split comes FIRST so the
        # fused and unfused paths consume identical key streams
        if (cfg.use_occupancy and itr >= cfg.occupancy_start
                and (itr - cfg.occupancy_start)
                % cfg.occupancy_update_every == 0):
            rng, k_occ = jax.random.split(rng)
            occ_grid.update(
                lambda pts: occ_density_fn(ngp_params, pts), k_occ)
            bitfield = occ_grid.bitfield

        bi = input_idx[host_rng.randint(len(input_idx))]
        cam = get_camera_slice(scene_vox, [bi])
        gt_rgb = scene_rgb[bi]
        gt_mask = scene_mask[bi] if scene_mask is not None else None

        floss = None
        ci = mt = cam_f = None
        if use_diffusion:
            ci = int(host_rng.randint(n_cache))
            mt = min(float(host_rng.uniform()), 0.99)
            cam_f = feature_cache["cameras_vox"][ci]

        if use_fused:
            # one (bootstrap) / four (fusion) dispatches per iteration;
            # the split3 below rides inside the fused programs
            if not use_diffusion:
                ngp_params, opt_state, rng, loss = input_iter_fused(
                    vc, ngp_params, opt_state, rng, cam, gt_rgb, gt_mask,
                    bitfield)
            elif itr > cfg.start_fusion_step:
                ngp_params, opt_state, rng, loss, floss = \
                    fused_fusion_iter(
                        vc, ngp_params, opt_state, rng, cam, gt_rgb,
                        gt_mask, cam_f, ci, mt, bitfield)
            else:
                ngp_params, opt_state, rng, loss, floss = boot_iter_fused(
                    vc, ngp_params, opt_state, rng, cam, gt_rgb, gt_mask,
                    cam_f, feature_cache["eft_images"], np.int32(ci),
                    bitfield)
        else:
            rng, k1, k2 = jax.random.split(rng, 3)
            ngp_params, opt_state, loss = input_step(
                vc, ngp_params, opt_state, cam, gt_rgb, gt_mask, k1,
                bitfield)
            if use_diffusion:
                if itr > cfg.start_fusion_step:
                    ngp_params, opt_state, floss = fusion_step(
                        vc, ngp_params, opt_state, cam_f,
                        feature_cache["features"][ci], k2, bitfield,
                        max_thres=mt)
                else:
                    ngp_params, opt_state, floss = bootstrap_step(
                        vc, ngp_params, opt_state, cam_f,
                        feature_cache["eft_images"][ci], k2, bitfield)

        # keep loss handles; fetch in bulk every fetch_every iterations
        pending.append(loss)
        if floss is not None:
            pending_f.append(floss)
        if (itr + 1) % fetch_every == 0 or itr == cfg.max_itr - 1:
            _drain_pending(itr)

        iter_times.append(time.time())
        if verbose and itr % 200 == 0 and losses:
            print(f"itr {itr:5d} loss {losses[-1]:.4f} "
                  f"({(itr + 1) / (time.time() - t0):.2f} it/s)")

        # intermediate loss plots + render dump (distillation.py:355-388)
        if (cfg.eval_every > 0 and save_dir is not None
                and itr % cfg.eval_every == 0 and itr > 0):
            _drain_pending(itr)
            _save_intermediate(save_dir, scene.sequence_name, losses,
                               fusion_losses_log)

    # ---- Phase C: eval (distillation.py:391-497) -------------------------
    # evaluate with the mode the field was trained under at the end
    # (single-pass march when occupancy marching is active)
    vcfg_eval = active_vcfg(cfg.max_itr)

    # all scene views render in ONE jitted lax.map program + one bulk
    # fetch, like the orbit below — a per-camera host loop pays a relay
    # dispatch + fetch round trip per view (distillation.py:391-457
    # iterates on the host; on TPU that's free seconds per scene)
    n_eval = len(scene_vox)

    @jax.jit
    def eval_render_views(params, cams, keys, bitfield):
        def one(i):
            return _render_cam(ngp_model, params,
                               get_camera_slice(cams, i[None]),
                               image_size, vcfg_eval, keys[i],
                               perturb=True, near_far_fn=make_nff(bitfield))

        return jax.lax.map(one, jnp.arange(n_eval))

    rng, k_eval = jax.random.split(rng)
    imgs_d, sils_d = eval_render_views(
        ngp_params, scene_vox, jax.random.split(k_eval, n_eval), bitfield)
    metrics = {"psnr": [], "ssim": []}
    if lpips_fn is not None:
        # per-scene LPIPS column, matching distillation.py:428-443 —
        # one batched call over all views
        metrics["lpips"] = [
            float(v) for v in np.asarray(
                jax.jit(lpips_fn)(imgs_d, scene_rgb))]
    renders = list(np.asarray(imgs_d))
    sils = list(np.asarray(sils_d))
    for ci in range(n_eval):
        gt = np.asarray(scene_rgb[ci])
        metrics["psnr"].append(psnr(renders[ci], gt))
        metrics["ssim"].append(ssim(renders[ci], gt))

    summary = {k: float(np.mean(v)) for k, v in metrics.items()}
    if verbose:
        print("warning: this metric is used for debugging only and not the "
              "final metric")
        extra = (f" lpips: {summary['lpips']:.3f}"
                 if "lpips" in summary else "")
        print(f"scene {scene.sequence_name} psnr: {summary['psnr']:.2f} "
              f"ssim: {summary['ssim']:.3f}{extra}")

    # circle-path orbit renders (distillation.py:460-491) — all 50 cams
    # in ONE jitted lax.map program + one bulk fetch (a per-camera host
    # loop pays a relay dispatch + ~1 MB fetch round trip each)
    circle_cams = get_interpolated_path(scene_vox, n=cfg.n_aug_cameras)
    n_circle = len(circle_cams)

    @jax.jit
    def eval_render_orbit(params, cams, keys, bitfield):
        def one(i):
            img, sil = _render_cam(ngp_model, params,
                                   get_camera_slice(cams, i[None]),
                                   image_size, vcfg_eval, keys[i],
                                   perturb=True,
                                   near_far_fn=make_nff(bitfield))
            return img, sil

        return jax.lax.map(one, jnp.arange(n_circle))

    rng, k_orbit = jax.random.split(rng)
    c_imgs, c_sils = eval_render_orbit(
        ngp_params, circle_cams, jax.random.split(k_orbit, n_circle),
        bitfield)
    c_imgs, c_sils = np.asarray(c_imgs), np.asarray(c_sils)
    circle_renders = [
        np.hstack([c_imgs[i], np.repeat(c_sils[i], 3, axis=-1)])
        for i in range(n_circle)
    ]

    result = {
        "ngp_params": ngp_params,
        "renders": np.stack(renders),
        "silhouettes": np.stack(sils),
        "circle_renders": np.stack(circle_renders),
        "metrics": summary,
        "losses": losses,
        "fusion_losses": fusion_losses_log,
        # host wall-clock at the end of each iteration; NOTE: the host
        # only synchronizes with the device at loss-fetch boundaries
        # (every cfg.loss_fetch_every iters), so per-iter diffs are
        # dispatch times — use ``sync_times`` (itr, wall) pairs for
        # physical per-iteration timing
        "iter_times": iter_times,
        "sync_times": sync_times,
    }

    if save_dir is not None:
        _save_outputs(result, scene, feature_cache, save_dir, verbose)
    return result


def _save_intermediate(save_dir: str, seq: str, losses, fusion_losses):
    os.makedirs(f"{save_dir}/log", exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(losses, linewidth=1, label="volumetric")
        plt.legend(loc="upper right")
        plt.savefig(f"{save_dir}/log/{seq}_loss.jpg")
        plt.cla()
        plt.close()
        if fusion_losses:
            plt.plot(fusion_losses, linewidth=1)
            plt.savefig(f"{save_dir}/log/{seq}_fusionloss.jpg")
            plt.cla()
            plt.close()
    except ImportError:
        pass


def _save_outputs(result, scene: SceneData, feature_cache, save_dir: str,
                  verbose: bool):
    """gif + metrics txt + params (output tree mirrors demo.py:24-29)."""
    import imageio

    seq = scene.sequence_name or "scene"
    os.makedirs(f"{save_dir}/render_gifs", exist_ok=True)
    os.makedirs(f"{save_dir}/render_imgs/{seq}", exist_ok=True)
    os.makedirs(f"{save_dir}/metrics", exist_ok=True)
    os.makedirs(f"{save_dir}/log", exist_ok=True)

    gif_path = f"{save_dir}/render_gifs/{seq}.gif"
    with imageio.get_writer(gif_path, mode="I", duration=0.2) as writer:
        for i in range(len(result["renders"])):
            row = [scene.images[i], result["renders"][i],
                   np.repeat(result["silhouettes"][i], 3, axis=-1)]
            if feature_cache is not None:
                row.insert(1, np.asarray(feature_cache["eft_images"][i]))
            writer.append_data(to_uint8(np.hstack(row)))
            imageio.imwrite(
                f"{save_dir}/render_imgs/{seq}/{i:03d}.jpg",
                to_uint8(np.hstack([scene.images[i], result["renders"][i]])))

    if "circle_renders" in result and len(result["circle_renders"]):
        circle_path = f"{save_dir}/render_gifs/{seq}_circle.gif"
        with imageio.get_writer(circle_path, mode="I",
                                duration=0.2) as writer:
            for frame in result["circle_renders"]:
                writer.append_data(to_uint8(frame))

    with open(f"{save_dir}/metrics/{seq}.txt", "w") as fp:
        fp.write("warning: this metric is used for debugging only and not "
                 "the final metric\n")
        fp.write(json.dumps(result["metrics"], indent=2))

    flat = jax.tree_util.tree_map(np.asarray, result["ngp_params"])
    np.savez(f"{save_dir}/{seq}_ngp.npz",
             **{"/".join(map(str, k)): v for k, v in
                _flatten_dict(flat).items()})
    if verbose:
        print("saved", gif_path)


def _flatten_dict(d, prefix=()):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten_dict(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out
