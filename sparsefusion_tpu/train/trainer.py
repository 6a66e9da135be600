"""VLDM (+ joint EFT) training: jitted, mesh-data-parallel train step.

Re-design of ``train.py:258-463`` for TPU:

* one jitted ``train_step`` covers: EFT light-field render of the query
  view (32x32 rgb+features), frozen-VAE latent encode, diffusion-batch
  expansion (x12), valid-region loss masking, the DDPM eps-loss with p2
  weighting, the EFT huber color loss, and the optimizer update,
* data parallelism: the step is jitted with batches sharded over the
  mesh's ``data`` axis and parameters replicated — the DDP all-reduce
  of ``train.py:275`` becomes XLA-inserted collectives,
* the torch pattern "one scene per GPU per step" maps to a leading
  scene-batch dim vmapped inside the step (one scene per device).

Static shapes: context_size is fixed per compiled step (the reference
samples 2-6 per iteration, which would retrace; train at a few fixed
sizes round-robin to get the same coverage with <=4 compiles).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparsefusion_tpu.core.cameras import (
    Cameras,
    get_camera_slice,
    get_relative_cameras,
)
from sparsefusion_tpu.core.rays import grid_ray_bundle
from sparsefusion_tpu.data.contract import SceneData
from sparsefusion_tpu.models import SparseFusionModels
from sparsefusion_tpu.nn.eft import EpipolarFeatureTransformer
from sparsefusion_tpu.ops.image import grid_sample_bilinear, resize_bilinear
from sparsefusion_tpu.utils.image import huber


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 5e-5
    lr_decay_step: int = 50000
    lr_decay_gamma: float = 0.5
    diffusion_batch_size: int = 12
    context_size: int = 3
    train_eft: bool = True
    eft_lr: float = 5e-5
    latent_size: int = 32
    eft_n_pts: int = 20
    valid_thresh: float = 0.6
    # UNet activation dtype for the train step ("float32" | "bfloat16").
    # bfloat16 is the TPU mixed-precision recipe (the analogue of the
    # reference's fp16 autocast on A100): master params, optimizer
    # state, loss math, and gradients stay f32 — flax casts activations
    # and weight reads to bf16 inside the UNet, which runs its matmuls/
    # convs at the MXU's 2x bf16 rate.  At diffusion_batch_size 12 the
    # step is compute-bound (unlike the batch-1 sampler, PERF.md round
    # 2), so the per-use weight cast amortizes.  Combined with the
    # zero_if_not_finite guard below, a bad batch skips cleanly.
    compute_dtype: str = "float32"
    # Skip (rather than apply) updates whose grads contain non-finite
    # values — the TPU analogue of the reference's per-sequence backward
    # try/except + continue (``train.py:426-432``).  Unlike
    # ``optax.apply_if_finite`` (which "gives up" and APPLIES the update
    # after K consecutive non-finite batches, silently poisoning params),
    # :func:`zero_if_not_finite` never applies a bad update: it emits a
    # zero update, leaves the inner optimizer state untouched, and keeps
    # counting.  The count of skipped steps is surfaced from the
    # optimizer state by the CLI so persistent divergence is visible.
    guard_nonfinite: bool = True


@dataclasses.dataclass
class TrainState:
    unet_params: Any
    eft_vars: Any
    opt_state: Any
    eft_opt_state: Any
    step: int = 0


class ZeroIfNotFiniteState(NamedTuple):
    """State for :func:`zero_if_not_finite`.

    ``total_notfinite`` mirrors the field name of
    ``optax.ApplyIfFiniteState`` so :func:`notfinite_count` reads both.
    """

    total_notfinite: jnp.ndarray
    inner_state: Any


def zero_if_not_finite(inner: optax.GradientTransformation
                       ) -> optax.GradientTransformation:
    """Never apply a non-finite update (unlike ``optax.apply_if_finite``).

    When any gradient leaf contains NaN/inf the emitted update is all
    zeros and the inner optimizer state is left untouched — the exact
    analogue of the reference's try/except + ``continue`` around
    ``loss.backward()`` (``train.py:426-432``), which drops the batch
    entirely.  ``optax.apply_if_finite`` instead gives up after K
    consecutive bad batches and applies the poisoned update; this
    transformation keeps skipping (and counting) forever.
    """

    def init_fn(params):
        return ZeroIfNotFiniteState(jnp.zeros([], jnp.int32),
                                    inner.init(params))

    def update_fn(updates, state, params=None):
        is_finite = jnp.all(jnp.asarray([
            jnp.all(jnp.isfinite(u))
            for u in jax.tree_util.tree_leaves(updates)]))
        new_updates, new_inner = inner.update(updates, state.inner_state,
                                              params)
        # select, not cond: both arms are cheap elementwise ops and a
        # select keeps the step a single fused program on TPU
        out_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(is_finite, u, jnp.zeros_like(u)),
            new_updates)
        out_inner = jax.tree_util.tree_map(
            lambda n, o: jnp.where(is_finite, n, o),
            new_inner, state.inner_state)
        count = state.total_notfinite + jnp.where(is_finite, 0, 1)
        return out_updates, ZeroIfNotFiniteState(count, out_inner)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizers(cfg: TrainConfig):
    sched = optax.exponential_decay(
        cfg.lr, transition_steps=cfg.lr_decay_step,
        decay_rate=cfg.lr_decay_gamma, staircase=True)
    tx = optax.adam(sched)
    eft_sched = optax.exponential_decay(
        cfg.eft_lr, transition_steps=cfg.lr_decay_step,
        decay_rate=cfg.lr_decay_gamma, staircase=True)
    eft_tx = optax.adam(eft_sched)
    if cfg.guard_nonfinite:
        tx = zero_if_not_finite(tx)
        eft_tx = zero_if_not_finite(eft_tx)
    return tx, eft_tx


def notfinite_count(opt_state) -> int:
    """Total updates skipped by the non-finite guard (0 if unguarded)."""
    n = getattr(opt_state, "total_notfinite", None)
    return int(jax.device_get(n)) if n is not None else 0


def init_train_state(models: SparseFusionModels,
                     cfg: TrainConfig) -> Tuple[TrainState, Any, Any]:
    tx, eft_tx = make_optimizers(cfg)
    state = TrainState(
        unet_params=models.unet_params,
        eft_vars=models.eft_vars,
        opt_state=tx.init(models.unet_params),
        eft_opt_state=eft_tx.init(models.eft_vars["params"])
        if cfg.train_eft else None,
    )
    return state, tx, eft_tx


def prepare_scene_batch(scenes, query_idx, context_idx, rng=None):
    """Host-side: stack per-scene (query, context) selections into a batch.

    Args:
        scenes: list of SceneData (one per device slot).
        query_idx: list of int (one query frame per scene).
        context_idx: list of int-lists (context frames per scene, equal len).

    Returns:
        dict pytree with leading scene-batch dim.
    """
    q_rgb, q_valid, q_cam, c_rgb, c_cams = [], [], [], [], []
    for scene, qi, ci in zip(scenes, query_idx, context_idx):
        cams = scene.cameras()
        rel = get_relative_cameras(cams, [qi], center_at_origin=False)
        q_cam.append(get_camera_slice(rel, [qi]))
        c_cams.append(get_camera_slice(rel, list(ci)))
        q_rgb.append(scene.images[qi])
        q_valid.append(scene.valid_region[qi])
        c_rgb.append(scene.images[list(ci)])
    stack = lambda xs: jnp.asarray(np.stack(xs))
    cam_stack = lambda cs: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *cs)
    return {
        "query_rgb": stack(q_rgb),          # (B, H, W, 3)
        "query_valid": stack(q_valid),      # (B, H, W, 1)
        "query_cam": cam_stack(q_cam),      # Cameras with (B, 1, ...) leaves
        "context_rgb": stack(c_rgb),        # (B, NC, H, W, 3)
        "context_cams": cam_stack(c_cams),  # Cameras with (B, NC, ...)
    }


def scene_depth_range_from_cam(cameras: Cameras):
    """Per-scene near/far from mean camera distance (train.py:348-351)."""
    centers = -jnp.einsum("ni,nij->nj", cameras.T, cameras.R)
    dist = jnp.mean(jnp.linalg.norm(centers, axis=-1))
    return dist - 5.0, dist + 5.0


def make_train_step(models: SparseFusionModels, cfg: TrainConfig, tx,
                    eft_tx=None, mesh=None):
    """Build the jitted (optionally mesh-sharded) train step."""
    ddpm = models.ddpm
    latent_hw = cfg.latent_size
    unet_model = models.unet_model
    if cfg.compute_dtype == "bfloat16":
        from sparsefusion_tpu.nn.unet import EfficientUNet

        unet_model = EfficientUNet(models.unet_model.config,
                                   dtype=jnp.bfloat16)

    def per_scene_loss(unet_params, eft_params, batch_slice, rng):
        q_cam: Cameras = batch_slice["query_cam"]
        c_cams: Cameras = batch_slice["context_cams"]
        q_rgb = batch_slice["query_rgb"]
        q_valid = batch_slice["query_valid"]
        c_rgb = batch_slice["context_rgb"]

        eft_vars = {**models.eft_vars, "params": eft_params}

        # per-sequence depth range from the *relative* context cameras
        all_cams = c_cams  # scene cams proxy: context set
        min_d, max_d = scene_depth_range_from_cam(all_cams)

        # ---- EFT render of the query view at latent res ----------------
        latent = models.eft_model.apply(
            eft_vars, c_rgb, method=EpipolarFeatureTransformer.encode)
        bundle = grid_ray_bundle(q_cam, latent_hw, latent_hw,
                                 cfg.eft_n_pts, min_d, max_d)
        o = bundle.origins.reshape(-1, 3)
        d = bundle.directions.reshape(-1, 3)
        l = bundle.lengths.reshape(-1, cfg.eft_n_pts)
        rgb, feat = models.eft_model.apply(
            eft_vars, o, d, l, c_cams, c_rgb, latent)
        rgb = rgb.reshape(latent_hw, latent_hw, 3)
        feat = feat.reshape(latent_hw, latent_hw, -1)

        if not cfg.train_eft:
            rgb = jax.lax.stop_gradient(rgb)
            feat = jax.lax.stop_gradient(feat)

        # ---- latents + loss mask ---------------------------------------
        z = models.vae_encode(q_rgb[None])           # (1, 32, 32, 4)
        z = jax.lax.stop_gradient(z)
        dbs = cfg.diffusion_batch_size
        z_b = jnp.broadcast_to(z, (dbs, *z.shape[1:]))
        feat_b = jnp.broadcast_to(feat[None], (dbs, *feat.shape))

        mask = resize_bilinear(q_valid[None], (latent_hw, latent_hw))[0]
        mask = (mask > cfg.valid_thresh).astype(jnp.float32)
        loss_mask = jnp.broadcast_to(mask[None], (dbs, latent_hw,
                                                  latent_hw, 1))

        k_t, k_loss = jax.random.split(rng)
        times = ddpm.schedule.sample_random_times(k_t, dbs)

        def denoise(x, log_snr, cond, keep):
            # upcast so the eps loss is f32 regardless of compute_dtype
            return unet_model.apply(
                {"params": unet_params}, x, log_snr, cond,
                keep).astype(jnp.float32)

        d_loss = ddpm.p_losses(denoise, z_b, times, k_loss,
                               cond_images=feat_b, loss_mask=loss_mask)

        color_loss = 0.0
        if cfg.train_eft:
            # gt colors at the ray xys (sample_images_at_mc_locs semantics)
            xys = bundle.xys.reshape(1, -1, 2)
            gt_colors = grid_sample_bilinear(q_rgb[None], -xys)
            gt_colors = gt_colors.reshape(latent_hw, latent_hw, 3)
            c_err = huber(rgb, gt_colors) * mask
            color_loss = jnp.mean(jnp.abs(c_err))

        return d_loss + color_loss, {"d_loss": d_loss,
                                     "color_loss": color_loss}

    def batch_loss(unet_params, eft_params, batch, rng):
        b = batch["query_rgb"].shape[0]
        rngs = jax.random.split(rng, b)
        losses, aux = jax.vmap(
            per_scene_loss, in_axes=(None, None, 0, 0))(
                unet_params, eft_params, batch, rngs)
        return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, aux)

    def train_step(state: Dict, batch, rng):
        unet_params = state["unet_params"]
        eft_params = state["eft_params"]
        if cfg.train_eft:
            (loss, aux), (g_unet, g_eft) = jax.value_and_grad(
                batch_loss, argnums=(0, 1), has_aux=True)(
                    unet_params, eft_params, batch, rng)
        else:
            (loss, aux), g_unet = jax.value_and_grad(
                batch_loss, has_aux=True)(unet_params, eft_params, batch,
                                          rng)
            g_eft = None

        updates, opt_state = tx.update(g_unet, state["opt_state"],
                                       unet_params)
        unet_params = optax.apply_updates(unet_params, updates)
        new_state = {**state, "unet_params": unet_params,
                     "opt_state": opt_state}
        if cfg.train_eft:
            eupd, eopt = eft_tx.update(g_eft, state["eft_opt_state"],
                                       eft_params)
            new_state["eft_params"] = optax.apply_updates(eft_params, eupd)
            new_state["eft_opt_state"] = eopt
        return new_state, {"loss": loss, **aux}

    # state is DONATED: without it the params + two Adam states are
    # double-buffered across the update, which alone is ~2x the resident
    # footprint of the dim-256 SF config and OOMs a 16 GB v5e at
    # diffusion_batch_size 12.  Donation is honored on CPU too — callers
    # must treat the passed-in state as consumed (rebind: ``state, aux =
    # step_fn(state, ...)``) and never feed a stepped-in state, or the
    # model bundle's original param arrays, to another step
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("data"))
        # params/opt-state replicated, batch sharded on the data axis;
        # XLA derives the gradient all-reduce from this placement.
        return jax.jit(train_step,
                       in_shardings=(repl, shard, repl),
                       out_shardings=(repl, repl),
                       donate_argnums=0)
    return jax.jit(train_step, donate_argnums=0)
