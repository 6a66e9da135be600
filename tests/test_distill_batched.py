"""Scene-batched distillation: vmapped-step parity + end-to-end smoke.

The batched loop (``distill/batched.py``) vmaps the SAME pure step
functions the sequential loop jits (``make_scene_step_fns``), so a
stacked batched step must match S independent per-scene steps exactly;
the end-to-end tests drive all three phases (bootstrap, fusion,
occupancy) for S=2 scenes in lockstep.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.core.cameras import get_camera_slice, get_relative_cameras
from sparsefusion_tpu.data.synthetic import make_synthetic_scene
from sparsefusion_tpu.distill.batched import batched_distillation_loop
from sparsefusion_tpu.distill.loop import (
    DistillConfig,
    make_ngp_optimizer,
    make_scene_step_fns,
    tpu_distill_config,
)
from sparsefusion_tpu.nn.ngp import NGPConfig, NGPField
from sparsefusion_tpu.render.volume import VolumeRendererConfig
from tests.test_distillation import tiny_models


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def test_vmapped_input_step_matches_per_scene():
    """vmap(input_step) over stacked scenes == per-scene input_step."""
    cfg = DistillConfig(num_steps=8, upsample_steps=8, max_ray_batch=256,
                        ngp=NGPConfig(num_levels=4, log2_hashmap_size=10))
    render_hw = 16
    ngp_model = NGPField(cfg.ngp)
    tx = make_ngp_optimizer(cfg)
    steps = make_scene_step_fns(ngp_model, cfg, tx, render_hw, 32)
    vcfg = VolumeRendererConfig(num_steps=8, upsample_steps=8,
                                bound=cfg.bound, min_near=cfg.min_near,
                                max_ray_batch=256)

    scenes = [make_synthetic_scene(n_views=2, image_size=32, seed=s)
              for s in (0, 3)]
    params_l, opt_l, cam_l, rgb_l, mask_l, key_l, bf_l = \
        [], [], [], [], [], [], []
    for s, scene in enumerate(scenes):
        p = ngp_model.init(jax.random.PRNGKey(s), jnp.zeros((8, 3)))["params"]
        params_l.append(p)
        opt_l.append(tx.init(p))
        vox = get_relative_cameras(scene.cameras(), [0],
                                   center_at_origin=False)
        cam_l.append(get_camera_slice(vox, [0]))
        rgb_l.append(jnp.asarray(scene.images[0]))
        mask_l.append(jnp.asarray(scene.masks[0]))
        key_l.append(jax.random.PRNGKey(100 + s))
        bf_l.append(jnp.zeros((8,), jnp.uint8))

    # per-scene reference
    ref = [steps.input_step(vcfg, params_l[s], opt_l[s], cam_l[s],
                            rgb_l[s], mask_l[s], key_l[s], bf_l[s])
           for s in range(2)]

    # stacked + vmapped
    out = jax.vmap(partial(steps.input_step, vcfg))(
        _stack(params_l), _stack(opt_l), _stack(cam_l),
        jnp.stack(rgb_l), jnp.stack(mask_l), jnp.stack(key_l),
        jnp.stack(bf_l))

    for s in range(2):
        jax.tree_util.tree_map(
            lambda a, b, s=s: np.testing.assert_allclose(
                np.asarray(a)[s], np.asarray(b), rtol=2e-5, atol=2e-6),
            (out[0], out[2]), (ref[s][0], ref[s][2]))


def test_vmapped_fusion_and_bootstrap_steps_match_per_scene():
    """The other two optimizer steps also vectorize exactly."""
    cfg = DistillConfig(num_steps=8, upsample_steps=8, max_ray_batch=256,
                        ngp=NGPConfig(num_levels=4, log2_hashmap_size=10))
    render_hw, image_size = 16, 32
    ngp_model = NGPField(cfg.ngp)
    tx = make_ngp_optimizer(cfg)
    steps = make_scene_step_fns(ngp_model, cfg, tx, render_hw, image_size)
    vcfg = VolumeRendererConfig(num_steps=8, upsample_steps=8,
                                bound=cfg.bound, min_near=cfg.min_near,
                                max_ray_batch=256)

    scenes = [make_synthetic_scene(n_views=2, image_size=32, seed=s)
              for s in (1, 6)]
    params_l, opt_l, cam_l, tgt_l, key_l, bf_l = [], [], [], [], [], []
    for s, scene in enumerate(scenes):
        p = ngp_model.init(jax.random.PRNGKey(s), jnp.zeros((8, 3)))["params"]
        params_l.append(p)
        opt_l.append(tx.init(p))
        vox = get_relative_cameras(scene.cameras(), [0],
                                   center_at_origin=False)
        cam_l.append(get_camera_slice(vox, [1]))
        tgt_l.append(jnp.asarray(scene.images[1]))
        key_l.append(jax.random.PRNGKey(200 + s))
        bf_l.append(jnp.zeros((8,), jnp.uint8))

    # bootstrap (EFT-image target)
    ref = [steps.bootstrap_step(vcfg, params_l[s], opt_l[s], cam_l[s],
                                tgt_l[s], key_l[s], bf_l[s])
           for s in range(2)]
    out = jax.vmap(partial(steps.bootstrap_step, vcfg))(
        _stack(params_l), _stack(opt_l), _stack(cam_l), jnp.stack(tgt_l),
        jnp.stack(key_l), jnp.stack(bf_l))
    for s in range(2):
        jax.tree_util.tree_map(
            lambda a, b, s=s: np.testing.assert_allclose(
                np.asarray(a)[s], np.asarray(b), rtol=2e-5, atol=2e-6),
            (out[0], out[2]), (ref[s][0], ref[s][2]))

    # fusion grad step (PLMS-prediction target + per-scene weight)
    w = jnp.asarray([0.7, 0.3])
    ref = [steps.fusion_grad_step(vcfg, params_l[s], opt_l[s], cam_l[s],
                                  tgt_l[s], w[s], key_l[s], bf_l[s])
           for s in range(2)]
    out = jax.vmap(partial(steps.fusion_grad_step, vcfg))(
        _stack(params_l), _stack(opt_l), _stack(cam_l), jnp.stack(tgt_l),
        w, jnp.stack(key_l), jnp.stack(bf_l))
    for s in range(2):
        jax.tree_util.tree_map(
            lambda a, b, s=s: np.testing.assert_allclose(
                np.asarray(a)[s], np.asarray(b), rtol=2e-5, atol=2e-6),
            (out[0], out[2]), (ref[s][0], ref[s][2]))


@pytest.mark.slow
def test_batched_photometric_learns():
    """S=2 lockstep photometric optimization fits both scenes."""
    models = tiny_models()
    scenes = [make_synthetic_scene(n_views=3, image_size=32, seed=s)
              for s in (2, 5)]
    cfg = DistillConfig(
        max_itr=150, start_fusion_step=10 ** 9, n_aug_cameras=2,
        num_steps=16, upsample_steps=16, max_ray_batch=256,
        ngp=NGPConfig(num_levels=6, log2_hashmap_size=12))
    outs = batched_distillation_loop(
        models, scenes, [[0, 1, 2], [0, 1, 2]], cfg,
        jax.random.PRNGKey(1), use_diffusion=False, verbose=False)
    assert len(outs) == 2
    for out in outs:
        assert np.mean(out["losses"][-10:]) < np.mean(out["losses"][:10])
        assert out["metrics"]["psnr"] > 14.0, out["metrics"]


@pytest.mark.slow
def test_batched_end_to_end_with_diffusion(tmp_path):
    """S=2 full pipeline: EFT caches, bootstrap, fusion, eval, saves."""
    models = tiny_models()
    scenes = [make_synthetic_scene(n_views=4, image_size=64, seed=s)
              for s in (0, 7)]
    cfg = DistillConfig(
        max_itr=4, start_fusion_step=2, n_aug_cameras=2,
        plms_steps=4, num_steps=8, upsample_steps=8, max_ray_batch=512,
        ngp=NGPConfig(num_levels=4, log2_hashmap_size=10))
    outs = batched_distillation_loop(
        models, scenes, [[0, 1], [0, 1]], cfg, jax.random.PRNGKey(1),
        save_dir=str(tmp_path), use_diffusion=True, verbose=False)
    assert len(outs) == 2
    for out, scene in zip(outs, scenes):
        assert out["renders"].shape == (4, 64, 64, 3)
        assert np.all(np.isfinite(out["renders"]))
        assert len(out["losses"]) == 4
        assert len(out["fusion_losses"]) == 4
        assert np.isfinite(out["metrics"]["psnr"])
        seq = scene.sequence_name
        assert (tmp_path / "render_gifs" / f"{seq}.gif").exists()
        assert (tmp_path / "metrics" / f"{seq}.txt").exists()


@pytest.mark.slow
def test_batched_occupancy_march():
    """S=2 with the TPU preset's occupancy marching path."""
    models = tiny_models()
    scenes = [make_synthetic_scene(n_views=3, image_size=32, seed=s)
              for s in (1, 4)]
    cfg = tpu_distill_config(
        max_itr=24, start_fusion_step=10 ** 9, n_aug_cameras=2,
        num_steps=8, upsample_steps=8, max_ray_batch=256,
        occupancy_start=8, occupancy_update_every=8,
        occ_march_steps=12, loss_fetch_every=7,
        ngp=NGPConfig(num_levels=4, level_dim=4, log2_hashmap_size=10))
    outs = batched_distillation_loop(
        models, scenes, [[0, 1], [0, 1]], cfg, jax.random.PRNGKey(0),
        use_diffusion=False, verbose=False)
    for out in outs:
        assert len(out["losses"]) == 24
        assert np.all(np.isfinite(out["losses"]))
        assert np.all(np.isfinite(out["renders"]))


def test_batched_rejects_ragged_scenes():
    models = None
    scenes = [make_synthetic_scene(n_views=3, image_size=32, seed=0),
              make_synthetic_scene(n_views=4, image_size=32, seed=1)]
    cfg = DistillConfig(max_itr=1)
    with pytest.raises(ValueError, match="equal image sizes and frame"):
        batched_distillation_loop(models, scenes, [[0, 1], [0, 1]], cfg,
                                  jax.random.PRNGKey(0),
                                  use_diffusion=False, verbose=False)


# ---- mesh mode: one scene per local device ------------------------------

def _mesh(n):
    from sparsefusion_tpu.parallel.mesh import make_mesh

    return make_mesh(jax.devices()[:n])


def test_mesh_sharded_input_step_partitions():
    """jit(vmap(input_step)) with the scene axis sharded over a 4-device
    mesh produces bit-identical results to the unsharded run AND its
    outputs stay sharded over the mesh (no hidden gather)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh(4)
    shard = NamedSharding(mesh, P("data"))
    cfg = DistillConfig(num_steps=8, upsample_steps=8, max_ray_batch=256,
                        ngp=NGPConfig(num_levels=4, log2_hashmap_size=10))
    render_hw = 16
    ngp_model = NGPField(cfg.ngp)
    tx = make_ngp_optimizer(cfg)
    steps = make_scene_step_fns(ngp_model, cfg, tx, render_hw, 32)
    vcfg = VolumeRendererConfig(num_steps=8, upsample_steps=8,
                                bound=cfg.bound, min_near=cfg.min_near,
                                max_ray_batch=256)

    params_l, opt_l, cam_l, rgb_l, mask_l, key_l, bf_l = \
        [], [], [], [], [], [], []
    for s in range(4):
        scene = make_synthetic_scene(n_views=2, image_size=32, seed=s)
        p = ngp_model.init(jax.random.PRNGKey(s),
                           jnp.zeros((8, 3)))["params"]
        params_l.append(p)
        opt_l.append(tx.init(p))
        vox = get_relative_cameras(scene.cameras(), [0],
                                   center_at_origin=False)
        cam_l.append(get_camera_slice(vox, [0]))
        rgb_l.append(jnp.asarray(scene.images[0]))
        mask_l.append(jnp.asarray(scene.masks[0]))
        key_l.append(jax.random.PRNGKey(100 + s))
        bf_l.append(jnp.zeros((8,), jnp.uint8))

    step_v = jax.jit(jax.vmap(partial(steps.input_step, vcfg)))
    args = (_stack(params_l), _stack(opt_l), _stack(cam_l),
            jnp.stack(rgb_l), jnp.stack(mask_l), jnp.stack(key_l),
            jnp.stack(bf_l))
    ref = step_v(*args)

    place = lambda t: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, shard), t)
    out = step_v(*[place(a) for a in args])

    # values identical (per-scene programs are independent — sharding
    # must not change any reduction order)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        (ref[0], ref[2]), (out[0], out[2]))
    # outputs live sharded over all 4 devices
    loss_shard = out[2].sharding
    assert len(loss_shard.device_set) == 4, loss_shard
    assert not loss_shard.is_fully_replicated


@pytest.mark.slow
def test_mesh_batched_loop_matches_unsharded(tmp_path):
    """Full batched loop (EFT cache + bootstrap + fusion + eval) on a
    2-device mesh == the single-device batched loop, and an odd scene
    count pads/truncates correctly."""
    models = tiny_models()
    scenes = [make_synthetic_scene(n_views=4, image_size=64, seed=s)
              for s in (0, 7, 3)]
    idx = [[0, 1]] * 3
    cfg = DistillConfig(
        max_itr=4, start_fusion_step=2, n_aug_cameras=2,
        plms_steps=4, num_steps=8, upsample_steps=8, max_ray_batch=512,
        ngp=NGPConfig(num_levels=4, log2_hashmap_size=10))
    ref = batched_distillation_loop(
        models, scenes, idx, cfg, jax.random.PRNGKey(1),
        use_diffusion=True, verbose=False)
    out = batched_distillation_loop(
        models, scenes, idx, cfg, jax.random.PRNGKey(1),
        use_diffusion=True, verbose=False, mesh=_mesh(2))
    assert len(ref) == len(out) == 3
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o["losses"], r["losses"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(o["fusion_losses"], r["fusion_losses"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(o["metrics"]["psnr"],
                                   r["metrics"]["psnr"], rtol=1e-3)


@pytest.mark.slow
def test_mesh_batched_occupancy_march():
    """The TPU preset's occupancy/march path also runs sharded."""
    models = tiny_models()
    scenes = [make_synthetic_scene(n_views=3, image_size=32, seed=s)
              for s in (1, 4)]
    cfg = tpu_distill_config(
        max_itr=16, start_fusion_step=10 ** 9, n_aug_cameras=2,
        num_steps=8, upsample_steps=8, max_ray_batch=256,
        occupancy_start=8, occupancy_update_every=8,
        occ_march_steps=12, loss_fetch_every=7,
        ngp=NGPConfig(num_levels=4, level_dim=4, log2_hashmap_size=10))
    ref = batched_distillation_loop(
        models, scenes, [[0, 1], [0, 1]], cfg, jax.random.PRNGKey(0),
        use_diffusion=False, verbose=False)
    out = batched_distillation_loop(
        models, scenes, [[0, 1], [0, 1]], cfg, jax.random.PRNGKey(0),
        use_diffusion=False, verbose=False, mesh=_mesh(2))
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o["losses"], r["losses"],
                                   rtol=1e-4, atol=1e-5)
        assert np.all(np.isfinite(o["renders"]))
