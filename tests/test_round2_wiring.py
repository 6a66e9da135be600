"""Round-2 wiring: bg-net compositing, LPIPS eval metrics, variable
context size, multi-host helpers, occupancy density_thresh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.nn.ngp import NGPConfig, NGPField
from sparsefusion_tpu.parallel.mesh import (
    maybe_init_distributed,
    shard_scene_list,
)
from sparsefusion_tpu.render.volume import (
    VolumeRendererConfig,
    render_rays,
    render_rays_chunked,
)


def test_bg_net_composited():
    """bg_radius > 0 must route low-opacity rays through the background
    net (``renderer_df.py:448-456``)."""
    cfg = NGPConfig(num_levels=4, log2_hashmap_size=10, bg_radius=32.0,
                    density_blob_scale=0.0)
    model = NGPField(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                        method=NGPField.init_all)["params"]
    assert "bg_net_0" in params

    field = lambda x: model.apply({"params": params}, x)
    bg_fn = lambda d: model.apply({"params": params}, d,
                                  method=NGPField.background)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -6.0]]), (4, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    vcfg = VolumeRendererConfig(num_steps=8, upsample_steps=0, bound=1.0)
    out_bg = render_rays(field, o, d, vcfg, jax.random.PRNGKey(1),
                         det_importance=True, bg_fn=bg_fn)
    out_black = render_rays(field, o, d, vcfg, jax.random.PRNGKey(1),
                            det_importance=True, bg_color=0.0)
    # near-empty field: bg color dominates and differs from black bg
    expected_bg = bg_fn(d)
    resid = (1.0 - out_bg["weights_sum"])[:, None]
    np.testing.assert_allclose(
        np.asarray(out_bg["image"] - out_black["image"]),
        np.asarray(resid * expected_bg), atol=1e-5)
    assert float(jnp.max(jnp.abs(out_bg["image"] - out_black["image"]))) > 0.01


def test_bg_fn_through_chunked_renderer():
    cfg = NGPConfig(num_levels=4, log2_hashmap_size=10, bg_radius=32.0)
    model = NGPField(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                        method=NGPField.init_all)["params"]
    field = lambda x: model.apply({"params": params}, x)
    bg_fn = lambda d: model.apply({"params": params}, d,
                                  method=NGPField.background)
    o = jnp.zeros((8, 3)) + jnp.asarray([0.0, 0.0, -3.0])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
    vcfg = VolumeRendererConfig(num_steps=4, upsample_steps=4, bound=1.0,
                                max_ray_batch=4)
    out = render_rays_chunked(field, o, d, vcfg, jax.random.PRNGKey(1),
                              bg_fn=bg_fn)
    assert out["image"].shape == (8, 3)
    assert np.all(np.isfinite(np.asarray(out["image"])))


def test_occupancy_uses_opt_density_thresh():
    """The occupancy grid threshold is the torch-ngp opt value
    (``distillation.py:513``), not the density-blob amplitude."""
    import inspect

    from sparsefusion_tpu.distill import loop as L

    src = inspect.getsource(L)
    assert "density_thresh=cfg.density_thresh" in src
    assert L.DistillConfig().density_thresh == 10.0


@pytest.mark.slow
def test_distillation_reports_lpips(tmp_path):
    from sparsefusion_tpu.data.synthetic import make_synthetic_scene
    from sparsefusion_tpu.distill.loop import (
        DistillConfig,
        distillation_loop,
    )
    from tests.test_distillation import tiny_models

    models = tiny_models()
    scene = make_synthetic_scene(n_views=3, image_size=64, seed=0)
    cfg = DistillConfig(
        max_itr=2, start_fusion_step=10 ** 9, n_aug_cameras=2,
        num_steps=8, upsample_steps=8, max_ray_batch=512,
        ngp=NGPConfig(num_levels=4, log2_hashmap_size=10))

    def fake_lpips(a, b):
        return jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))

    out = distillation_loop(models, scene, [0, 1], cfg,
                            jax.random.PRNGKey(1), save_dir=str(tmp_path),
                            use_diffusion=False, verbose=False,
                            lpips_fn=fake_lpips)
    assert "lpips" in out["metrics"]
    assert np.isfinite(out["metrics"]["lpips"])
    with open(tmp_path / "metrics" / "synthetic_000.txt") as fp:
        assert "lpips" in fp.read()


def test_shard_scene_list_multi_process():
    """Fake process-count sharding (reference split_list(val_list, gpus))."""
    idx = list(range(10))
    shards = [shard_scene_list(idx, 3, i) for i in range(3)]
    assert sorted(sum(shards, [])) == idx
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_maybe_init_distributed_noop(monkeypatch):
    for var in ("SF_COORDINATOR", "SF_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_init_distributed() is False


def test_variable_context_sizes_step(rng):
    """One step at several context sizes through the SAME step_fn (the
    reference samples 2-6 per iter, train.py:340-343)."""
    from sparsefusion_tpu.data.synthetic import make_synthetic_scene
    from sparsefusion_tpu.train.trainer import (
        TrainConfig,
        make_optimizers,
        make_train_step,
        prepare_scene_batch,
    )
    from tests.test_distillation import tiny_models

    models = tiny_models()
    cfg = TrainConfig(latent_size=8, context_size=3, train_eft=True,
                      diffusion_batch_size=2)
    tx, eft_tx = make_optimizers(cfg)
    step_fn = make_train_step(models, cfg, tx, eft_tx)
    state = {
        "unet_params": models.unet_params,
        "eft_params": models.eft_vars["params"],
        "opt_state": tx.init(models.unet_params),
        "eft_opt_state": eft_tx.init(models.eft_vars["params"]),
    }
    scenes = [make_synthetic_scene(n_views=6, image_size=64, seed=s)
              for s in range(2)]
    for cs in (2, 3):
        batch = prepare_scene_batch(scenes, [0, 1],
                                    [list(range(1, 1 + cs))] * 2)
        assert batch["context_rgb"].shape[1] == cs
        state, aux = step_fn(state, batch, jax.random.PRNGKey(cs))
        assert np.isfinite(float(aux["loss"]))
