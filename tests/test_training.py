"""Training-step tests: single device and 8-device virtual mesh DP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.data.synthetic import make_synthetic_scene
from sparsefusion_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch,
    shard_scene_list,
)
from sparsefusion_tpu.train.trainer import (
    TrainConfig,
    make_optimizers,
    make_train_step,
    prepare_scene_batch,
)
from tests.test_distillation import tiny_models


def make_batch(models, n_scenes, image_size=64, context_size=2):
    scenes = [make_synthetic_scene(n_views=5, image_size=image_size, seed=s)
              for s in range(n_scenes)]
    query = [0] * n_scenes
    ctx = [[1, 2][:context_size] for _ in range(n_scenes)]
    return prepare_scene_batch(scenes, query, ctx)


def make_state(models, cfg, tx, eft_tx):
    return {
        "unet_params": models.unet_params,
        "eft_params": models.eft_vars["params"],
        "opt_state": tx.init(models.unet_params),
        "eft_opt_state": eft_tx.init(models.eft_vars["params"]),
    }


@pytest.mark.slow
def test_train_step_decreases_loss():
    models = tiny_models()
    cfg = TrainConfig(latent_size=8, context_size=2, train_eft=True,
                      diffusion_batch_size=2, lr=1e-3, eft_lr=1e-4)
    tx, eft_tx = make_optimizers(cfg)
    step_fn = make_train_step(models, cfg, tx, eft_tx)
    state = make_state(models, cfg, tx, eft_tx)
    batch = make_batch(models, 1)

    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(12):
        rng, k = jax.random.split(rng)
        state, aux = step_fn(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


@pytest.mark.slow
def test_train_step_data_parallel_8dev():
    """Same step on an 8-device mesh: batch sharded, params replicated."""
    assert len(jax.devices()) == 8
    models = tiny_models()
    cfg = TrainConfig(latent_size=8, context_size=2, train_eft=False,
                      diffusion_batch_size=2)
    tx, eft_tx = make_optimizers(cfg)
    mesh = make_mesh()
    step_fn = make_train_step(models, cfg, tx, eft_tx, mesh=mesh)
    state = {
        "unet_params": models.unet_params,
        "eft_params": models.eft_vars["params"],
        "opt_state": tx.init(models.unet_params),
        "eft_opt_state": None,
    }
    state = replicate_to_mesh(state, mesh)
    batch = shard_batch(make_batch(models, 8), mesh)

    state, aux = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    # params stay replicated after the update
    leaf = jax.tree_util.tree_leaves(state["unet_params"])[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_train_step_bf16_compute():
    """bf16 UNet activations: f32 master params/grads, loss near f32.

    The TPU mixed-precision recipe (TrainConfig.compute_dtype): the
    parameter tree, optimizer state, and loss math stay f32; only the
    UNet's activations/weight reads are bf16.  The first-step loss must
    agree with the f32 step to bf16 rounding (same rng -> same noise,
    eps-pred differs only by activation rounding).
    """
    models = tiny_models()
    kw = dict(latent_size=8, context_size=2, train_eft=True,
              diffusion_batch_size=2)
    tx, eft_tx = make_optimizers(TrainConfig(**kw))
    batch = make_batch(models, 1)
    k = jax.random.PRNGKey(3)

    losses = {}
    for dt in ("float32", "bfloat16"):
        cfg = TrainConfig(compute_dtype=dt, **kw)
        step_fn = make_train_step(models, cfg, tx, eft_tx)
        # the step donates its state; copy the leaves so the second
        # dtype's state isn't built from already-donated buffers
        state = jax.tree_util.tree_map(
            jnp.copy, make_state(models, cfg, tx, eft_tx))
        new_state, aux = step_fn(state, batch, k)
        losses[dt] = float(aux["loss"])
        # master params stay f32 after the update
        for leaf in jax.tree_util.tree_leaves(new_state["unet_params"]):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(losses["bfloat16"])
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.05 * (
        abs(losses["float32"]) + 1e-3)


def test_shard_scene_list():
    assert shard_scene_list(range(10), 4, 0) == [0, 1, 2]
    assert shard_scene_list(range(10), 4, 3) == [8, 9]
    all_shards = sum((shard_scene_list(range(10), 4, i) for i in range(4)),
                    [])
    assert all_shards == list(range(10))


@pytest.mark.slow
def test_nonfinite_guard_skips_update():
    """A NaN batch must skip the update, not corrupt params — forever.

    TPU analogue of the reference's per-sequence backward try/except +
    continue (``train.py:426-432``): ``zero_if_not_finite`` drops the
    non-finite update and counts it in the optimizer state.  Unlike
    ``optax.apply_if_finite`` it must NOT "give up" and apply a NaN
    update after K consecutive bad batches (ADVICE round 2).
    """
    from sparsefusion_tpu.train.trainer import notfinite_count

    models = tiny_models()
    cfg = TrainConfig(latent_size=8, context_size=2, train_eft=False,
                      diffusion_batch_size=2)
    tx, eft_tx = make_optimizers(cfg)
    step_fn = make_train_step(models, cfg, tx, eft_tx)
    state = {
        "unet_params": models.unet_params,
        "eft_params": models.eft_vars["params"],
        "opt_state": tx.init(models.unet_params),
        "eft_opt_state": None,
    }
    bad = make_batch(models, 1)
    bad["query_rgb"] = bad["query_rgb"].at[..., 0].set(jnp.nan)

    before = jax.device_get(state["unet_params"])
    # 7 consecutive bad batches — more than apply_if_finite's old K=5
    # give-up threshold; params must stay bit-identical throughout
    for i in range(7):
        state, aux = step_fn(state, bad, jax.random.PRNGKey(i))
    after = jax.device_get(state["unet_params"])

    assert notfinite_count(state["opt_state"]) == 7
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), before, after)

    # and a clean batch afterwards still applies normally
    good = make_batch(models, 1)
    state, aux = step_fn(state, good, jax.random.PRNGKey(7))
    assert np.isfinite(float(aux["loss"]))
    assert notfinite_count(state["opt_state"]) == 7
    after2 = jax.device_get(state["unet_params"])
    changed = any(
        not np.array_equal(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(after),
            jax.tree_util.tree_leaves(after2)))
    assert changed, "clean batch after NaN streak must still update"
