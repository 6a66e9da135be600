"""Training visualization grid smoke test (tiny models)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparsefusion_tpu.core.cameras import get_camera_slice, get_relative_cameras
from sparsefusion_tpu.data.synthetic import make_synthetic_scene
from sparsefusion_tpu.train.visualize import save_visualization
from tests.test_distillation import tiny_models


@pytest.mark.slow
def test_save_visualization(tmp_path):
    models = tiny_models()
    scene = make_synthetic_scene(n_views=4, image_size=64, seed=0)
    cams = scene.cameras()
    rel = get_relative_cameras(cams, [0])
    centers = -np.einsum("ni,nij->nj", np.asarray(rel.T), np.asarray(rel.R))
    dist = float(np.mean(np.linalg.norm(centers, axis=1)))

    out = str(tmp_path / "vis.jpg")
    grid = save_visualization(
        models, models.unet_params, models.eft_vars["params"],
        get_camera_slice(rel, [0]), jnp.asarray(scene.images[0]),
        get_camera_slice(rel, [1, 2]), jnp.asarray(scene.images[[1, 2]]),
        dist - 5.0, dist + 5.0, out, jax.random.PRNGKey(0),
        latent_hw=8, sample_timesteps=4)
    assert (tmp_path / "vis.jpg").exists()
    # grid: 2 context + gt + eft + sample = 5 panels wide
    assert grid.shape == (64, 64 * 5, 3)
    assert np.all(np.isfinite(grid))
