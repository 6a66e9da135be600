"""Native checkpoint save/restore roundtrip (orbax)."""
import numpy as np

import jax
import jax.numpy as jnp

from sparsefusion_tpu.train.checkpoints import (
    restore_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "step": 42,
        "params": {
            "dense": {"kernel": jnp.arange(12.0).reshape(3, 4),
                      "bias": jnp.zeros(4)},
        },
        "opt_state": {"mu": jnp.ones((3, 4)) * 0.5},
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    restored = restore_checkpoint(path)
    assert int(restored["step"]) == 42
    np.testing.assert_allclose(restored["params"]["dense"]["kernel"],
                               np.arange(12.0).reshape(3, 4))
    np.testing.assert_allclose(restored["opt_state"]["mu"],
                               np.full((3, 4), 0.5))


def test_checkpoint_overwrite(tmp_path):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"v": jnp.asarray(1.0)})
    save_checkpoint(path, {"v": jnp.asarray(2.0)})
    assert float(restore_checkpoint(path)["v"]) == 2.0
