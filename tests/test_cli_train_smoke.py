"""Train CLI end-to-end smoke (tiny preset, synthetic data, CPU mesh)."""
import os

import pytest


@pytest.mark.slow
def test_train_cli_tiny_smoke(tmp_path):
    from sparsefusion_tpu.cli import train as train_cli

    exp_dir = str(tmp_path / "train_out")
    train_cli.main([
        "-c", "any", "-d", "synthetic", "--preset", "tiny",
        "--steps", "3", "--image_size", "64", "--context_size", "2",
        "--diffusion_batch_size", "2", "--save_itr", "2", "--vis_itr", "0",
        "--exp_dir", exp_dir,
    ])
    # checkpoints written at step 2 and at the end
    final = os.path.join(exp_dir, "sf", "any", "ckpt_latest")
    assert os.path.exists(final)

    # resume from the checkpoint (exercises restore path)
    train_cli.main([
        "-c", "any", "-d", "synthetic", "--preset", "tiny",
        "--steps", "4", "--image_size", "64", "--context_size", "2",
        "--diffusion_batch_size", "2", "--save_itr", "100", "--vis_itr", "0",
        "--exp_dir", exp_dir, "--resume", final,
    ])
