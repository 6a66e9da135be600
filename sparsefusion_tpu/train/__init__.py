from sparsefusion_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    make_train_step,
    prepare_scene_batch,
)
