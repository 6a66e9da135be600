from sparsefusion_tpu.distill.loop import DistillConfig, distillation_loop
