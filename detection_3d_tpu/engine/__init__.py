from detection_3d_tpu.engine.solver import (
    make_optimizer, warmup_multistep_schedule,
)
from detection_3d_tpu.engine.trainer import Trainer, TrainState
from detection_3d_tpu.engine.inference import run_inference
