from detection_3d_tpu.parallel.mesh import (
    make_mesh, batched_train_step, all_gather_results,
)
