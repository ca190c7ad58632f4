from detection_3d_tpu.ops.pallas.rotated_iou_kernel import (
    rotated_iou_matrix_pallas,
)
