from detection_3d_tpu.ops.geometry import (
    limit_period,
    limit_yaw,
    standard_to_yx_zb,
    yx_zb_to_standard,
    rbbox_corners_2d,
    box3d_corners,
)
from detection_3d_tpu.ops.box_coder import BoxCoder3D, second_box_encode, second_box_decode
from detection_3d_tpu.ops.rotated_iou import (
    rotated_iou_pair,
    rotated_iou_matrix,
    boxes_iou_3d,
)
from detection_3d_tpu.ops.nms import nms_boxes, nms_from_iou, rotate_nms_3d
