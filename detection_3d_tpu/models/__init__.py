from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
