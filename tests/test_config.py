import numpy as np

from detection_3d_tpu.config import Config, load_yaml_config


def test_derived_anchor_strides_default_4c():
    cfg = Config()  # 9 scales, all stride (2,2,2), fpn [4,3,2], sel [1,3,4,5]
    strides = cfg.anchor_strides()
    # cumulative from top: top index 4 -> 2^4=16, 3 -> 32, 2 -> 64;
    # doubled [16,32,64,16,32,64]; selector [1,3,4,5] -> [32,16,32,64]
    assert [s[0] for s in strides] == [32, 16, 32, 64]


def test_rpn_map_sizes():
    cfg = Config()
    sizes = cfg.rpn_map_sizes()
    # full scale 4096,4096,512 / strides 16,32,64
    assert sizes[0] == (256, 256, 32)
    assert sizes[1] == (128, 128, 16)
    assert sizes[2] == (64, 64, 8)


def test_roi_spatial_scales():
    cfg = Config()
    np.testing.assert_allclose(cfg.roi_spatial_scales(), [1 / 16, 1 / 32])


def test_separate_class_rescale():
    cfg = Config(classes=("background", "wall", "door", "window", "ceiling",
                          "floor"),
                 separate_classes=(("wall",), ("ceiling", "floor")))
    assert cfg.group_num == 3
    # canonical SUNCG label order: wall=1, window=2, door=3, floor=4,
    # ceiling=5 (suncg_metas.py:2-3)
    assert cfg.separate_classes_id() == ((1,), (5, 4))
    assert cfg.ordered_class_names() == (
        "background", "wall", "window", "door", "floor", "ceiling")
    assert cfg.rpn_pre_nms_top_n_train == 1000  # 2000 * 1.5/3
    assert cfg.roi_batch_size_per_image == 256
    assert cfg.roi_detections_per_img == 100


def test_load_reference_yaml(tmp_path):
    # a miniature reference-style overlay
    y = tmp_path / "c.yaml"
    y.write_text("""
INPUT:
  CLASSES: ['background', 'wall', 'door', 'window']
MODEL:
  RPN:
    ANCHOR_SIZES_3D: [[0.4,1.5,1.5], [0.2,0.5,3], [0.4,1.5,3], [0.6,2.5,3]]
    RPN_SCALES_FROM_TOP: [4,3,2]
    BG_IOU_THRESHOLD: 0.2
  ROI_BOX_HEAD:
    POOLER_RESOLUTION: (6,8,4)
SPARSE3D:
  VOXEL_FULL_SCALE: [4096, 4096, 512]
SOLVER:
  BASE_LR: 0.005
  LR_STEP_EPOCHS: (100,)
TEST:
  IOU_THRESHOLD: 0.2
OUTPUT_DIR: "RES/x"
""")
    cfg = load_yaml_config(str(y))
    assert cfg.rpn.bg_iou_threshold == 0.2
    assert cfg.roi.pooler_resolution == (6, 8, 4)
    assert cfg.solver.base_lr == 0.005
    assert cfg.solver.lr_step_epochs == (100,)
    assert cfg.output_dir == "RES/x"
    assert cfg.rpn.anchor_sizes_3d[0] == (0.4, 1.5, 1.5)


def test_config_hashable():
    hash(Config())  # static jit arg requirement


def test_nms_post_cap_validation():
    """roi.nms_post_cap must leave (num_fg * cap) >= detections_per_img
    so the global top-K can fill the detection budget (VERDICT r4 #8:
    the 500 constant moved from roi_head.postprocess into Config)."""
    import dataclasses

    import pytest

    cfg = Config()
    assert cfg.roi.nms_post_cap == 500
    cfg.validate()
    bad = dataclasses.replace(
        cfg, roi=dataclasses.replace(cfg.roi, nms_post_cap=10,
                                     detections_per_img=200))
    with pytest.raises(AssertionError, match="nms_post_cap"):
        bad.validate()
