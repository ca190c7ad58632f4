"""Regression tests against the reference's golden demo artifacts
(/root/reference/demo/suncg_test_5_iou_3_augth_2/): exported box text
files and the stored AP curves. These check our geometry conversions and
AP formula against numbers the reference actually produced."""

import os
import sys
import types

import numpy as np
import pytest

DEMO = "/root/reference/demo/suncg_test_5_iou_3_augth_2"

pytestmark = pytest.mark.skipif(not os.path.isdir(DEMO),
                                reason="reference demo not mounted")


def _load_golden_predictions():
    import torch

    class FakeBoxList3D:
        pass

    for name in ["maskrcnn_benchmark", "maskrcnn_benchmark.structures"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    bb = types.ModuleType("maskrcnn_benchmark.structures.bounding_box_3d")
    bb.BoxList3D = FakeBoxList3D
    sys.modules["maskrcnn_benchmark.structures.bounding_box_3d"] = bb
    return torch.load(os.path.join(DEMO, "predictions.pth"),
                      map_location="cpu", weights_only=False)


def test_export_matches_golden_room_txt(tmp_path):
    """Our yx_zb->standard conversion + export must reproduce the
    reference's text_models/room_i.txt bit-for-bit (within float32)."""
    preds = _load_golden_predictions()
    from detection_3d_tpu.data.export import predictions_to_txt

    plist = [{"boxes": p.bbox3d.numpy(),
              "labels": p.extra_fields["labels"].numpy()} for p in preds]
    paths = predictions_to_txt(plist, str(tmp_path))
    for i, path in enumerate(paths):
        got = np.loadtxt(path)
        want = np.loadtxt(os.path.join(DEMO, "text_models", f"room_{i}.txt"))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_ap_formula_matches_golden():
    """Recompute VOC-07 AP from the golden recall/precision curves and
    compare with the stored per-class ap values."""
    import torch
    from detection_3d_tpu.evaluation.detection_eval import voc_ap_07

    res = torch.load(os.path.join(DEMO, "performance_res.pth"),
                     map_location="cpu", weights_only=False)
    ap_golden = np.asarray(res["ap"])
    curves = res["rec_prec_score_iou_org"]  # per class [rec, prec, score, iou]
    for l in range(1, len(ap_golden)):
        c = curves[l]
        if c is None or not np.size(c):
            continue
        rec, prec = np.asarray(c)[:, 0], np.asarray(c)[:, 1]
        got = voc_ap_07(prec, rec)
        np.testing.assert_allclose(got, ap_golden[l], atol=1e-6)


def test_golden_self_consistency_map():
    import torch

    res = torch.load(os.path.join(DEMO, "performance_res.pth"),
                     map_location="cpu", weights_only=False)
    ap = np.asarray(res["ap"])
    np.testing.assert_allclose(ap[0], np.nanmean(ap[1:]), atol=1e-9)
