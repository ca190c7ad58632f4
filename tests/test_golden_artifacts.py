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


def test_matching_loop_matches_golden_curves():
    """Golden regression for the prec/rec GENERATION (greedy first-match
    bookkeeping + accumulation, suncg_eval.py:815-885), not just the AP
    formula.

    GT boxes for the demo scenes are not shipped, but the matching can be
    reconstructed: the curve's iou column stores every prediction's max
    IoU (predious), and ``pred_for_each_gt`` records which gt each
    above-threshold prediction matched. We rebuild each (image, class)
    IoU matrix column-sparsely from those, run OUR matching + curve
    accumulation, and require bit-equal rec/prec/score/iou columns and
    the stored per-class AP.

    Two reference quirks handled: (a) suncg_eval.py:29-35 swaps the
    ceiling/floor names before building pred_for_each_gt, so its keys are
    swapped relative to prediction labels; (b) the per-entry 'score'
    field indexes the globally ACCUMULATED score list (suncg_eval.py:823)
    and is junk for images after the first, so entries are identified by
    their (unique) IoU values instead.
    """
    import torch
    from detection_3d_tpu.evaluation.detection_eval import (
        match_predictions_to_gt, accumulate_prec_rec, voc_ap_07,
    )

    preds = _load_golden_predictions()
    res = torch.load(os.path.join(DEMO, "performance_res.pth"),
                     map_location="cpu", weights_only=False)
    label_2_class = res["label_2_class"]
    pfg = res["pred_for_each_gt"]
    curves = res["rec_prec_score_iou_org"]
    ap_golden = np.asarray(res["ap"])
    iou_thresh = 0.3  # demo dir name: suncg_test_5_iou_3

    name_of = dict(label_2_class)
    inv = {v: k for k, v in label_2_class.items()}
    if "ceiling" in inv and "floor" in inv:
        name_of[inv["ceiling"]], name_of[inv["floor"]] = "floor", "ceiling"

    for l in range(1, len(ap_golden)):
        obj = name_of[l]
        c = np.asarray(curves[l])
        rec_g, prec_g, score_g, iou_g = c.T
        sg32 = score_g.astype(np.float32)
        ig32 = iou_g.astype(np.float32)
        used_g = np.zeros(len(score_g), bool)
        scores_all, match_all, ious_all = [], [], []

        for bi in range(len(preds)):
            pl = preds[bi].extra_fields["labels"].numpy()
            ps = preds[bi].extra_fields["scores"].numpy()
            sl = np.sort(ps[pl == l])[::-1]
            if not len(sl):
                continue
            # per-pred max IoU via exact f32 score match into the curve
            iou_pred = np.zeros(len(sl), np.float32)
            for j, s in enumerate(sl):
                cand = np.where(~used_g & (sg32 == np.float32(s)))[0]
                assert cand.size, "pred score missing from golden curve"
                used_g[cand[0]] = True
                iou_pred[j] = ig32[cand[0]]
            # gt assignment for matched preds via exact IoU-value match
            peg = pfg[obj][bi] if obj in pfg else {}
            n_gt = max([k for k in peg if k >= 0], default=-1) + 1
            iou_mat = np.zeros((max(n_gt, 1), len(sl)))
            used_j = np.zeros(len(sl), bool)
            for gt_id, entries in peg.items():
                if gt_id < 0:
                    continue  # unmatched preds: junk iou (iou[-1, pi])
                for e in entries:
                    cand = np.where(~used_j &
                                    (iou_pred == np.float32(e["iou"])))[0]
                    assert cand.size, "entry IoU not found among preds"
                    used_j[cand[0]] = True
                    iou_mat[gt_id, cand[0]] = iou_pred[cand[0]]
            match, _, _ = match_predictions_to_gt(iou_mat, iou_thresh)
            scores_all.extend(sl)
            match_all.extend(match)
            ious_all.extend(iou_pred)

        # n_pos from the stored final recall (tp_final / rec_final)
        tp_final = int(np.sum(np.asarray(match_all) == 1))
        assert rec_g[-1] > 0
        n_pos = int(round(tp_final / rec_g[-1]))

        prec, rec, scores_s, ious_s = accumulate_prec_rec(
            scores_all, match_all, ious_all, n_pos)
        np.testing.assert_allclose(scores_s, score_g, atol=1e-6,
                                   err_msg=obj)
        np.testing.assert_allclose(prec, prec_g, atol=1e-9, err_msg=obj)
        np.testing.assert_allclose(rec, rec_g, atol=1e-9, err_msg=obj)
        np.testing.assert_allclose(ious_s, iou_g, atol=1e-6, err_msg=obj)
        np.testing.assert_allclose(voc_ap_07(prec, rec), ap_golden[l],
                                   atol=1e-9, err_msg=obj)
