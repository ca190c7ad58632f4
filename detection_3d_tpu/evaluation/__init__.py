from detection_3d_tpu.evaluation.detection_eval import (
    evaluate_detections, voc_ap_07, DetectionEvalResult,
)
