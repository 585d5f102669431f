"""Bottom-up (Faster-RCNN) region-feature extraction — offline tool.

Reference: ``extract_bu_features.py`` (create_bu_features:24,
extract_featrue:68, extract_single:161): a VG-pretrained detectron2
Faster-RCNN proposes regions; the NMS threshold is swept 0.5 -> 0.9 in 0.1
steps until exactly 36 boxes survive, then the top-36 RoI features + boxes are
written to one HDF5 per image (datasets ``image_features`` (36, 2048) and
``image_boxes`` (36, 4)).

detectron2 is an external dependency in the reference too (SURVEY.md §2.1);
here the detector is an injectable callable so the sweep/write-out logic is
testable without it, and :func:`build_detectron2_detector` raises a clear
error when detectron2 is absent.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

import numpy as np

NUM_REGIONS = 36
FEAT_DIM = 2048
NMS_SWEEP = (0.5, 0.6, 0.7, 0.8, 0.9)

# detector(image_path, nms_threshold) -> (features (N, 2048), boxes (N, 4))
Detector = Callable[[str, float], tuple[np.ndarray, np.ndarray]]


def build_detectron2_detector(
    config_path: str,
    weights_path: str,
    *,
    score_thresh: float = 0.2,
    num_regions: int = NUM_REGIONS,
) -> Detector:
    """Build the VG-pretrained Faster-RCNN region detector.

    Mirrors the reference's predictor construction (config merge +
    RPN.POST_NMS_TOPK_TEST=300, SCORE_THRESH_TEST=0.2, VG caffe weights,
    extract_bu_features.py:24-66) and its manual RoI pipeline (backbone ->
    RPN proposals -> shared RoI transform -> pooled 2048-d features ->
    FastRCNNOutputs -> per-call fast_rcnn_inference_single_image,
    extract_bu_features.py:84-141).  The per-call ``nms_threshold`` is what
    :func:`extract_single` sweeps 0.5 -> 0.9.
    """
    try:
        import cv2
        import torch
        from detectron2.config import get_cfg
        from detectron2.engine import DefaultPredictor
        from detectron2.modeling.postprocessing import detector_postprocess
        from detectron2.modeling.roi_heads.fast_rcnn import (
            FastRCNNOutputs,
            fast_rcnn_inference_single_image,
        )
    except ImportError as e:
        raise ImportError(
            "bottom-up feature extraction needs detectron2 (+cv2) with "
            "VG-pretrained Faster-RCNN weights (reference "
            "extract_bu_features.py:1-23); install it or pass a custom "
            "detector callable to create_bu_features."
        ) from e

    cfg = get_cfg()
    cfg.merge_from_file(config_path)
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 300
    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.6
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = score_thresh
    cfg.MODEL.WEIGHTS = weights_path
    predictor = DefaultPredictor(cfg)

    def detect(image_path: str, nms_threshold: float):
        raw_image = cv2.imread(image_path)
        with torch.no_grad():
            raw_height, raw_width = raw_image.shape[:2]
            image = predictor.transform_gen.get_transform(
                raw_image).apply_image(raw_image)
            image = torch.as_tensor(
                image.astype("float32").transpose(2, 0, 1))
            inputs = [{"image": image, "height": raw_height,
                       "width": raw_width}]
            images = predictor.model.preprocess_image(inputs)
            features = predictor.model.backbone(images.tensor)
            proposals, _ = predictor.model.proposal_generator(
                images, features, None)
            proposal_boxes = [x.proposal_boxes for x in proposals]
            feats = [features[f]
                     for f in predictor.model.roi_heads.in_features]
            box_features = predictor.model.roi_heads._shared_roi_transform(
                feats, proposal_boxes)
            feature_pooled = box_features.mean(dim=[2, 3])
            predicted = predictor.model.roi_heads.box_predictor(
                feature_pooled)
            if len(predicted) == 3:  # VG head adds attribute logits
                pred_class_logits, _, pred_proposal_deltas = predicted
            else:
                pred_class_logits, pred_proposal_deltas = predicted
            outputs = FastRCNNOutputs(
                predictor.model.roi_heads.box2box_transform,
                pred_class_logits,
                pred_proposal_deltas,
                proposals,
                predictor.model.roi_heads.smooth_l1_beta,
            )
            probs = outputs.predict_probs()[0]
            boxes = outputs.predict_boxes()[0]
            instances, ids = fast_rcnn_inference_single_image(
                boxes, probs, image.shape[1:],
                score_thresh=score_thresh, nms_thresh=nms_threshold,
                topk_per_image=num_regions,
            )
            instances = detector_postprocess(instances, raw_height, raw_width)
            roi_features = feature_pooled[ids].detach().cpu().numpy()
            out_boxes = instances.pred_boxes.tensor.detach().cpu().numpy()
        return roi_features, out_boxes

    return detect


def extract_single(
    image_path: str, detector: Detector,
    *, num_regions: int = NUM_REGIONS, feat_dim: int = FEAT_DIM,
) -> tuple[np.ndarray, np.ndarray]:
    """NMS sweep until exactly ``num_regions`` boxes, else top-N of the last
    sweep (extract_bu_features.py:161-220 semantics)."""
    feats = boxes = None
    for thresh in NMS_SWEEP:
        feats, boxes = detector(image_path, thresh)
        if len(feats) == num_regions:
            break
    feats = np.asarray(feats, np.float32)[:num_regions]
    boxes = np.asarray(boxes, np.float32)[:num_regions]
    out_f = np.zeros((num_regions, feat_dim), np.float32)
    out_b = np.zeros((num_regions, 4), np.float32)
    out_f[: len(feats)] = feats
    out_b[: len(boxes)] = boxes
    return out_f, out_b


def create_bu_features(
    image_paths: Iterable[str],
    output_folder: str,
    detector: Detector,
    *,
    num_regions: int = NUM_REGIONS,
    feat_dim: int = FEAT_DIM,
) -> list[str]:
    """Write one ``<image>.hdf5`` per image with image_features/image_boxes
    (create_bu_features, extract_bu_features.py:24-66)."""
    import h5py

    os.makedirs(output_folder, exist_ok=True)
    written = []
    for path in image_paths:
        feats, boxes = extract_single(
            path, detector, num_regions=num_regions, feat_dim=feat_dim
        )
        name = os.path.splitext(os.path.basename(path))[0] + ".hdf5"
        out = os.path.join(output_folder, name)
        with h5py.File(out, "w") as f:
            f.create_dataset("image_features", data=feats)
            f.create_dataset("image_boxes", data=boxes)
        written.append(out)
    return written
