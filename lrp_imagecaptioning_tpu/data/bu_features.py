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


def build_detectron2_detector(config_path: str, weights_path: str) -> Detector:
    try:
        import detectron2  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "bottom-up feature extraction needs detectron2 with VG-pretrained "
            "Faster-RCNN weights (reference extract_bu_features.py:1-23); "
            "install it or pass a custom detector callable to "
            "create_bu_features."
        ) from e
    raise NotImplementedError(
        "wire detectron2 config here (reference extract_bu_features.py:24-66)"
    )


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
