#!/usr/bin/env python
"""Bottom-up feature extraction CLI — reference ``extract_bu_features.py``.

Drives :func:`lrp_imagecaptioning_tpu.data.bu_features.create_bu_features`
over the images of one or more dataset split JSONs (the reference iterates
train/val/test item lists, ``extract_bu_features.py:24-66``) or an explicit
image list, writing one ``<image>.hdf5`` (``image_features`` 36x2048 +
``image_boxes``) per image for ``train.py --encoder bu`` to consume.

Requires detectron2 + the VG-pretrained caffe weights (import-guarded in the
library, absent from this environment); the protocol is smoke-tested with a
fake detector in tests/test_bu_detectron2_wiring.py.

Example:
    python extract_bu_features.py --jsons dataset/train_....json \\
        dataset/val_....json --config configs/VG-Detection/....yaml \\
        --weights faster_rcnn_from_caffe_attr.pkl --output ./bu_features
"""

from __future__ import annotations

import argparse
import json


def collect_image_paths(jsons: list[str], images: list[str]) -> list[str]:
    """Unique image paths from split-item JSONs (reference iterates
    items' ``image_path``) plus any explicit --images."""
    paths: list[str] = []
    seen = set()
    for jp in jsons:
        with open(jp) as f:
            for item in json.load(f):
                p = item["image_path"] if isinstance(item, dict) else item
                if p not in seen:
                    seen.add(p)
                    paths.append(p)
    for p in images:
        if p not in seen:
            seen.add(p)
            paths.append(p)
    return paths


def main(argv=None, detector=None):
    p = argparse.ArgumentParser(
        description="Extract 36x2048 bottom-up RoI features to HDF5")
    p.add_argument("--jsons", nargs="*", default=[],
                   help="split item JSONs (image_path per item)")
    p.add_argument("--images", nargs="*", default=[],
                   help="explicit image files")
    p.add_argument("--config", default="",
                   help="detectron2 VG-Detection config yaml")
    p.add_argument("--weights", default="",
                   help="VG-pretrained caffe weights (.pkl)")
    p.add_argument("--score-thresh", type=float, default=0.2)
    p.add_argument("--num-regions", type=int, default=36)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    from lrp_imagecaptioning_tpu.data.bu_features import (
        build_detectron2_detector,
        create_bu_features,
    )

    paths = collect_image_paths(args.jsons, args.images)
    if not paths:
        raise SystemExit("no images: pass --jsons and/or --images")
    if detector is None:
        if not (args.config and args.weights):
            raise SystemExit("--config and --weights required "
                             "(detectron2 VG model)")
        detector = build_detectron2_detector(
            args.config, args.weights, score_thresh=args.score_thresh,
            num_regions=args.num_regions)
    written = create_bu_features(paths, args.output, detector,
                                 num_regions=args.num_regions)
    print(f"wrote {len(written)} hdf5 files to {args.output}")
    return written


if __name__ == "__main__":
    main()
