"""Unit test for the detectron2 predictor wiring in
``build_detectron2_detector`` (reference extract_bu_features.py:24-141) using
a FAKE detectron2/cv2 installed in sys.modules — verifies the config knobs,
the manual RoI pipeline order, and that the per-call NMS threshold is plumbed
through to ``fast_rcnn_inference_single_image``.
"""

import sys
import types

import numpy as np
import pytest
import torch


class _CfgNode(types.SimpleNamespace):
    pass


def _make_cfg():
    cfg = _CfgNode()
    cfg.MODEL = _CfgNode()
    cfg.MODEL.RPN = _CfgNode()
    cfg.MODEL.ROI_HEADS = _CfgNode()
    cfg.merged_files = []
    cfg.merge_from_file = lambda p: cfg.merged_files.append(p)
    return cfg


N_PROPOSALS = 50
FEAT = 2048


class _Boxes:
    def __init__(self, tensor):
        self.tensor = tensor


class _Instances:
    def __init__(self, pred_boxes):
        self.pred_boxes = pred_boxes


def _install_fake_detectron2(record):
    cfg_holder = {}

    class FakeTransform:
        def apply_image(self, img):
            return img

    class FakeTransformGen:
        def get_transform(self, img):
            return FakeTransform()

    class FakeModel:
        class roi_heads:
            in_features = ["res4"]
            box2box_transform = "b2b"
            smooth_l1_beta = 0.0

            @staticmethod
            def _shared_roi_transform(feats, proposal_boxes):
                record["roi_transform_in"] = (feats, proposal_boxes)
                # (N, 2048, 7, 7) RoI features
                return torch.arange(N_PROPOSALS, dtype=torch.float32)[
                    :, None, None, None
                ].expand(N_PROPOSALS, FEAT, 7, 7).contiguous()

            @staticmethod
            def box_predictor(pooled):
                record["pooled"] = pooled
                # VG head: (class_logits, attr_logits, deltas)
                return ("cls_logits", "attr_logits", "deltas")

        @staticmethod
        def preprocess_image(inputs):
            record["preprocess_in"] = inputs
            return types.SimpleNamespace(
                tensor=inputs[0]["image"][None])

        @staticmethod
        def backbone(tensor):
            record["backbone_in"] = tensor
            return {"res4": "features_res4"}

        @staticmethod
        def proposal_generator(images, features, targets):
            assert targets is None
            proposals = [types.SimpleNamespace(
                proposal_boxes=_Boxes(torch.zeros(N_PROPOSALS, 4)))]
            return proposals, None

    class FakeDefaultPredictor:
        def __init__(self, cfg):
            cfg_holder["cfg"] = cfg
            self.cfg = cfg
            self.transform_gen = FakeTransformGen()
            self.model = FakeModel()

    class FakeFastRCNNOutputs:
        def __init__(self, b2b, class_logits, deltas, proposals, beta):
            record["fastrcnn_args"] = (b2b, class_logits, deltas, beta)

        def predict_probs(self):
            return [torch.linspace(1.0, 0.0, N_PROPOSALS)[:, None]]

        def predict_boxes(self):
            return [torch.arange(N_PROPOSALS * 4,
                                 dtype=torch.float32).reshape(N_PROPOSALS, 4)]

    def fake_inference(boxes, probs, image_shape, *, score_thresh,
                       nms_thresh, topk_per_image):
        record.setdefault("nms_calls", []).append(
            (float(nms_thresh), float(score_thresh), int(topk_per_image)))
        # 36 survivors only once the sweep reaches 0.7
        n = topk_per_image if nms_thresh >= 0.65 else topk_per_image + 4
        ids = torch.arange(n)
        return _Instances(_Boxes(boxes[ids])), ids

    def fake_postprocess(instances, h, w):
        record["postprocess_hw"] = (h, w)
        return instances

    mods = {}
    d2 = types.ModuleType("detectron2")
    mods["detectron2"] = d2
    cfgm = types.ModuleType("detectron2.config")
    cfgm.get_cfg = _make_cfg
    mods["detectron2.config"] = cfgm
    eng = types.ModuleType("detectron2.engine")
    eng.DefaultPredictor = FakeDefaultPredictor
    mods["detectron2.engine"] = eng
    modeling = types.ModuleType("detectron2.modeling")
    post = types.ModuleType("detectron2.modeling.postprocessing")
    post.detector_postprocess = fake_postprocess
    roi = types.ModuleType("detectron2.modeling.roi_heads")
    fr = types.ModuleType("detectron2.modeling.roi_heads.fast_rcnn")
    fr.FastRCNNOutputs = FakeFastRCNNOutputs
    fr.fast_rcnn_inference_single_image = fake_inference
    mods["detectron2.modeling"] = modeling
    mods["detectron2.modeling.postprocessing"] = post
    mods["detectron2.modeling.roi_heads"] = roi
    mods["detectron2.modeling.roi_heads.fast_rcnn"] = fr

    cv2 = types.ModuleType("cv2")
    cv2.imread = lambda p: np.full((48, 64, 3), 7, np.uint8)
    mods["cv2"] = cv2
    return mods, cfg_holder


def test_build_detectron2_detector_wiring(monkeypatch, tmp_path):
    record = {}
    mods, cfg_holder = _install_fake_detectron2(record)
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)

    from lrp_imagecaptioning_tpu.data.bu_features import (
        build_detectron2_detector,
        extract_single,
    )

    det = build_detectron2_detector("cfg.yaml", "weights.pkl")
    cfg = cfg_holder["cfg"]
    # reference config knobs (extract_bu_features.py:57-62)
    assert cfg.merged_files == ["cfg.yaml"]
    assert cfg.MODEL.RPN.POST_NMS_TOPK_TEST == 300
    assert cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST == 0.6
    assert cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST == 0.2
    assert cfg.MODEL.WEIGHTS == "weights.pkl"

    feats, boxes = det("img.jpg", 0.7)
    assert feats.shape == (36, FEAT)
    assert boxes.shape == (36, 4)
    # RoI features are pooled means of the fake (N,2048,7,7) maps -> row i = i
    np.testing.assert_allclose(feats[:, 0], np.arange(36, dtype=np.float32))
    # per-call nms threshold reached the inference fn; topk = 36
    assert record["nms_calls"][-1] == (0.7, 0.2, 36)
    # postprocess got the RAW image size (48, 64)
    assert record["postprocess_hw"] == (48, 64)

    # the sweep in extract_single stops at the threshold that yields 36
    record["nms_calls"] = []
    f2, b2 = extract_single("img.jpg", det)
    assert f2.shape == (36, FEAT) and b2.shape == (36, 4)
    assert [c[0] for c in record["nms_calls"]] == [0.5, 0.6, 0.7]


def test_extract_bu_features_cli(tmp_path):
    """The root CLI shim drives create_bu_features over split-JSON image
    paths and writes consumable 36x2048 HDF5 files (reference
    extract_bu_features.py:24-66)."""
    import json

    import h5py

    sys.path.insert(0, ".")
    import extract_bu_features as cli

    items = [{"image_path": str(tmp_path / f"img{i}.jpg")} for i in range(3)]
    split_json = tmp_path / "train_items.json"
    split_json.write_text(json.dumps(items + items))  # dup paths deduped

    def fake_detector(path, nms_thresh):
        rng = np.random.default_rng(abs(hash(path)) % 2**32)
        return (rng.normal(size=(36, FEAT)).astype(np.float32),
                rng.uniform(0, 64, size=(36, 4)).astype(np.float32))

    out_dir = tmp_path / "bu"
    written = cli.main(["--jsons", str(split_json),
                        "--images", str(tmp_path / "extra.jpg"),
                        "--output", str(out_dir)], detector=fake_detector)
    assert len(written) == 4  # 3 deduped + 1 explicit
    for path in written:
        with h5py.File(path, "r") as f:
            assert f["image_features"].shape == (36, FEAT)
            assert f["image_boxes"].shape == (36, 4)


def test_missing_detectron2_raises_importerror(monkeypatch):
    for name in list(sys.modules):
        if name.startswith("detectron2"):
            monkeypatch.delitem(sys.modules, name)
    monkeypatch.setitem(sys.modules, "detectron2", None)

    from lrp_imagecaptioning_tpu.data.bu_features import (
        build_detectron2_detector,
    )

    with pytest.raises(ImportError, match="detectron2"):
        build_detectron2_detector("cfg.yaml", "weights.pkl")
