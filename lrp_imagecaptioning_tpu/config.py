"""Declarative configuration for models, training, decoding and explanation.

Replaces the reference's three near-identical argparse trees
(``config.py:4,71,139`` — ``imgcap_adaptive/gridTD/aoa_argument_parser``) and the
experiment presets that the reference encodes by editing ``__main__`` blocks
(``train.py:344-392``).  One frozen dataclass per concern + named presets.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


# Output-grid stride of each CNN encoder: VGG16 keeps features[:-1] (the last
# maxpool dropped -> stride 16, 14x14 at 224^2, reference gridTDmodel.py:33-35);
# ResNet-50/101 run the full conv stack -> stride 32 (7x7 at 224^2, reference
# resnet.py:232-236).  The bottom-up path has no grid: always 36 regions
# (extract_bu_features.py:24, dataloader.py:63-126).
ENCODER_STRIDES: dict[str, int] = {"vgg16": 16, "resnet50": 32, "resnet101": 32}
BU_NUM_REGIONS = 36


def derive_num_pixels(encoder: str, height: int, width: int) -> int:
    """Number of attention positions an encoder emits for an input image.

    The single source of truth for the encoder-grid geometry — every CLI and
    bench must use this (round-2 verdict: four of five entry points derived it
    wrong for resnet/bu).
    """
    if encoder == "bu":
        return BU_NUM_REGIONS
    try:
        stride = ENCODER_STRIDES[encoder]
    except KeyError:
        raise ValueError(
            f"unknown encoder {encoder!r}; have {sorted(ENCODER_STRIDES)} + 'bu'"
        ) from None
    return (height // stride) * (width // stride)


@dataclass(frozen=True)
class ModelConfig:
    """Architecture settings (reference ``config.py:53-56,122-125,186-190``)."""

    model_type: str = "gridtd"  # 'adaptive' | 'gridtd' | 'aoa' (+ '_bu' feature path)
    encoder: str = "vgg16"  # 'vgg16' | 'resnet50' | 'resnet101' | 'bu'
    embed_dim: int = 512
    hidden_dim: int = 512
    num_head: int = 8  # AoA only
    vocab_size: int = 0  # filled from the word map
    height: int = 224
    width: int = 224
    # None -> derived from encoder+height+width (derive_num_pixels); an
    # explicit int overrides (toy tests with synthetic feature grids).
    num_pixels: int | None = None
    bu_feat_dim: int = 2048  # bottom-up region feature dim
    # Pad the vocab-sized params (embedding rows, fc columns) to a multiple —
    # keeps the big matmul MXU-tileable and makes the vocab dim divisible by
    # the model-parallel axis.  Padded logit columns are masked to -1e9.
    vocab_pad_multiple: int = 1
    dropout_rate: float = 0.5
    # compute dtype for the CNN/matmul-heavy forward path; relevance math is
    # always float32 (SURVEY.md §7 hard-parts: fp32 discipline for LRP).
    compute_dtype: str = "float32"

    def __post_init__(self) -> None:
        if self.num_pixels is None:
            object.__setattr__(
                self, "num_pixels",
                derive_num_pixels(self.encoder, self.height, self.width))

    @property
    def is_bu(self) -> bool:
        return self.encoder == "bu" or self.model_type.endswith("_bu")

    @property
    def padded_vocab(self) -> int:
        m = max(1, self.vocab_pad_multiple)
        return -(-self.vocab_size // m) * m


@dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference ``config.py:27-48``, ``train.py:95-151``)."""

    dataset: str = "flickr30k"
    batch_size: int = 32
    epochs: int = 20
    encoder_lr: float = 1e-4
    decoder_lr: float = 5e-4
    adam_b1: float = 0.8  # train.py:97-109 Adam betas (0.8, 0.999)
    adam_b2: float = 0.999
    weight_decay: float = 5e-4
    grad_clip: float = 0.1  # elementwise clamp, modelutils.py:102-112
    ss_prob: float | None = None  # scheduled sampling probability
    finetune_encoder: bool = False
    # tuning modes, mutually exclusive (train.py:120-137)
    cider_tune: bool = False
    lrp_tune: bool = False
    lrp_cider_tune: bool = False
    # LR plateau decay (train.py:117-118, modelutils.py:147-159)
    lr_shrink_factor: float = 0.8
    lr_floor: float = 2e-5
    plateau_patience: int = 2
    # SCST reward weights (train.py:193)
    cider_reward_weight: float = 1.0
    bleu_reward_weight: float = 0.0
    # Beyond-reference: mix a teacher-forced CE anchor into the SCST loss
    # (loss = reward_criterion + w * CE on the ground-truth caption).  Pure
    # SCST collapses once the greedy baseline saturates (docs/QUALITY.md);
    # 0.0 (default) reproduces the reference exactly (train.py:182-210).
    scst_ce_weight: float = 0.0
    max_caption_len: int = 52  # <start> + max_len(50) + <end>
    print_freq: int = 500
    seed: int = 0
    # Host->device image-transfer dtype for the epoch loops.  "bfloat16"
    # ships pre-normalized float batches at half width and upcasts on device
    # (models.captioner.prepare_visual) — the TPU convs consume bf16 anyway,
    # so only the input quantization itself is new rounding.  uint8 pipelines
    # are selected at the dataset instead (CaptionDataset(uint8_images=True),
    # 4x fewer bytes).  "float32" (default) = exact reference parity.
    upload_dtype: str = "float32"
    # concurrent host->device uploads in the prefetched epoch loops (the
    # serving pipeline-depth trick; >1 overlaps device_put latency on the
    # tunnel backend — measure with tools/bench_train_step.py
    # --feed-depth-sweep before raising)
    upload_workers: int = 1

    @property
    def mode(self) -> str:
        if self.cider_tune:
            return "cider"
        if self.lrp_tune:
            return "lrp"
        if self.lrp_cider_tune:
            return "lrp_cider"
        return "xe"


@dataclass(frozen=True)
class DecodeConfig:
    """Decoding settings (reference decode methods in each model file)."""

    beam_size: int = 3
    max_cap_length: int = 20  # beam/greedy default (gridTDmodel.py:400,480)
    dbs_max_cap_length: int = 50  # diverse beam default (gridTDmodel.py:304)
    diversity_prob: float = 0.5  # 0.8 for the adaptive model
    sample_method: str = "greedy"  # greedy|sample|gumbel|top<k>|top<p>
    temperature: float = 1.0


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding. The reference has no distributed
    runtime (SURVEY.md §2.2); this is new, TPU-first surface area."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1: all devices on the data axis
    model_parallel: int = 1  # vocab/fc sharding over the model axis


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    save_path: str = "./output"
    resume: str = ""

    def replace(self, **kw: Any) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _exp(model_kw: dict, train_kw: dict, **kw: Any) -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(**model_kw), train=TrainConfig(**train_kw), **kw
    )


# Named presets capturing the reference's __main__ experiment blocks
# (train.py:344-392, train_bu.py:293-402, test.py:140-155).
PRESETS: dict[str, ExperimentConfig] = {
    "adaptive_vgg16_flickr30k": _exp(
        dict(model_type="adaptive", encoder="vgg16"),
        dict(dataset="flickr30k", epochs=30, ss_prob=0.2),
    ),
    "gridtd_vgg16_flickr30k": _exp(
        dict(model_type="gridtd", encoder="vgg16"),
        dict(dataset="flickr30k", epochs=20),
    ),
    "gridtd_vgg16_coco2017": _exp(
        dict(model_type="gridtd", encoder="vgg16"),
        dict(dataset="coco2017", epochs=20),
    ),
    "aoa_vgg16_flickr30k": _exp(
        dict(model_type="aoa", encoder="vgg16"),
        dict(dataset="flickr30k", epochs=50),
    ),
    "aoa_vgg16_coco2017": _exp(
        dict(model_type="aoa", encoder="vgg16"),
        dict(dataset="coco2017", epochs=50),
    ),
    # bottom-up paths use hidden=1024 (train_bu.py presets)
    "gridtd_bu_coco2017": _exp(
        dict(model_type="gridtd", encoder="bu", hidden_dim=1024, num_pixels=36),
        dict(dataset="coco2017", epochs=20),
    ),
    "aoa_bu_coco2017": _exp(
        dict(model_type="aoa", encoder="bu", hidden_dim=1024, num_pixels=36),
        dict(dataset="coco2017", epochs=50),
    ),
    "gridtd_bu_flickr30k": _exp(
        dict(model_type="gridtd", encoder="bu", hidden_dim=1024, num_pixels=36),
        dict(dataset="flickr30k", epochs=20),
    ),
}


def get_preset(name: str) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]
