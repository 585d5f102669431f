"""Captioner facade: one uniform functional surface over every model family.

The reference duplicates forward/sample/greedy/beam/diverse-beam across three
model files (~3x code, SURVEY.md §2).  Here each model family implements a
small adapter (init/encode/forward/step/init_state + LRP-tuning hooks) and the
decoding suite (``..decoding``), training engine and explainers are written
once against this surface.

Families: ``gridtd`` (GridTDModel/GridTDModelBU), ``aoa`` (AOAModel/
AOAModelBU), ``adaptive`` (AdaptiveAttentionCaptioningModel).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig
from ..decoding import beam_search as _beam_search
from ..decoding import diverse_beam_search as _dbs
from ..decoding import greedy_search as _greedy
from ..decoding import sample as _sample
from ..decoding.beam import BeamResult, expand_to_beam
from . import aoa, gridtd
from .encoders import VGGParams, encode_image_grid, init_vgg16

ENCODER_RAW_DIM = {"vgg16": 512, "resnet50": 2048, "resnet101": 2048}


@struct.dataclass
class CaptionerParams:
    encoder: VGGParams | None  # CNN backbone; None for the bottom-up path
    decoder: object  # model-family params (GridTDParams / AOAParams / ...)


def prepare_visual(visual: jax.Array) -> jax.Array:
    """Device-side entry conversion for image tensors (trace-time dtype
    dispatch — each dtype compiles its own program):

    - uint8: raw pixels shipped by the quantized host pipeline
      (``CaptionDataset(uint8_images=True)``, 4x fewer host->device bytes) —
      ImageNet-normalize on device (train.py:21-22 transform semantics);
      XLA fuses the affine into the first conv's input processing.
    - bfloat16: ``TrainConfig.upload_dtype="bfloat16"`` half-width upload of
      pre-normalized floats — upcast to float32 (the MXU consumes bf16 for
      the convs regardless, so training sees no additional rounding beyond
      the input quantization itself).
    - float32: passthrough (default, exact reference parity).
    """
    if visual.dtype == jnp.uint8:
        from ..data.dataset import IMAGENET_MEAN, IMAGENET_STD

        x = visual.astype(jnp.float32) / 255.0
        return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    if visual.dtype != jnp.float32:
        return visual.astype(jnp.float32)
    return visual


def mask_padded_logits(logits: jax.Array, vocab_size: int) -> jax.Array:
    if logits.shape[-1] == vocab_size:
        return logits
    ids = jnp.arange(logits.shape[-1])
    return jnp.where(ids < vocab_size, logits, -1e9)


class _GridTDFamily:
    dropout_rate = 0.5

    def __init__(self, cfg: ModelConfig, raw_dim: int):
        self.cfg, self.raw_dim = cfg, raw_dim

    def init(self, rng):
        return gridtd.init_gridtd(rng, self.cfg, self.raw_dim)

    def encode(self, decoder, raw, avg):
        if self.cfg.is_bu:
            return gridtd.encode_features_bu(decoder, raw)
        return gridtd.encode_features(decoder, raw, avg)

    def init_state(self, b):
        return gridtd.init_state(b, self.cfg.hidden_dim)

    def step(self, decoder, feats, state, token, *, rng=None, train=False):
        return gridtd.step(
            decoder, feats, state, token, rng=rng, train=train,
            dropout_rate=self.dropout_rate,
        )

    def forward(self, decoder, feats, captions, *, num_steps, ss_prob, rng, train):
        return gridtd.forward(
            decoder, feats, captions, num_steps=num_steps, ss_prob=ss_prob,
            rng=rng, train=train, dropout_rate=self.dropout_rate,
        )

    def forward_lrp(self, decoder, feats, captions, stop_mask, *, num_steps):
        from . import lrp_tuning

        return lrp_tuning.forward_lrp_context(
            decoder, feats, captions, stop_mask, num_steps=num_steps
        )

    def sample_lrp(self, decoder, feats, stop_mask, rng, **kw):
        from . import lrp_tuning

        return lrp_tuning.sample_lrp(decoder, feats, stop_mask, rng, **kw)


class _AOAFamily:
    dropout_rate = 0.3  # aoamodel.py:124

    def __init__(self, cfg: ModelConfig, raw_dim: int):
        self.cfg, self.raw_dim = cfg, raw_dim

    def init(self, rng):
        return aoa.init_aoa(rng, self.cfg, self.raw_dim)

    def encode(self, decoder, raw, avg):
        # both AoA paths project the raw grid/regions and take the mean of the
        # projected features as the global (aoamodel.py:204-209, 1840-1845)
        return aoa.encode_features(decoder, raw)

    def init_state(self, b):
        return aoa.init_state(b, self.cfg.hidden_dim)

    def step(self, decoder, feats, state, token, *, rng=None, train=False):
        return aoa.step(
            decoder, feats, state, token, num_head=self.cfg.num_head,
            rng=rng, train=train, dropout_rate=self.dropout_rate,
        )

    def forward(self, decoder, feats, captions, *, num_steps, ss_prob, rng, train):
        logits, alphas = aoa.forward(
            decoder, feats, captions, num_head=self.cfg.num_head,
            num_steps=num_steps, ss_prob=ss_prob, rng=rng, train=train,
            dropout_rate=self.dropout_rate,
        )
        return logits, alphas, jnp.zeros(alphas.shape[:2] + (1,), alphas.dtype)

    def forward_lrp(self, decoder, feats, captions, stop_mask, *, num_steps):
        from . import lrp_tuning

        return lrp_tuning.aoa_forward_lrp_context(
            decoder, feats, captions, stop_mask,
            num_steps=num_steps, num_head=self.cfg.num_head,
        )

    def sample_lrp(self, decoder, feats, stop_mask, rng, **kw):
        from . import lrp_tuning

        return lrp_tuning.aoa_sample_lrp(
            decoder, feats, stop_mask, rng, num_head=self.cfg.num_head, **kw
        )


class _AdaptiveFamily:
    dropout_rate = 0.5

    def __init__(self, cfg: ModelConfig, raw_dim: int):
        self.cfg, self.raw_dim = cfg, raw_dim

    def init(self, rng):
        from . import adaptive

        return adaptive.init_adaptive(rng, self.cfg, self.raw_dim)

    def encode(self, decoder, raw, avg):
        # adaptive shares the GridTD encoding (conv-projected grid + relu'd
        # Linear global, adaptiveattention.py:147-156); no BU variant exists.
        return gridtd.encode_features(decoder, raw, avg)

    def init_state(self, b):
        from . import adaptive

        return adaptive.init_state(b, self.cfg.hidden_dim)

    def step(self, decoder, feats, state, token, *, rng=None, train=False):
        from . import adaptive

        return adaptive.step(
            decoder, feats, state, token, rng=rng, train=train,
            dropout_rate=self.dropout_rate,
        )

    def forward(self, decoder, feats, captions, *, num_steps, ss_prob, rng, train):
        from . import adaptive

        return adaptive.forward(
            decoder, feats, captions, num_steps=num_steps, ss_prob=ss_prob,
            rng=rng, train=train, dropout_rate=self.dropout_rate,
        )

    def forward_lrp(self, *a, **k):
        raise NotImplementedError(
            "the adaptive model has no LRP-tuning modes (its reference config "
            "exposes only cider_tune, config.py:42)"
        )

    sample_lrp = forward_lrp


FAMILIES = {"gridtd": _GridTDFamily, "aoa": _AOAFamily, "adaptive": _AdaptiveFamily}


class Captioner:
    """Not a pytree — a namespace of pure functions specialized to a config.
    All methods take params explicitly so everything jits/vmaps/pjits."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        base_type = cfg.model_type.replace("_bu", "")
        if base_type not in FAMILIES:
            raise NotImplementedError(f"model_type {cfg.model_type!r} not wired yet")
        self.raw_dim = (
            cfg.bu_feat_dim if cfg.is_bu else ENCODER_RAW_DIM[cfg.encoder]
        )
        self.family = FAMILIES[base_type](cfg, self.raw_dim)

    # -- params -----------------------------------------------------------
    def _init_encoder(self, rng):
        if self.cfg.is_bu:
            return None
        if self.cfg.encoder.startswith("resnet"):
            from .resnet import init_resnet

            return init_resnet(rng, self.cfg.encoder)
        return init_vgg16(rng)

    def init(self, rng: jax.Array) -> CaptionerParams:
        enc_rng, dec_rng = jax.random.split(rng)
        return CaptionerParams(self._init_encoder(enc_rng),
                               self.family.init(dec_rng))

    # -- encoding ---------------------------------------------------------
    def encode_cnn(self, params: CaptionerParams, visual: jax.Array, *,
                   stop_encoder_gradient: bool = True):
        """The CNN half of :meth:`encode`: (raw grid, avg) features.  For the
        BU path this is a passthrough (the regions ARE the raw features).
        Exposed separately so SCST can run the frozen CNN once per step and
        share it between rollout and update (the trainable projection half
        lives in :meth:`project_features`)."""
        if self.cfg.is_bu:
            return visual, None
        visual = prepare_visual(visual)
        # compute_dtype lowers the CNN forward precision (bfloat16 on TPU);
        # float32 (default) is a no-op.  Relevance stashes are always f32.
        dt = (None if self.cfg.compute_dtype == "float32"
              else self.cfg.compute_dtype)
        if self.cfg.encoder.startswith("resnet"):
            from .resnet import encode_image_grid_resnet

            raw, avg = encode_image_grid_resnet(params.encoder, visual,
                                                dtype=dt)
        else:
            raw, avg = encode_image_grid(params.encoder, visual, dtype=dt)
        if stop_encoder_gradient:  # frozen CNN (train.py:102-104)
            raw = jax.lax.stop_gradient(raw)
            avg = jax.lax.stop_gradient(avg)
        return raw, avg

    def project_features(self, params: CaptionerParams, raw, avg):
        """The trainable (decoder-side) projection half of :meth:`encode`."""
        return self.family.encode(params.decoder, raw, avg)

    def encode(
        self, params: CaptionerParams, visual: jax.Array, *,
        stop_encoder_gradient: bool = True,
    ):
        """visual: (B, H, W, 3) images for the CNN path or (B, 36, D) region
        features for the BU path."""
        raw, avg = self.encode_cnn(
            params, visual, stop_encoder_gradient=stop_encoder_gradient)
        return self.project_features(params, raw, avg)

    def encode_train(self, params: CaptionerParams, visual: jax.Array):
        """Fine-tuning encode (gradients flow into the CNN, train.py:95-109):
        for ResNet encoders BatchNorm runs on batch statistics and the updated
        running stats come back as the second return (an encoder-params pytree
        whose mean/var fields are refreshed; None for VGG/BU where there is no
        BN state)."""
        if self.cfg.is_bu:
            return self.family.encode(params.decoder, visual, None), None
        visual = prepare_visual(visual)
        if self.cfg.encoder.startswith("resnet"):
            from .resnet import encode_image_grid_resnet_train

            raw, avg, new_enc = encode_image_grid_resnet_train(
                params.encoder, visual)
            return self.family.encode(params.decoder, raw, avg), new_enc
        raw, avg = encode_image_grid(params.encoder, visual)
        return self.family.encode(params.decoder, raw, avg), None

    # -- teacher-forced forward ------------------------------------------
    def forward(self, params, feats, captions, *, num_steps, ss_prob=None,
                rng=None, train=True):
        logits, alphas, betas = self.family.forward(
            params.decoder, feats, captions, num_steps=num_steps,
            ss_prob=ss_prob, rng=rng, train=train,
        )
        return mask_padded_logits(logits, self.cfg.vocab_size), alphas, betas

    # -- stepping ---------------------------------------------------------
    def init_state(self, batch_size: int):
        return self.family.init_state(batch_size)

    def make_step_fn(self, params, feats) -> Callable:
        def step_fn(state, token):
            logits, _, state = self.family.step(params.decoder, feats, state, token)
            return mask_padded_logits(logits, self.cfg.vocab_size), state

        return step_fn

    # -- decoding ---------------------------------------------------------
    def _batch_of(self, feats) -> int:
        return jax.tree_util.tree_leaves(feats)[0].shape[0]

    def greedy(self, params, feats, word_map, *, max_cap_length: int = 20):
        b = self._batch_of(feats)
        return _greedy(
            self.make_step_fn(params, feats), self.init_state(b),
            batch_size=b, start_token=word_map.start, end_token=word_map.end,
            num_steps=max_cap_length - 1,
        )

    def sample(self, params, feats, word_map, rng, *, num_steps: int,
               sample_method: str = "greedy", temperature: float = 1.0):
        b = self._batch_of(feats)
        return _sample(
            self.make_step_fn(params, feats), self.init_state(b), rng,
            batch_size=b, start_token=word_map.start, end_token=word_map.end,
            num_steps=num_steps, sample_method=sample_method,
            temperature=temperature,
        )

    def beam_search_single(self, params, feats1, word_map, *,
                           beam_size: int = 3, max_cap_length: int = 20) -> BeamResult:
        """feats1 has batch dim 1 (reference asserts batch==1,
        gridTDmodel.py:411)."""
        feats_k = expand_to_beam(feats1, beam_size)
        return _beam_search(
            self.make_step_fn(params, feats_k), self.init_state(beam_size),
            start_token=word_map.start, end_token=word_map.end,
            beam_size=beam_size, vocab_size=self.cfg.padded_vocab,
            max_steps=max_cap_length,
        )

    def beam_search_batch(self, params, feats, word_map, *,
                          beam_size: int = 3, max_cap_length: int = 20) -> BeamResult:
        """vmap of single-image beam search over the batch — the TPU-native
        replacement for the reference's one-image-at-a-time eval loop."""

        def one(feats1):
            feats1 = jax.tree_util.tree_map(lambda x: x[None], feats1)
            return self.beam_search_single(
                params, feats1, word_map,
                beam_size=beam_size, max_cap_length=max_cap_length,
            )

        return jax.vmap(one)(feats)

    # -- LRP-inference fine-tuning paths ---------------------------------
    def forward_lrp(self, params, feats, captions, stop_mask, *, num_steps):
        logits, weighted = self.family.forward_lrp(
            params.decoder, feats, captions, stop_mask, num_steps=num_steps
        )
        return (
            mask_padded_logits(logits, self.cfg.vocab_size),
            mask_padded_logits(weighted, self.cfg.vocab_size),
        )

    def sample_lrp(self, params, feats, stop_mask, word_map, rng, *,
                   num_steps, sample_method="sample", temperature=1.0):
        return self.family.sample_lrp(
            params.decoder, feats, stop_mask, rng,
            start_token=word_map.start, end_token=word_map.end,
            num_steps=num_steps, sample_method=sample_method,
            temperature=temperature, vocab_size=self.cfg.vocab_size,
        )

    def diverse_beam_search_single(self, params, feats1, word_map, *,
                                   beam_size: int = 3, max_cap_length: int = 50,
                                   diversity_prob: float = 0.5):
        feats_k = expand_to_beam(feats1, beam_size)
        return _dbs(
            self.make_step_fn(params, feats_k),
            lambda: self.init_state(beam_size),
            start_token=word_map.start, end_token=word_map.end,
            beam_size=beam_size, vocab_size=self.cfg.padded_vocab,
            max_steps=max_cap_length, diversity_prob=diversity_prob,
        )


def build_captioner(cfg: ModelConfig) -> Captioner:
    return Captioner(cfg)
