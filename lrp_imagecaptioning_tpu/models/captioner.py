"""Captioner facade: one uniform functional surface over every model family.

The reference duplicates forward/sample/greedy/beam/diverse-beam across three
model files (~3x code, SURVEY.md §2).  Here each model family plugs its
``init/encode/forward/step/init_state`` into this facade and the decoding
suite (``..decoding``) is written once.

Currently wired: gridtd (CNN + BU paths).  AoA and adaptive attention register
through the same interface.
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
from . import gridtd
from .encoders import VGGParams, encode_image_grid, init_vgg16

ENCODER_RAW_DIM = {"vgg16": 512, "resnet50": 2048, "resnet101": 2048}


@struct.dataclass
class CaptionerParams:
    encoder: VGGParams | None  # CNN backbone; None for the bottom-up path
    decoder: object  # model-family params (GridTDParams, ...)


class Captioner:
    """Not a pytree — a namespace of pure functions specialized to a config.
    All methods take params explicitly so everything jits/vmaps/pjits."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        if cfg.model_type not in ("gridtd",):
            raise NotImplementedError(f"model_type {cfg.model_type!r} not wired yet")
        self.raw_dim = (
            cfg.bu_feat_dim if cfg.is_bu else ENCODER_RAW_DIM[cfg.encoder]
        )

    # -- params -----------------------------------------------------------
    def init(self, rng: jax.Array) -> CaptionerParams:
        enc_rng, dec_rng = jax.random.split(rng)
        encoder = None if self.cfg.is_bu else init_vgg16(enc_rng)
        decoder = gridtd.init_gridtd(dec_rng, self.cfg, self.raw_dim)
        return CaptionerParams(encoder, decoder)

    # -- encoding ---------------------------------------------------------
    def encode(
        self, params: CaptionerParams, visual: jax.Array, *,
        stop_encoder_gradient: bool = True,
    ) -> gridtd.Features:
        """visual: (B, H, W, 3) images for the CNN path or (B, 36, D) region
        features for the BU path."""
        if self.cfg.is_bu:
            return gridtd.encode_features_bu(params.decoder, visual)
        raw, avg = encode_image_grid(params.encoder, visual)
        if stop_encoder_gradient:  # frozen CNN (train.py:102-104)
            raw = jax.lax.stop_gradient(raw)
            avg = jax.lax.stop_gradient(avg)
        return gridtd.encode_features(params.decoder, raw, avg)

    # -- teacher-forced forward ------------------------------------------
    def forward(self, params, feats, captions, *, num_steps, ss_prob=None,
                rng=None, train=True):
        logits, alphas, betas = gridtd.forward(
            params.decoder, feats, captions, num_steps=num_steps,
            ss_prob=ss_prob, rng=rng, train=train,
            dropout_rate=self.cfg.dropout_rate,
        )
        return (
            gridtd.mask_padded_logits(logits, self.cfg.vocab_size),
            alphas, betas,
        )

    # -- stepping ---------------------------------------------------------
    def init_state(self, batch_size: int):
        return gridtd.init_state(batch_size, self.cfg.hidden_dim)

    def make_step_fn(self, params, feats) -> Callable:
        def step_fn(state, token):
            logits, _, state = gridtd.step(params.decoder, feats, state, token)
            return gridtd.mask_padded_logits(logits, self.cfg.vocab_size), state

        return step_fn

    # -- decoding ---------------------------------------------------------
    def greedy(self, params, feats, word_map, *, max_cap_length: int = 20):
        b = feats.v_proj.shape[0]
        return _greedy(
            self.make_step_fn(params, feats), self.init_state(b),
            batch_size=b, start_token=word_map.start, end_token=word_map.end,
            num_steps=max_cap_length - 1,
        )

    def sample(self, params, feats, word_map, rng, *, num_steps: int,
               sample_method: str = "greedy", temperature: float = 1.0):
        b = feats.v_proj.shape[0]
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

        feats_un = jax.tree_util.tree_map(lambda x: x, feats)
        return jax.vmap(one)(feats_un)

    # -- LRP-inference fine-tuning paths ---------------------------------
    def forward_lrp(self, params, feats, captions, stop_mask, *, num_steps):
        """(standard, weighted) teacher-forced logits for lrp_tune
        (forwardlrp_context, gridTDmodel.py:580-633)."""
        from . import lrp_tuning

        logits, weighted = lrp_tuning.forward_lrp_context(
            params.decoder, feats, captions, stop_mask, num_steps=num_steps
        )
        return (
            gridtd.mask_padded_logits(logits, self.cfg.vocab_size),
            gridtd.mask_padded_logits(weighted, self.cfg.vocab_size),
        )

    def sample_lrp(self, params, feats, stop_mask, word_map, rng, *,
                   num_steps, sample_method="sample", temperature=1.0):
        """Rollout from the LRP-weighted distribution (sample_lrp,
        gridTDmodel.py:635-702)."""
        from . import lrp_tuning

        return lrp_tuning.sample_lrp(
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
