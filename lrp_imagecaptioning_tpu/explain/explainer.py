"""End-to-end per-caption explainers — the reference's ``Explain*`` classes
(gridTDmodel.py:705-1211) rebuilt so the whole per-word image + linguistic
explanation runs as ONE jitted XLA program per caption:

    beam decode -> stash forward -> vmap(word relevance walk) ->
    shared-stash CNN relevance -> (T, H, W, 3) heatmaps + (T, T) word scores

The compiled core is fixed-shape (captions padded to ``max_words``); invalid
word slots are masked on host.  Host-side output (heatmap JPGs + YAML
linguistic explanations, gridTDmodel.py:1158-1211) is optional and lazy.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import WordMap
from ..models.captioner import Captioner, CaptionerParams, prepare_visual
from .cnn_gradient import make_vgg_guided_backward, vgg_gradient
from .cnn_lrp import make_vgg_lrp_backward
from .gridtd_gradient import grad_cam, gradient_all_words
from .gridtd_lrp import explain_all_words, stash_forward


class CaptionExplanation(NamedTuple):
    caption: list[str]  # decoded words (explained positions)
    tokens: np.ndarray  # (L,) encoded caption incl. <start>
    relevance_images: np.ndarray  # (T, H, W, 3) input-pixel relevance per word
    relevance_words: np.ndarray  # (T, T) linguistic relevance per word
    alphas: np.ndarray  # (T, P) attention maps per step
    predictions: np.ndarray  # (T, V) raw decoder logits per step
    betas: np.ndarray  # (T,) sentinel gates (zeros for models without one)


class GridTDExplainerBase:
    """Shared machinery: beam decode -> stash forward -> per-word walk ->
    CNN stage, all inside one jitted core.  Subclasses define the decoder walk
    and the CNN stage (the reference's Explain* class family,
    gridTDmodel.py:705-1858)."""

    EX_TYPE = "base"
    # The reference LRP explainers' manual language-LSTM forward adds bias_ih
    # twice (gridTDmodel.py:789, aoamodel.py:873); their GRADIENT explainers
    # use the correct bias_ih + bias_hh (gridTDmodel.py:1265,
    # aoamodel.py:1298).  Each driver defaults to its reference counterpart.
    DEFAULT_QUIRK = True

    def __init__(
        self,
        captioner: Captioner,
        params: CaptionerParams,
        word_map: WordMap,
        *,
        beam_size: int = 2,  # reference uses beam=2 for explanation decode
        max_words: int = 20,
        language_double_bias_i: bool | None = None,
        cnn_word_chunk: int = 8,
        pallas_block1: bool | None = None,
        pallas_block5: bool | None = None,
        block1_dot_mode: str = "bf16",
        cnn_r_dtype: str | None = None,
        cnn_w_dtype: str | None = None,
        cnn_s2d_block1: bool | None = None,
        cnn_deep_all_words: bool | None = None,
        cnn_conv1_merge: bool | None = None,
    ):
        self.cap = captioner
        self.params = params
        self.word_map = word_map
        self.beam_size = beam_size
        self.max_words = max_words
        self.quirk = (self.DEFAULT_QUIRK if language_double_bias_i is None
                      else language_double_bias_i)
        self.cnn_word_chunk = cnn_word_chunk
        # fused block-1 Pallas kernel for the LRP CNN bottom stage
        # (ops/pallas_block1.py).  Measured on 1xv5e (batch 8, words 16):
        # standalone it TIES the XLA record walk (3.43 vs 3.16 ms/img for
        # the same pool1+conv1_2+conv1_1 chain) and in situ it is ~1-4%
        # behind (92.7-96.1 vs 93.9-100.8 img/s), so the default is OFF —
        # XLA's native conv emitter + fusion already saturates this stage;
        # the kernel remains for study/when the balance shifts.  The "bf16"
        # dot mode matches this backend's XLA conv results exactly (its f32
        # convs already run as one bf16 MXU pass — measured bit-identical;
        # "bf16x3" is MORE accurate than the XLA path).
        self.pallas_block1 = (False if pallas_block1 is None
                              else pallas_block1)
        # weight-resident fused block-5 Pallas kernel for the LRP walk's
        # WEIGHT-bound top (ops/pallas_block5.py): word batch in-kernel,
        # the three conv5 kernels pinned in VMEM (the roofline puts 28.3
        # MB/word of weight reads there — 75.6% of the stage's HBM
        # traffic; the inverse of pallas_block1's map-pinning).  Measured
        # on 1xv5e (iters=20, batch 8 / chunk 8): STANDALONE the kernel
        # wins 0.83 -> 0.499 ms/img (the weight-traffic hypothesis
        # confirmed), IN SITU it exactly ties — 139.4 vs 139.3 img/s for
        # the chunk-embedded form (126.5 for the all-words deep-split
        # shape) — the stage saving is consumed by the kernel boundary
        # (seed pad/materialize, fusion break, per-chunk weight loads).
        # None = auto OFF; docs/PERF_NEGATIVES.md #12 has the full record.
        self.pallas_block5 = pallas_block5
        self.block1_dot_mode = block1_dot_mode
        # storage dtype for per-word relevance maps between CNN-walk layers
        # (arithmetic stays f32).  None = auto: bfloat16 on TPU backends
        # (whose conv data-grads round operands to bf16 internally anyway —
        # measured max-rel ~7e-3 vs the CPU f32 walk EITHER way), float32
        # elsewhere so the CPU parity suite is exact.
        self.cnn_r_dtype = cnn_r_dtype
        # storage dtype for the clamped conv-transpose kernels of the LRP
        # walk (cnn_lrp.make_vgg_lrp_backward's w_dtype).  None = auto:
        # follows the stash dtype (bf16 on TPU — halves the weight-read
        # traffic dominating blocks 4-5; f32 on CPU parity paths).  Pass
        # "float32" to force the jax.vjp weight path for A/B.
        self.cnn_w_dtype = cnn_w_dtype
        # space-to-depth block-1 walk (cnn_lrp.make_vgg_lrp_backward's
        # s2d_block1): moves the MXU-hostile 224^2 x 64ch conv1_2 backward
        # onto the efficient 112^2 x 256ch shape class.  None = auto: OFF —
        # measured in situ on v5e (bench.py --s2d): plain 129.2 img/s,
        # phase 97.7, dense 111.4 — both s2d forms LOSE (the stage is
        # HBM-bound; see the verdict note in make_vgg_lrp_backward).
        # Same walk up to float reassociation (tests/test_cnn_s2d.py).
        self.cnn_s2d_block1 = cnn_s2d_block1
        # merged single-conv clamped-input backward for conv1_1 (see
        # cnn_lrp.make_vgg_lrp_backward's conv1_merge note).  None = auto
        # ON for the compact (TPU) path — bit-identical to the two-conv
        # form and a measured +8.2% headline win (128.6 -> 139.1 img/s);
        # pass False to reproduce the pre-merge A/B baseline.
        self.cnn_conv1_merge = cnn_conv1_merge
        # two-level word chunking for the LRP walk (VGG only): walk blocks
        # 5-4 (maps <= 28^2) with ALL max_words lanes in ONE pass, then
        # chunk the big shallow maps at cnn_word_chunk as usual.  The
        # operating-point sweep only ever varied a UNIFORM chunk; this
        # probes whether the deep stages' many tiny ops benefit from wider
        # batching.  None = auto OFF — measured in situ on v5e (bench.py
        # --deep-split, iters=20): 124.6 vs 128.6 img/s plain, a ~3% LOSS.
        # The blocks-4/5 weight reads the roofline attributes per word are
        # NOT amortized by widening the word batch 8->16 (XLA already
        # streams weights per batch tile), and the wider deep vmap breaks
        # the chunk-level fusion the production form enjoys.
        self.cnn_deep_all_words = bool(cnn_deep_all_words)
        if self.pallas_block5 and (self.pallas_block1
                                   or cnn_deep_all_words):
            raise ValueError(
                "pallas_block5 composes with neither pallas_block1 (the "
                "block-1 kernel path maps words through the upper walk "
                "directly) nor cnn_deep_all_words (a conflicting deep "
                "split). Enable at most one.")
        if self.cnn_deep_all_words and self.pallas_block1:
            # _upper_cnn_stage would silently drop the deep split (it maps
            # words through the upper walk directly), so an A/B combining
            # both flags would measure only the kernel path.  Refuse the
            # combination instead of mismeasuring.
            raise ValueError(
                "cnn_deep_all_words does not compose with pallas_block1: "
                "the fused block-1 kernel path bypasses the deep/shallow "
                "word-chunk split. Enable at most one.")
        # TPU matmul precision for the whole explanation program.  The default
        # (1-pass bf16 multiply) costs ~4e-3 absolute drift on the normalized
        # word relevances vs CPU f32; BF16_BF16_F32_X3 halves that at
        # MEASURED-zero throughput cost (87.5 vs 87.4 img/s on v5e — the hot
        # CNN relevance backward is HBM-bound).  Pixel relevance maps are at
        # MAE ~2e-9 either way ('highest' reaches r_words 1.5e-5 but costs
        # 3.3x).  See tools/ precision sweep notes in README.
        # (CPU/GPU backends reject the TPU-specific algorithm — they already
        # run true f32, so no override is needed there.)
        self.matmul_precision = (
            "BF16_BF16_F32_X3" if jax.default_backend() in ("tpu", "axon")
            else None)
        self._core = jax.jit(self._explain_core)
        self._batched_core_jit = None  # lazily-built, cached (serving reuses)
        self._summary_core_jit = None  # lazily-built, cached (serving reuses)
        self._summary_packed_jit = None  # lazily-built, cached (serving reuses)

    # -- subclass hooks --------------------------------------------------
    def _make_stash(self, params, feats, tokens_in):
        return stash_forward(
            params.decoder, feats, tokens_in,
            language_double_bias_i=self.quirk,
        )

    def _decoder_walk(self, params, feats, stash, targets):
        raise NotImplementedError

    def _cnn_stage(self, params, image, word_exp):
        raise NotImplementedError

    # -- compiled core ---------------------------------------------------
    def _explain_core(self, params: CaptionerParams, image: jax.Array,
                      cnn_stage=None):
        """image (1, H, W, 3) -> everything, fixed shapes."""
        if self.matmul_precision is None:
            return self._explain_core_inner(params, image,
                                            cnn_stage=cnn_stage)
        with jax.default_matmul_precision(self.matmul_precision):
            return self._explain_core_inner(params, image,
                                            cnn_stage=cnn_stage)

    def _explain_core_inner(self, params: CaptionerParams, image: jax.Array,
                            cnn_stage=None):
        cap, wm = self.cap, self.word_map
        if not cap.cfg.is_bu:
            # uint8 request payloads (serving) normalize on device; the
            # relevance walk explains the NORMALIZED input tensor, exactly
            # like the reference (preprocess_img, gridTDmodel.py:767-771)
            image = prepare_visual(image)
        feats = cap.encode(params, image)
        beam = cap.beam_search_single(
            params, feats, wm, beam_size=self.beam_size,
            max_cap_length=self.max_words,
        )
        # input tokens for the stash forward: <start> + decoded words.
        # beam.tokens[0] is <start>; positions >= beam.length are 0.
        tokens_in = beam.tokens[: self.max_words]
        stash = self._make_stash(params, feats, tokens_in)
        # explained word at step t is the decoded token t+1
        targets = jnp.concatenate(
            [beam.tokens[1 : self.max_words], jnp.zeros((1,), jnp.int32)]
        )
        word_exp = self._decoder_walk(params, feats, stash, targets)
        if self.cap.cfg.is_bu:
            rel_imgs = word_exp.r_img_feature  # (T, P, C) region relevance
        else:
            rel_imgs = (cnn_stage or self._cnn_stage)(
                params, image, word_exp)
        beta = getattr(stash, "beta", None)
        if beta is None:
            beta = jnp.zeros(stash.predictions.shape[:1], jnp.float32)
        return (beam.tokens, beam.length, rel_imgs, word_exp.r_words,
                stash.alpha, stash.predictions, beta)

    # -- encoder-stage backends (dispatch on cfg.encoder) ----------------
    def _resolved_r_dtype(self):
        if self.cnn_r_dtype is not None:
            return jnp.dtype(self.cnn_r_dtype)
        return (jnp.bfloat16
                if jax.default_backend() in ("tpu", "axon") else jnp.float32)

    def _lrp_backward_factory(self, params, image):
        if self.cap.cfg.encoder.startswith("resnet"):
            from .resnet_lrp import make_resnet_lrp_backward

            return make_resnet_lrp_backward(
                params.encoder, image,
                r_dtype=self._resolved_r_dtype(),
                w_dtype=self._resolved_w_dtype(),
                stem_merge=self.cnn_conv1_merge)[0]
        return make_vgg_lrp_backward(
            params.encoder, image, r_dtype=self._resolved_r_dtype(),
            w_dtype=self._resolved_w_dtype(),
            s2d_block1=self._resolved_s2d_block1(),
            conv1_merge=self.cnn_conv1_merge)[0]

    def _resolved_w_dtype(self):
        """Storage dtype of the walk's conv-transpose kernels: explicit
        ``cnn_w_dtype`` if given, else the backend auto (bf16 on TPU — the
        weight-read traffic dominates the deep walk; f32 elsewhere so the
        CPU parity suite stays exact)."""
        if self.cnn_w_dtype is not None:
            return jnp.dtype(self.cnn_w_dtype)
        return self._resolved_r_dtype()

    def _resolved_s2d_block1(self):
        """False | True ('phase') | 'dense' — see make_vgg_lrp_backward."""
        if self.cnn_s2d_block1 is not None:
            return self.cnn_s2d_block1
        return False  # auto-default: measured slower in situ (see ctor note)

    def _guided_backward_factory(self, params, image):
        if self.cap.cfg.encoder.startswith("resnet"):
            from .resnet_lrp import make_resnet_guided_backward

            return make_resnet_guided_backward(params.encoder, image)[0]
        return make_vgg_guided_backward(
            params.encoder, image, g_dtype=self._resolved_r_dtype(),
            w_dtype=self._resolved_w_dtype())

    def _plain_gradient(self, params, image, seed):
        if self.cap.cfg.encoder.startswith("resnet"):
            from ..models.resnet import resnet_forward

            _, vjp = jax.vjp(
                lambda im: resnet_forward(params.encoder,
                                          im.astype(jnp.float32)), image)
            return vjp(seed)[0]
        return vgg_gradient(params.encoder, image, seed)

    def _grid_seeds(self, word_exp):
        """(T, P, C) decoder-walk output -> (T, h, w, C) CNN seeds."""
        hw = int(np.sqrt(self.cap.cfg.num_pixels))
        return word_exp.r_img_feature.reshape(
            self.max_words, hw, hw, self.cap.raw_dim
        )

    def _map_words(self, fn, seeds):
        """Apply a per-word CNN backward over the word axis in chunks:
        vmap within a chunk, lax.map across chunks.  Bounds the live
        activation memory at chunk_size x (one image's conv stash) so large
        batch x word products fit in HBM."""
        chunk = self.cnn_word_chunk
        T = seeds.shape[0]
        if chunk and T > chunk and T % chunk == 0:
            seeds_r = seeds.reshape(T // chunk, chunk, *seeds.shape[1:])
            out = jax.lax.map(lambda s: jax.vmap(fn)(s), seeds_r)
            return out.reshape(T, *out.shape[2:])
        return jax.vmap(fn)(seeds)

    def _use_block5_kernel(self) -> bool:
        if self.EX_TYPE != "lrp" or self.cap.cfg.is_bu:
            return False
        if self.cap.cfg.encoder != "vgg16":
            return False
        if self.pallas_block5 is None:
            return False  # auto-default pending in-situ A/B on v5e
        return bool(self.pallas_block5)

    def _map_words_lrp(self, backward, seeds, params=None):
        """LRP-walk word mapping with the optional two-level split
        (``cnn_deep_all_words``): blocks 5-4 for ALL words in one vmap,
        then the shallow blocks through the normal chunked path."""
        if params is not None and self._use_block5_kernel():
            from ..models.encoders import VGG16_SPEC
            from ..ops.pallas_block5 import block5_lrp_backward, prep_weight

            pools = [i for i, l in enumerate(VGG16_SPEC)
                     if l.kind == "maxpool"]
            split = pools[3] + 1  # first record of block 5 (conv5_1)
            rec = backward.records
            convs = [i for i in range(split, len(VGG16_SPEC))
                     if rec[i][0] == "conv"]  # [conv5_1, conv5_2, conv5_3]
            assert len(convs) == 3, convs
            w_dtype = self._resolved_w_dtype()
            r_dtype = self._resolved_r_dtype()
            ws = [prep_weight(
                params.encoder.convs[VGG16_SPEC[i].param_idx].weight,
                w_dtype) for i in convs]
            i1, i2, i3 = convs

            def deep_fn(seed_chunk):
                return block5_lrp_backward(
                    seed_chunk,
                    rec[i3][1][0], rec[i3][2][0],   # conv5_3 x_in, zinv
                    rec[i2][1][0], rec[i2][2][0],   # conv5_2
                    rec[i1][1][0], rec[i1][2][0],   # conv5_1
                    ws[2], ws[1], ws[0],
                    out_dtype=r_dtype, r_dtype=r_dtype,
                    dot_mode=("f32" if w_dtype == jnp.float32 else "bf16"),
                )

            # the kernel runs INSIDE the word-chunk map so the walk keeps
            # the production chunk structure (the all-deep-then-chunked
            # split alone measured a ~3% loss — deep-split negative,
            # docs/PERF_NEGATIVES.md); weights load once per chunk instead
            # of once per word
            def chunk_walk(seed_chunk):
                deep = deep_fn(seed_chunk)
                return jax.vmap(
                    lambda r: backward(r[None], up_from=split)[0])(deep)

            chunk = self.cnn_word_chunk
            T = seeds.shape[0]
            if chunk and T > chunk and T % chunk == 0:
                seeds_r = seeds.reshape(T // chunk, chunk, *seeds.shape[1:])
                out = jax.lax.map(chunk_walk, seeds_r)
                return out.reshape(T, *out.shape[2:])
            return chunk_walk(seeds)
        if (self.cnn_deep_all_words and not self.cap.cfg.is_bu
                and self.cap.cfg.encoder == "vgg16"):
            from ..models.encoders import VGG16_SPEC

            pools = [i for i, l in enumerate(VGG16_SPEC)
                     if l.kind == "maxpool"]
            split = pools[2] + 1  # first record of block 4
            deep = jax.vmap(
                lambda r: backward(r[None], down_to=split)[0])(seeds)
            return self._map_words(
                lambda r: backward(r[None], up_from=split)[0], deep)
        return self._map_words(lambda r: backward(r[None])[0], seeds)

    def explain_batch(self, images: jax.Array):
        """Raw batched core output (tokens, lengths, rel_imgs, r_words,
        alphas) for a batch of images."""
        return self.batched_core()(self.params, jnp.asarray(images))

    # -- fused block-1 kernel plumbing (LRP + VGG only) -------------------
    def _use_block1_kernel(self) -> bool:
        if self.EX_TYPE != "lrp" or self.cap.cfg.is_bu:
            return False
        if self.cap.cfg.encoder != "vgg16":
            return False
        return bool(self.pallas_block1)

    def _upper_cnn_stage(self, params, image, word_exp):
        """CNN walk down to the pool-1 output only; returns (r_pool,
        block1_inputs) for the fused kernel to finish at the batched level
        (the kernel cannot run under the per-image vmap — Mosaic has no
        batching rule for manually-DMA'd refs)."""
        from .cnn_lrp import make_vgg_lrp_backward_split

        upper, b1, _ = make_vgg_lrp_backward_split(
            params.encoder, image, r_dtype=self._resolved_r_dtype())
        r_pool = self._map_words(lambda r: upper(r[None])[0],
                                 self._grid_seeds(word_exp))
        return (r_pool, b1)

    def batched_core(self):
        """jitted (params, images (B, H, W, 3)) -> per-image explanation
        arrays — the throughput path: vmap of the full caption+LRP program
        over an image batch (north-star metric, BASELINE.md).  When the
        fused block-1 kernel is enabled, the per-image vmap stops at the
        pool-1 relevance and one batched kernel call per word chunk
        finishes the walk to pixels.  The jitted callable is cached on the
        explainer (config is fixed at construction), so repeated callers —
        the serving engine, explain_batch_arrays — share one program."""
        if self._batched_core_jit is None:
            self._batched_core_jit = jax.jit(self._batched_core_fn())
        return self._batched_core_jit

    def _batched_core_fn(self):
        """The unjitted batched program (for batched_core and the shard_map
        wrapper in batched_core_sharded)."""
        if not self._use_block1_kernel():
            def f(params, images):
                return jax.vmap(
                    lambda im: self._explain_core(params, im[None])
                )(images)

            return f

        from ..ops.pallas_block1 import block1_lrp_backward

        def f(params, images):
            (tokens, length, (r_pool, b1), r_words, alpha, preds,
             beta) = jax.vmap(
                lambda im: self._explain_core(
                    params, im[None], cnn_stage=self._upper_cnn_stage)
            )(images)
            # spec indices 0 and 2 hold conv1_1/conv1_2 -> param idx 0, 1
            w1 = params.encoder.convs[0].weight
            w2 = params.encoder.convs[1].weight
            H = images.shape[1]
            rows = 8 if H % 8 == 0 else (4 if H % 4 == 0 else 2)

            def run(rp):
                return block1_lrp_backward(
                    rp, b1["winner"], b1["z2"], b1["a1"], b1["z1c"],
                    b1["image"], w2, w1, rows_per_tile=rows,
                    dot_mode=self.block1_dot_mode)

            T, chunk = self.max_words, self.cnn_word_chunk
            if chunk and T > chunk and T % chunk == 0:
                B = r_pool.shape[0]
                rp = r_pool.reshape(B, T // chunk, chunk,
                                    *r_pool.shape[2:])
                rp = jnp.moveaxis(rp, 1, 0)  # (T//chunk, B, chunk, ...)
                rel = jax.lax.map(run, rp)
                rel = jnp.moveaxis(rel, 0, 1).reshape(
                    B, T, *rel.shape[3:])
            else:
                rel = run(r_pool)
            return (tokens, length, rel, r_words, alpha, preds, beta)

        return f

    def batched_summary_core(self):
        """jitted (params, images) -> (tokens, length, rel_stats, r_words,
        betas) with ``rel_stats`` = per-word (sum, max, min) of the pixel
        relevance, reduced ON DEVICE — the serving summary path: the default
        ``/explain`` response ships only these statistics
        (``serving/service.py:explanation_payload``), so the full
        (B, T, H, W, 3) maps and (T, V) logits never leave HBM.  Cuts the
        per-batch device->host transfer from ~77 MB to ~50 KB at the
        headline shape.  Only defined for cores whose relevance payload is a
        single per-word array (every family except Guided Grad-CAM's
        (guided, cams) pair and the all-heads explainer's per-head axis —
        their postprocessing is host-side)."""
        if self._summary_core_jit is None:
            self._summary_core_jit = jax.jit(self._summary_fn())
        return self._summary_core_jit

    def _summary_fn(self):
        """Unjitted (params, images) -> summary tuple: the batched core
        followed by the on-device per-word (sum, max, min) reduction.
        Guarded to plain-array relevance payloads (see
        batched_summary_core)."""
        if type(self)._postprocess_one is not GridTDExplainerBase._postprocess_one:
            raise ValueError(
                f"{type(self).__name__} has a composite relevance payload; "
                "summary reduction supports the plain-array families only "
                "(lrp / gradient / guided_gradient / grad_cam)")
        core = self._batched_core_fn()

        def f(params, images):
            tokens, length, rel, r_words, _alphas, _preds, betas = core(
                params, images)
            rel = rel.astype(jnp.float32)
            axes = tuple(range(2, rel.ndim))
            stats = jnp.stack(
                [rel.sum(axes), rel.max(axes), rel.min(axes)], axis=-1)
            return tokens, length, stats, r_words, betas

        return f

    def batched_summary_core_packed(self):
        """:meth:`batched_summary_core` with every output leaf raveled and
        concatenated into ONE float32 vector on device.

        Exists for the tunnel-serving path: the unpacked tuple costs the
        service finalize FIVE sequential ``np.asarray`` pulls, and on the
        axon remote backend every pull is a full network round trip — the
        measured bulk of the summary batch interval (bench_serving
        --profile).  One ~50 KB vector is one pull.  int32 leaves (tokens,
        length) cast losslessly: values are bounded by the padded vocab
        (< 2^24).  Use :meth:`summary_leaf_specs` to unpack on host."""
        if self._summary_packed_jit is None:
            base = self._summary_fn()

            def f(params, images):
                leaves = base(params, images)
                return jnp.concatenate(
                    [jnp.ravel(x).astype(jnp.float32) for x in leaves])

            self._summary_packed_jit = jax.jit(f)
        return self._summary_packed_jit

    def summary_leaf_specs(self, images_shape, images_dtype=jnp.float32):
        """(shape, dtype) of each :meth:`batched_summary_core` output leaf
        for a given input batch shape — the host-side unpack schema for the
        packed transfer (no device work: ``jax.eval_shape``)."""
        avals = jax.eval_shape(
            self._summary_fn(), self.params,
            jax.ShapeDtypeStruct(tuple(images_shape), jnp.dtype(images_dtype)))
        return [(tuple(a.shape), np.dtype(a.dtype)) for a in avals]

    def batched_core_sharded(self, mesh, *, data_axis: str = "data"):
        """Data-parallel explanation over a device mesh — the v5e-8 scaling
        path for the north-star throughput metric: images shard over the
        batch axis, params replicate, and each shard runs the full per-image
        program locally under ``shard_map`` with zero cross-device
        communication (structural — see
        parallel.shard_mapped_data_parallel)."""
        from ..parallel import shard_mapped_data_parallel

        return shard_mapped_data_parallel(
            self._batched_core_fn(), mesh, data_axis=data_axis)

    def batched_summary_core_sharded(self, mesh, *, data_axis: str = "data"):
        """Sharded variant of batched_summary_core: the per-word relevance
        reduction runs INSIDE each shard (it is per-image, so it stays
        local), and only the ~KB-scale stats tuple ever leaves the devices —
        the multi-chip serving path (`serving/service.py` mesh mode)."""
        from ..parallel import shard_mapped_data_parallel

        return shard_mapped_data_parallel(
            self._summary_fn(), mesh, data_axis=data_axis)

    # -- public API ------------------------------------------------------
    def _split_caption(self, tokens: np.ndarray, length: int):
        """Host-side caption slicing shared by every postprocess path:
        explained words are positions 1..length-1 of the beam sequence,
        minus the trailing <end> if present."""
        words_ids = tokens[1:length]
        t_count = len(words_ids)
        if t_count and words_ids[-1] == self.word_map.end:
            t_count -= 1
        rev = self.word_map.id_to_word
        caption = [rev.get(int(w), "<unk>") for w in words_ids[:t_count]]
        return caption, t_count

    def _postprocess_one(self, tokens, length, rel_imgs, r_words, alphas,
                         preds, betas, *, img_hw: int | None = None):
        """One image's host arrays (the core's output tuple) -> a
        CaptionExplanation with invalid word positions stripped.  Subclasses
        whose cores emit a different relevance payload (Guided Grad-CAM's
        (guided, cams) pair, the all-heads explainer's head axis) override
        this — both the single-image and batched public APIs route through
        it."""
        length = int(length)
        caption, t_count = self._split_caption(tokens, length)
        return CaptionExplanation(
            caption=caption,
            tokens=tokens[:length],
            relevance_images=rel_imgs[:t_count],
            relevance_words=r_words[:t_count, : t_count + 1],
            alphas=alphas[:t_count],
            predictions=preds[:t_count],
            betas=betas[:t_count],
        )

    def explain_caption_arrays(self, image: np.ndarray):
        """image: (1, H, W, 3) normalized float32.  Returns host arrays with
        invalid word positions stripped."""
        out = self._core(self.params, jnp.asarray(image))
        host = jax.tree_util.tree_map(np.asarray, out)
        return self._postprocess_one(*host, img_hw=int(image.shape[1]))

    def explain_batch_arrays(self, images: np.ndarray):
        """Batched public API: (B, H, W, 3) images (or (B, 36, D) region
        features for the BU path) -> list of per-image CaptionExplanation.

        One dispatch of the cached fixed-shape batched program (the
        north-star throughput path) instead of B single-image dispatches —
        the building block for the serving engine and batch evaluation."""
        return self.explain_batch_finalize(
            self.explain_batch_dispatch(images), images.shape[0])

    def explain_batch_dispatch(self, images: np.ndarray):
        """Launch the batched program without blocking on results: returns
        (device output tree, img_hw).  JAX dispatch is asynchronous, so the
        serving engine can overlap the next batch's dispatch with this one's
        readback (`serving/engine.py` pipeline)."""
        out = self.batched_core()(self.params, jnp.asarray(images))
        img_hw = int(images.shape[1]) if not self.cap.cfg.is_bu else None
        return out, img_hw

    def explain_batch_finalize(self, handle, n: int):
        """Blocking half of explain_batch_dispatch: device→host transfer +
        per-image postprocess for the first ``n`` rows (pad rows dropped)."""
        out, img_hw = handle
        host = jax.tree_util.tree_map(np.asarray, out)
        return [
            self._postprocess_one(
                *jax.tree_util.tree_map(lambda a: a[i], host), img_hw=img_hw)
            for i in range(n)
        ]

    def explain_caption(
        self, img_filepath: str, *, save_path: str | None = None,
        t_list=None, height: int = 224, width: int = 224,
    ):
        """File-based API with heatmap + YAML outputs (reference
        explain_caption, gridTDmodel.py:1141-1156)."""
        from ..data.dataset import load_image

        image = load_image(img_filepath, height, width)[None]
        exp = self.explain_caption_arrays(image)
        if save_path is not None:
            self.save_outputs(exp, img_filepath, save_path, t_list=t_list)
        return exp.relevance_images, exp.relevance_words

    def save_outputs(self, exp: CaptionExplanation, img_filepath: str,
                     save_path: str, *, t_list=None):
        """Heatmap grid JPG + YAML linguistic explanation
        (gridTDmodel.py:1158-1211)."""
        import yaml
        from PIL import Image

        from ..utils.viz import gamma_correction, heatmap_rgb

        name = os.path.splitext(os.path.basename(img_filepath))[0]
        out_dir = os.path.join(save_path, name)
        os.makedirs(out_dir, exist_ok=True)
        words = ["<start>"] + exp.caption
        ling = []
        for t in range(len(exp.caption)):
            rel_t = exp.relevance_words[t]
            ling.append({exp.caption[t]: [
                {words[i]: float(rel_t[i])} for i in range(t + 1)
            ]})
        with open(os.path.join(out_dir,
                               f"{self.EX_TYPE}_linguistic_explanation.yaml"),
                  "w") as f:
            yaml.safe_dump(ling, f)

        rel = exp.relevance_images
        if rel.ndim == 2:
            # Grad-CAM style: (T, P) grid maps — pyramid-expand to image size
            # and alpha-blend like the reference's visuallize_attention
            # (LRPtools/utils.py:150-171, blend 0.6; gridTDmodel.py:1772-1791)
            from ..utils.viz import upscale_attention

            hw = int(np.sqrt(rel.shape[1]))
            upscale = 224 // hw
            img = Image.open(img_filepath).convert("RGB").resize(
                (hw * upscale, hw * upscale))
            import matplotlib.cm as cm

            for t in range(len(exp.caption)):
                att = upscale_attention(rel[t], (hw, hw), upscale=upscale)
                att = np.clip(att, 0.0, 1.0)
                hm = cm.get_cmap("jet")(att)[..., :3]
                blend = Image.blend(
                    img, Image.fromarray(np.uint8(hm * 255)), 0.6)
                if t_list is None or t in (t_list or []):
                    blend.save(os.path.join(
                        out_dir, f"{t}_{self.EX_TYPE}_{exp.caption[t]}.jpg"))
            return out_dir

        img = Image.open(img_filepath).convert("RGB").resize(
            (rel.shape[2], rel.shape[1])
        )
        for t in range(len(exp.caption)):
            hm = gamma_correction(rel[t][None])
            hm = heatmap_rgb(hm)[0]
            blend = Image.blend(img, Image.fromarray(np.uint8(hm * 255)), 1.0)
            if t_list is None or t in (t_list or []):
                blend.save(os.path.join(
                    out_dir, f"{t}_{self.EX_TYPE}_{exp.caption[t]}.jpg"))
        return out_dir




class GridTDLrpExplainer(GridTDExplainerBase):
    """LRP explainer (reference ExplainGridTDAttention, gridTDmodel.py:705)."""

    EX_TYPE = "lrp"

    def _decoder_walk(self, params, feats, stash, targets):
        return explain_all_words(
            params.decoder, feats, stash, targets=targets, bu=self.cap.cfg.is_bu
        )

    def _cnn_stage(self, params, image, word_exp):
        backward = self._lrp_backward_factory(params, image)
        return self._map_words_lrp(backward, self._grid_seeds(word_exp),
                                   params=params)


class AOALrpExplainer(GridTDExplainerBase):
    """Per-head LRP explainer for the AoA model (ExplainAOAAttention,
    aoamodel.py:748-1255).  The reference explains one attention head at a
    time (``explain_caption(img, head_idx)``, aoamodel.py:1165); pass
    ``head_idx`` here.  Decode defaults follow its get_hidden_parameters
    (beam=3, max 20, aoamodel.py:993-995)."""

    EX_TYPE = "lrp"

    def __init__(self, captioner, params, word_map, *, head_idx: int = 0,
                 beam_size: int = 3, max_words: int = 20,
                 language_double_bias_i: bool | None = None, **kw):
        self.head_idx = head_idx
        super().__init__(
            captioner, params, word_map, beam_size=beam_size,
            max_words=max_words, language_double_bias_i=language_double_bias_i,
            **kw,
        )

    def _make_stash(self, params, feats, tokens_in):
        from .aoa_lrp import stash_forward as aoa_stash

        return aoa_stash(
            params.decoder, feats, tokens_in,
            num_head=self.cap.cfg.num_head,
            language_double_bias_i=self.quirk,
        )

    def _decoder_walk(self, params, feats, stash, targets):
        from .aoa_lrp import explain_all_words as aoa_explain

        return aoa_explain(
            params.decoder, feats, stash, targets=targets,
            head_idx=jnp.asarray(self.head_idx),
            num_head=self.cap.cfg.num_head, bu=self.cap.cfg.is_bu,
        )

    def _cnn_stage(self, params, image, word_exp):
        backward = self._lrp_backward_factory(params, image)
        return self._map_words_lrp(backward, self._grid_seeds(word_exp),
                                   params=params)


class AOAAllHeadsLrpExplainer(AOALrpExplainer):
    """All attention heads explained in ONE compiled program.

    The reference explains one head per full run (``explain_caption(img,
    head_idx)``, aoamodel.py:1165) — beam decode, stash forward and the CNN
    forward stash are recomputed ``num_head`` times.  Here the per-head
    relevance walk is a ``vmap`` over ``head_idx`` (already a traced array
    in the walk) sharing one beam/stash/CNN-stash; the CNN backward runs
    over heads x words through the same chunked path.  Output arrays carry
    a leading head axis; :meth:`explain_caption_arrays` returns one
    CaptionExplanation per head (same caption, per-head relevances)."""

    def _use_block1_kernel(self):
        return False  # the batched block-1 split assumes per-word seeds

    def _decoder_walk(self, params, feats, stash, targets):
        from .aoa_lrp import explain_all_words as aoa_explain

        return jax.vmap(
            lambda h: aoa_explain(
                params.decoder, feats, stash, targets=targets, head_idx=h,
                num_head=self.cap.cfg.num_head, bu=self.cap.cfg.is_bu,
            )
        )(jnp.arange(self.cap.cfg.num_head))

    def _cnn_stage(self, params, image, word_exp):
        nh = self.cap.cfg.num_head
        hw = int(np.sqrt(self.cap.cfg.num_pixels))
        seeds = word_exp.r_img_feature.reshape(
            nh * self.max_words, hw, hw, self.cap.raw_dim)
        backward = self._lrp_backward_factory(params, image)
        rel = self._map_words(lambda r: backward(r[None])[0], seeds)
        return rel.reshape(nh, self.max_words, *rel.shape[1:])

    def _map_words(self, fn, seeds):
        # head x word axis: chunk over the flattened leading dim
        chunk = self.cnn_word_chunk
        n = seeds.shape[0]
        if chunk and n > chunk and n % chunk == 0:
            seeds_r = seeds.reshape(n // chunk, chunk, *seeds.shape[1:])
            out = jax.lax.map(lambda s: jax.vmap(fn)(s), seeds_r)
            return out.reshape(n, *out.shape[2:])
        return jax.vmap(fn)(seeds)

    def _postprocess_one(self, tokens, length, rel_imgs, r_words, alphas,
                         preds, betas, *, img_hw=None):
        """Returns a LIST of per-head CaptionExplanation (shared caption)."""
        length = int(length)
        caption, t_count = self._split_caption(tokens, length)
        return [
            CaptionExplanation(
                caption=caption,
                tokens=tokens[:length],
                relevance_images=rel_imgs[h, :t_count],
                relevance_words=r_words[h, :t_count, : t_count + 1],
                alphas=alphas[:t_count],
                predictions=preds[:t_count],
                betas=betas[:t_count],
            )
            for h in range(self.cap.cfg.num_head)
        ]


class AOAGradientExplainer(AOALrpExplainer):
    """AoA plain-gradient explainer (ExplainAOAGradient, aoamodel.py:1257)."""

    EX_TYPE = "gradient"
    GUIDED = False
    DEFAULT_QUIRK = False  # aoamodel.py:1298 uses correct biases

    def _decoder_walk(self, params, feats, stash, targets):
        from .aoa_gradient import gradient_all_words as aoa_grad

        return aoa_grad(
            params.decoder, feats, stash, targets=targets,
            head_idx=jnp.asarray(self.head_idx),
            num_head=self.cap.cfg.num_head, guided=self.GUIDED,
        )

    def _cnn_stage(self, params, image, word_exp):
        seeds = self._grid_seeds(word_exp)
        return self._map_words(
            lambda d: self._plain_gradient(params, image, d[None])[0], seeds
        )


class AOAGuidedGradientExplainer(AOAGradientExplainer):
    """AoA guided backprop (ExplainAOAGuidedGradient, aoamodel.py:1594)."""

    EX_TYPE = "GuidedBackpropagate"
    GUIDED = True

    def _cnn_stage(self, params, image, word_exp):
        seeds = self._grid_seeds(word_exp)
        backward = self._guided_backward_factory(params, image)
        return self._map_words(lambda d: backward(d[None])[0], seeds)


class AOAGradCamExplainer(AOAGradientExplainer):
    """AoA Grad-CAM (ExplainAOAGradCam, aoamodel.py:1669)."""

    EX_TYPE = "GradCam"

    def _cnn_stage(self, params, image, word_exp):
        feats = self.cap.encode(params, image)
        return jax.vmap(lambda d: grad_cam(feats.raw[0], d))(word_exp.r_img_feature)


class GuidedGradCamMixin:
    """Shared Guided Grad-CAM machinery: guided-backprop pixel gradients
    multiplied on host by the pyramid-expanded CAM (the reference pattern at
    gridTDmodel.py:1812-1833, aoamodel.py:1714+, adaptiveattention.py:1261+)."""

    EX_TYPE = "GuidedGradCam"

    def _cnn_stage(self, params, image, word_exp):
        seeds = self._grid_seeds(word_exp)
        backward = self._guided_backward_factory(params, image)
        guided = self._map_words(lambda d: backward(d[None])[0], seeds)
        feats = self.cap.encode(params, image)
        cams = jax.vmap(lambda d: grad_cam(feats.raw[0], d))(word_exp.r_img_feature)
        return guided, cams

    def _postprocess_one(self, tokens, length, rel, r_words, alphas, preds,
                         betas, *, img_hw=None):
        guided, cams = rel  # the core's relevance payload is a pair here
        from ..utils.viz import upscale_attention

        hw = int(np.sqrt(self.cap.cfg.num_pixels))
        upscale = (img_hw or guided.shape[1]) // hw
        expanded = np.stack([
            upscale_attention(c, (hw, hw), upscale=upscale, sigma=20.0)
            for c in cams
        ])
        rel_imgs = guided * expanded[..., None]
        length = int(length)
        caption, t_count = self._split_caption(tokens, length)
        return CaptionExplanation(
            caption=caption,
            tokens=tokens[:length],
            relevance_images=rel_imgs[:t_count],
            relevance_words=r_words[:t_count, : t_count + 1],
            alphas=alphas[:t_count],
            predictions=preds[:t_count],
            betas=betas[:t_count],
        )


class AOAGuidedGradCamExplainer(GuidedGradCamMixin, AOAGuidedGradientExplainer):
    """AoA Guided Grad-CAM (ExplainAOAGuidedGradCam, aoamodel.py:1714)."""





class AdaptiveLrpExplainer(GridTDExplainerBase):
    """LRP explainer for the adaptive model (ExplainAdaptiveAttention,
    adaptiveattention.py:491; decode beam=3 max 20 per its
    get_hidden_parameters, adaptiveattention.py:628)."""

    EX_TYPE = "lrp"

    def __init__(self, captioner, params, word_map, *, beam_size: int = 3,
                 max_words: int = 20, language_double_bias_i: bool | None = None,
                 **kw):
        super().__init__(captioner, params, word_map, beam_size=beam_size,
                         max_words=max_words,
                         language_double_bias_i=language_double_bias_i, **kw)

    def _make_stash(self, params, feats, tokens_in):
        from .adaptive_lrp import stash_forward as ada_stash

        return ada_stash(params.decoder, feats, tokens_in)

    def _decoder_walk(self, params, feats, stash, targets):
        from .adaptive_lrp import explain_all_words as ada_explain

        return ada_explain(params.decoder, feats, stash, targets=targets)

    def _cnn_stage(self, params, image, word_exp):
        backward = self._lrp_backward_factory(params, image)
        return self._map_words_lrp(backward, self._grid_seeds(word_exp),
                                   params=params)


class AdaptiveGradientExplainer(AdaptiveLrpExplainer):
    """ExplainAdaptiveGradient (adaptiveattention.py:851)."""

    EX_TYPE = "gradient"
    GUIDED = False

    def _decoder_walk(self, params, feats, stash, targets):
        from .adaptive_lrp import gradient_all_words as ada_grad

        return ada_grad(params.decoder, feats, stash, targets=targets,
                        guided=self.GUIDED)

    def _cnn_stage(self, params, image, word_exp):
        seeds = self._grid_seeds(word_exp)
        return self._map_words(
            lambda d: self._plain_gradient(params, image, d[None])[0], seeds
        )


class AdaptiveGuidedGradientExplainer(AdaptiveGradientExplainer):
    """ExplainiAdaptiveGuidedGradient (adaptiveattention.py:1098)."""

    EX_TYPE = "GuidedBackpropagate"
    GUIDED = True

    def _cnn_stage(self, params, image, word_exp):
        seeds = self._grid_seeds(word_exp)
        backward = self._guided_backward_factory(params, image)
        return self._map_words(lambda d: backward(d[None])[0], seeds)


class AdaptiveGradCamExplainer(AdaptiveGradientExplainer):
    """ExplainAdaptiveGradCam (adaptiveattention.py:1218)."""

    EX_TYPE = "GradCam"

    def _cnn_stage(self, params, image, word_exp):
        feats = self.cap.encode(params, image)
        return jax.vmap(lambda d: grad_cam(feats.raw[0], d))(word_exp.r_img_feature)


class AdaptiveGuidedGradCamExplainer(GuidedGradCamMixin,
                                     AdaptiveGuidedGradientExplainer):
    """ExplainAdaptiveGuidedGradCam (adaptiveattention.py:1261)."""


class GridTDGradientExplainer(GridTDExplainerBase):
    """Plain gradient explainer (ExplainGridTDGradient, gridTDmodel.py:1214):
    manual decoder backward (with its documented approximations) + true CNN
    input gradient."""

    EX_TYPE = "gradient"
    GUIDED = False
    DEFAULT_QUIRK = False  # gradient explainers use correct biases

    def _decoder_walk(self, params, feats, stash, targets):
        return gradient_all_words(
            params.decoder, feats, stash, targets=targets,
            guided=self.GUIDED, bu=self.cap.cfg.is_bu,
        )

    def _cnn_stage(self, params, image, word_exp):
        seeds = self._grid_seeds(word_exp)
        return self._map_words(
            lambda d: self._plain_gradient(params, image, d[None])[0], seeds
        )


class GridTDGuidedGradientExplainer(GridTDGradientExplainer):
    """Guided backprop (ExplainiGridTDGuidedGradient, gridTDmodel.py:1585)."""

    EX_TYPE = "GuidedBackpropagate"
    GUIDED = True

    def _cnn_stage(self, params, image, word_exp):
        seeds = self._grid_seeds(word_exp)
        backward = self._guided_backward_factory(params, image)
        return self._map_words(lambda d: backward(d[None])[0], seeds)


class GridTDGradCamExplainer(GridTDGradientExplainer):
    """Grad-CAM over the 14x14 feature grid (ExplainGridTDGradCam,
    gridTDmodel.py:1752): relevance_images are per-word normalized CAMs of
    shape (T, P) — rendered via attention-style upscaling, not pixel space."""

    EX_TYPE = "GradCam"

    def _cnn_stage(self, params, image, word_exp):
        feats = self.cap.encode(params, image)
        grid = feats.raw[0]  # (P, C)
        return jax.vmap(
            lambda d: grad_cam(grid, d)
        )(word_exp.r_img_feature)


class GridTDGuidedGradCamExplainer(GuidedGradCamMixin,
                                   GridTDGuidedGradientExplainer):
    """Guided Grad-CAM (ExplainGridTDGuidedGradCam, gridTDmodel.py:1796):
    guided-backprop pixel gradients multiplied on host by the
    pyramid-expanded CAM (upscale=16, host-side by design, matching
    gridTDmodel.py:1824-1828)."""
