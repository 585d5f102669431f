"""Model-facing serving services: batched caption decode and batched
caption+explanation, each behind a :class:`~.engine.BatchingEngine`.

Both services own ONE jitted fixed-shape program (compiled for
``batch_size``); partial batches are padded by repeating the first request's
input — identical work for the device, outputs of pad rows dropped — so a
single compiled executable serves every load level (full-size TPU compiles
take minutes through the remote helper; a bucket ladder would multiply that).

The decode surface matches the reference's eval entry (``test.py:71-79``:
greedy / beam; bad-ending stripping per ``gridTDmodel.py:21``/``aoamodel.py:22``)
and the explanation surface is the explainer family built by
``explain.build_explainer`` — the full per-word LRP/gradient/CAM pipeline as
one program (``explain/explainer.py``).
"""

from __future__ import annotations

import base64

import jax
import numpy as np

from ..data.vocab import bad_endings_for, decode_to_words
from .engine import BatchingEngine


def _pad_batch(arrays: list[np.ndarray], batch: int) -> np.ndarray:
    """Stack request payloads into one fixed-shape batch.

    A pure-uint8 batch stays uint8 — raw pixels ship 4x smaller to the
    device and ImageNet-normalize there (models.captioner.prepare_visual;
    measured 1036 -> 280 ms per batch-32 224^2 upload).  A batch mixing
    uint8 and float requests normalizes the uint8 entries on host so one
    float32 program serves it."""
    if any(a.dtype == np.uint8 for a in arrays) and not all(
            a.dtype == np.uint8 for a in arrays):
        from ..data.dataset import normalize_image

        arrays = [normalize_image(a) if a.dtype == np.uint8 else a
                  for a in arrays]
    stacked = np.stack(arrays)
    if len(arrays) < batch:
        pad = np.repeat(stacked[:1], batch - len(arrays), axis=0)
        stacked = np.concatenate([stacked, pad], axis=0)
    return stacked


class _ServiceBase:
    """Shared input validation + engine plumbing.

    Services implement the two-phase batch callback (``_dispatch_batch``
    pads + launches the jitted program — JAX dispatch is asynchronous;
    ``_finalize_batch`` blocks on the device→host transfer and renders
    results) so the engine overlaps up to ``pipeline_depth`` batches: the
    round-trip latency of the remote-tunnel device (~400 ms/dispatch) then
    amortizes over the in-flight window instead of serializing per batch
    (measured sweep in docs/SERVING.md).

    ``mesh`` (a jax.sharding.Mesh) turns the service data-parallel: each
    dispatch shards its batch rows over the mesh's ``data_axis`` and runs
    the same per-image program shard-locally under ``shard_map`` with zero
    collectives (parallel.shard_mapped_data_parallel) — the v5e-8 serving
    path; ``batch_size`` must divide by the axis size."""

    def __init__(self, captioner, *, batch_size: int, max_delay_s: float,
                 name: str, pipeline_depth: int = 2, mesh=None,
                 data_axis: str = "data"):
        cfg = captioner.cfg
        self.cap = captioner
        self.batch_size = batch_size
        self.mesh = mesh
        self.data_axis = data_axis
        if mesh is not None:
            n_shards = mesh.shape[data_axis]
            if batch_size % n_shards:
                raise ValueError(
                    f"batch_size={batch_size} must divide evenly over the "
                    f"{n_shards}-way {data_axis!r} mesh axis")
        if cfg.is_bu:
            self.input_shape = (36, cfg.bu_feat_dim)
        else:
            self.input_shape = (cfg.height, cfg.width, 3)
        self.engine = BatchingEngine(
            None, batch_size, max_delay_s=max_delay_s, name=name,
            dispatch=self._dispatch_batch, finalize=self._finalize_batch,
            pipeline_depth=pipeline_depth)

    # lifecycle
    def start(self):
        self.engine.start()
        return self

    def stop(self):
        self.engine.stop()

    def stats(self) -> dict:
        return self.engine.stats()

    def _check(self, image: np.ndarray) -> np.ndarray:
        image = np.asarray(image)
        # uint8 = raw pixels (normalized on device); everything else is the
        # reference's host-normalized float input.  BU region features are
        # always float.
        if image.dtype != np.uint8 or len(self.input_shape) != 3:
            image = image.astype(np.float32)
        if image.shape != self.input_shape:
            raise ValueError(
                f"expected input shape {self.input_shape}, got {image.shape}")
        return image

    def submit(self, image: np.ndarray):
        """Enqueue one request; returns a concurrent.futures.Future."""
        return self.engine.submit(self._check(image))

    def __call__(self, image: np.ndarray):
        """Blocking single-request convenience."""
        return self.submit(image).result()

    def warmup(self, dtypes: tuple = ("float32",)) -> None:
        """Compile the program before taking traffic (one dummy batch per
        input dtype — uint8 requests run a separate specialization, so pass
        ``("float32", "uint8")`` when clients send raw pixels)."""
        for dt in dtypes:
            dummy = [np.zeros(self.input_shape, dt)] * self.batch_size
            self._run_batch(dummy)

    def _run_batch(self, payloads: list[np.ndarray]) -> list:
        """Synchronous composition of the two phases (warmup, direct use)."""
        return self._finalize_batch(self._dispatch_batch(payloads), payloads)

    def _dispatch_batch(self, payloads: list[np.ndarray]):
        raise NotImplementedError

    def _finalize_batch(self, handle, payloads: list[np.ndarray]) -> list:
        raise NotImplementedError


class CaptionService(_ServiceBase):
    """Batched caption decode: images (or BU region features) -> word lists.

    ``decode='beam'`` (default, beam_size per the reference's eval default)
    runs the vmapped fixed-shape beam search; ``'greedy'`` the batched greedy
    scan.  Bad trailing function words are stripped like the reference's
    eval path (``remove_bad_endings`` semantics via decode_to_words +
    bad_endings_for)."""

    def __init__(self, captioner, params, word_map, *, batch_size: int = 8,
                 decode: str = "beam", beam_size: int = 3,
                 max_cap_length: int = 20, max_delay_s: float = 0.005,
                 strip_bad_endings: bool = True, pipeline_depth: int = 2,
                 mesh=None, data_axis: str = "data"):
        super().__init__(captioner, batch_size=batch_size,
                         max_delay_s=max_delay_s, name="caption",
                         pipeline_depth=pipeline_depth, mesh=mesh,
                         data_axis=data_axis)
        if decode not in ("beam", "greedy"):
            raise ValueError(f"decode must be 'beam' or 'greedy', got {decode!r}")
        self.params = params
        self.word_map = word_map
        self.decode = decode
        self.bad_endings = (
            set(bad_endings_for(captioner.cfg.model_type))
            if strip_bad_endings else set())
        cap = captioner

        def core(params, images):
            feats = cap.encode(params, images)
            if decode == "greedy":
                res = cap.greedy(params, feats, word_map,
                                 max_cap_length=max_cap_length)
                return res.tokens
            res = cap.beam_search_batch(params, feats, word_map,
                                        beam_size=beam_size,
                                        max_cap_length=max_cap_length)
            return res.tokens, res.length

        if mesh is not None:
            from ..parallel import shard_mapped_data_parallel
            self._core = shard_mapped_data_parallel(
                core, mesh, data_axis=data_axis)
        else:
            self._core = jax.jit(core)

    def _words(self, ids: np.ndarray) -> list[str]:
        words = decode_to_words(list(ids), self.word_map)
        # remove_bad_endings semantics (gridTDmodel.py:284-302): keep the
        # original if trimming would empty the sentence
        trimmed = list(words)
        while trimmed and trimmed[-1] in self.bad_endings:
            trimmed.pop()
        return trimmed if trimmed else words

    def _dispatch_batch(self, payloads):
        return self._core(self.params, _pad_batch(payloads, self.batch_size))

    def _finalize_batch(self, out, payloads):
        k = len(payloads)
        if self.decode == "greedy":
            tokens = np.asarray(out)
            return [{"caption": self._words(tokens[i])} for i in range(k)]
        tokens, length = (np.asarray(x) for x in out)
        return [
            {"caption": self._words(tokens[i, : int(length[i])]),
             "length": int(length[i])}
            for i in range(k)
        ]


class ExplainService(_ServiceBase):
    """Batched caption + per-word explanation: one dispatch of the
    explainer's cached fixed-shape batched program per coalesced batch.

    ``payload="full"`` results are CaptionExplanation (or a per-head list
    for the all-heads explainer) — every array on host, rendered by
    :func:`explanation_payload`.

    ``payload="summary"`` runs the explainer's device-side reduction
    (``batched_summary_core``): per-word relevance (sum, max, min) computed
    ON DEVICE, so the (B, T, H, W, 3) maps never transfer — results are the
    JSON dicts :func:`explanation_payload` would produce for
    ``include_relevance=False`` (same schema/values), at a fraction of the
    device->host traffic.  Requests for raw maps can't be served in this
    mode (the HTTP layer rejects ``include_relevance`` with a 400)."""

    def __init__(self, explainer, *, batch_size: int = 8,
                 max_delay_s: float = 0.005, payload: str = "full",
                 pipeline_depth: int = 2, mesh=None,
                 data_axis: str = "data", packed_transfer: bool | None = None):
        super().__init__(explainer.cap, batch_size=batch_size,
                         max_delay_s=max_delay_s, name="explain",
                         pipeline_depth=pipeline_depth, mesh=mesh,
                         data_axis=data_axis)
        if payload not in ("full", "summary"):
            raise ValueError(
                f"payload must be 'full' or 'summary', got {payload!r}")
        self.explainer = explainer
        self.payload = payload
        # packed_transfer: ship the summary outputs as ONE flat f32 vector
        # -> ONE device->host pull per batch instead of five sequential
        # round trips (each a full network RTT on the axon tunnel — the
        # measured bulk of the summary batch interval, bench_serving
        # --profile).  None = auto: on for single-device summary serving;
        # the mesh path keeps per-leaf outputs (out_specs shard the batch
        # axis; a flat concat has none).
        self.packed_transfer = (payload == "summary" and mesh is None
                                if packed_transfer is None
                                else bool(packed_transfer))
        if self.packed_transfer and payload != "summary":
            # mirror the mesh guard: an explicit request that can't take
            # effect is an error, not a silent no-op (full payloads ship
            # the (B,T,H,W,3) maps — there is no packed form to build)
            raise ValueError("packed_transfer requires payload='summary' "
                             "(full payloads have no packed single-transfer "
                             "form)")
        if self.packed_transfer and mesh is not None:
            raise ValueError("packed_transfer is single-device only (the "
                             "sharded summary core shards the batch axis)")
        self._full_core = (
            explainer.batched_core_sharded(mesh, data_axis=data_axis)
            if mesh is not None and payload == "full" else None)
        if payload == "summary":
            # raises for composite-payload families (guided_grad_cam,
            # lrp_all_heads) — fail at construction, not first request
            self._summary_core = (
                explainer.batched_summary_core_sharded(
                    mesh, data_axis=data_axis)
                if mesh is not None else explainer.batched_summary_core())
            if self.packed_transfer:
                self._packed_core = explainer.batched_summary_core_packed()
                self._leaf_specs: dict = {}

    def _dispatch_batch(self, payloads):
        images = _pad_batch(payloads, self.batch_size)
        if self.payload == "full":
            if self._full_core is not None:
                out = self._full_core(self.explainer.params, images)
                img_hw = (int(images.shape[1])
                          if not self.cap.cfg.is_bu else None)
                return out, img_hw
            return self.explainer.explain_batch_dispatch(images)
        if self.packed_transfer:
            key = (images.shape, str(images.dtype))
            if key not in self._leaf_specs:
                self._leaf_specs[key] = self.explainer.summary_leaf_specs(
                    images.shape, images.dtype)
            return key, self._packed_core(self.explainer.params, images)
        return self._summary_core(self.explainer.params, images)

    def _unpack_summary(self, key, flat: np.ndarray):
        """Split the packed f32 vector back into the summary leaves (host
        side; int leaves round-trip exactly — values < 2^24)."""
        leaves, off = [], 0
        for shape, dtype in self._leaf_specs[key]:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            chunk = flat[off:off + n].reshape(shape)
            if np.issubdtype(dtype, np.integer):
                chunk = np.rint(chunk).astype(dtype)
            else:
                chunk = chunk.astype(dtype)
            leaves.append(chunk)
            off += n
        assert off == flat.size, (off, flat.size)
        return leaves

    def _finalize_batch(self, handle, payloads):
        k = len(payloads)
        if self.payload == "full":
            return self.explainer.explain_batch_finalize(handle, k)
        if self.packed_transfer:
            key, flat = handle
            tokens, length, stats, r_words, betas = self._unpack_summary(
                key, np.asarray(flat))
        else:
            tokens, length, stats, r_words, betas = (
                np.asarray(x) for x in handle)
        return [
            self._summary_result(tokens[i], int(length[i]), stats[i],
                                 r_words[i], betas[i])
            for i in range(k)
        ]

    def _summary_result(self, tokens, length, stats, r_words, betas) -> dict:
        """Mirror explanation_payload(include_relevance=False) exactly."""
        _caption, t = self.explainer._split_caption(tokens, length)
        return {
            "caption": _caption,
            "tokens": [int(x) for x in tokens[:length]],
            "relevance_words": np.asarray(
                r_words[:t, : t + 1], np.float32).tolist(),
            "betas": np.asarray(betas[:t], np.float32).tolist(),
            "relevance_stats": {
                "sum": stats[:t, 0].tolist(),
                "max": stats[:t, 1].tolist(),
                "min": stats[:t, 2].tolist(),
            },
        }


def _b64(arr: np.ndarray) -> dict:
    arr = np.ascontiguousarray(arr, np.float32)
    return {"b64": base64.b64encode(arr.tobytes()).decode("ascii"),
            "shape": list(arr.shape), "dtype": "float32"}


def explanation_payload(exp, *, include_relevance: bool = False) -> dict:
    """JSON-friendly rendering of a CaptionExplanation (or per-head list).

    Full relevance maps are large ((T, H, W, 3) float32); by default only
    per-word summary statistics ship, ``include_relevance=True`` adds the
    raw arrays as base64 float32 (shape-tagged)."""
    if isinstance(exp, list):  # all-heads explainer: one entry per head
        return {"heads": [
            explanation_payload(e, include_relevance=include_relevance)
            for e in exp
        ]}
    rel = np.asarray(exp.relevance_images, np.float32)
    axes = tuple(range(1, rel.ndim))
    out = {
        "caption": exp.caption,
        "tokens": [int(t) for t in exp.tokens],
        "relevance_words": np.asarray(exp.relevance_words, np.float32).tolist(),
        "betas": np.asarray(exp.betas, np.float32).tolist(),
        "relevance_stats": {
            "sum": np.sum(rel, axis=axes).tolist(),
            "max": (np.max(rel, axis=axes).tolist() if rel.size else []),
            "min": (np.min(rel, axis=axes).tolist() if rel.size else []),
        },
    }
    if include_relevance:
        out["relevance_images"] = _b64(rel)
        out["alphas"] = _b64(np.asarray(exp.alphas))
    return out
