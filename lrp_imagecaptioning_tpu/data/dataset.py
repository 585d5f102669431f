"""Host-side data pipeline producing fixed-shape padded batches.

Replaces the reference's ``dataset/dataloader.py`` (``ImagecapDataset:9``,
``ImagecapDatasetFromFeature:63``).  TPU-first differences:

- every batch is a fixed-shape NumPy struct (static shapes for XLA; the
  reference pads captions already, we additionally fix the batch dimension by
  dropping the trailing partial batch in training and padding+masking in eval),
- images are decoded/normalized on host into float32 NCHW->NHWC arrays,
- train items are one per (image, caption) pair with all reference captions
  attached (dataloader.py:33-44); val/test items are one per image
  (dataloader.py:46-58).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from .vocab import WordMap, build_word_map, encode_caption

# ImageNet normalization used by every reference transform (train.py:21-22).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_image(img_uint8: np.ndarray) -> np.ndarray:
    """uint8 HWC [0,255] -> float32 HWC normalized."""
    x = img_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def load_image(path: str, height: int, width: int, *,
               normalize: bool = True) -> np.ndarray:
    """Decode + resize + normalize one image to float32 (H, W, 3).

    ``normalize=False`` returns the raw uint8 pixels instead: the TPU-first
    input pipeline ships uint8 to the device (4x fewer host->device bytes —
    measured 1036 -> ~260 ms per batch-32 224^2 upload on the axon tunnel)
    and ImageNet normalization runs on device inside the jitted step
    (``models.captioner.prepare_visual``), where XLA fuses it into the first
    conv's input processing."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((width, height))
        arr = np.asarray(im, dtype=np.uint8)
    return normalize_image(arr) if normalize else arr


@dataclass
class CaptionBatch:
    """Fixed-shape training batch."""

    images: np.ndarray  # (B, H, W, 3) float32 (uint8 with uint8_images=True),
    #                     or (B, 36, 2048) for BU features
    captions: np.ndarray  # (B, L) int32 — <start> w... <end> <pad>*
    all_captions: np.ndarray  # (B, C, L) int32 — every reference caption
    caption_lengths: np.ndarray  # (B,) int32


@dataclass
class EvalBatch:
    """Per-image eval batch (reference val/test protocol, batch of images)."""

    images: np.ndarray  # (B, H, W, 3) or (B, 36, 2048)
    all_captions: np.ndarray  # (B, C, L) int32
    caption_lengths: np.ndarray  # (B, C) int32
    filenames: list[str]
    valid: np.ndarray  # (B,) bool — False rows are padding


class CaptionDataset:
    """Reads the per-split JSON item lists written by :mod:`prepare` (same
    schema as the reference artifacts) and yields fixed-shape batches."""

    def __init__(
        self,
        items: list[dict],
        split: str,
        *,
        height: int = 224,
        width: int = 224,
        from_features: bool = False,
        feature_key: str = "image_features",
        num_regions: int = 36,
        feat_dim: int = 2048,
        seed: int = 0,
        uint8_images: bool = False,
    ):
        self.items = items
        self.split = split
        self.height, self.width = height, width
        self.from_features = from_features
        self.feature_key = feature_key
        self.num_regions = num_regions
        self.feat_dim = feat_dim
        # ship raw uint8 pixels and normalize on device (prepare_visual):
        # 4x fewer host->device bytes per batch.  Only applies to
        # file-loaded images; in-memory "image_array" items pass through
        # with their own dtype (the synthetic corpora are generated directly
        # in the normalized scale and stay float32).
        self.uint8_images = uint8_images
        self.rng = np.random.default_rng(seed)

    @classmethod
    def from_json(cls, json_path: str, split: str, **kw) -> "CaptionDataset":
        with open(json_path) as f:
            items = json.load(f)
        return cls(items, split, **kw)

    def __len__(self) -> int:
        return len(self.items)

    def _load_visual(self, item: dict) -> np.ndarray:
        path = item["image_path"]
        if "image_array" in item:  # toy/in-memory datasets (either path)
            arr = np.asarray(item["image_array"])
            return arr if arr.dtype == np.uint8 else arr.astype(np.float32)
        if self.from_features:
            # BU path: per-image HDF5 with (<=36, 2048) region features,
            # zero-padded to 36 rows (dataloader.py:80-96).
            import h5py

            feat_path = item.get("feature_path", os.path.splitext(path)[0] + ".hdf5")
            with h5py.File(feat_path, "r") as f:
                feats = np.asarray(f[self.feature_key], dtype=np.float32)
            out = np.zeros((self.num_regions, self.feat_dim), dtype=np.float32)
            out[: min(len(feats), self.num_regions)] = feats[: self.num_regions]
            return out
        return load_image(path, self.height, self.width,
                          normalize=not self.uint8_images)

    def train_batches(
        self, batch_size: int, *, shuffle: bool = True, drop_remainder: bool = True
    ) -> Iterator[CaptionBatch]:
        order = np.arange(len(self.items))
        if shuffle:
            self.rng.shuffle(order)
        n_full = len(order) // batch_size if drop_remainder else -(-len(order) // batch_size)
        for b in range(n_full):
            idx = order[b * batch_size : (b + 1) * batch_size]
            items = [self.items[i] for i in idx]
            images = np.stack([self._load_visual(it) for it in items])
            captions = np.asarray([it["encoded_cap"] for it in items], dtype=np.int32)
            all_caps = np.asarray(
                [it["encoded_all_caps"] for it in items], dtype=np.int32
            )
            caplens = np.asarray([it["caption_len"] for it in items], dtype=np.int32)
            yield CaptionBatch(images, captions, all_caps, caplens)

    def train_batches_prefetched(
        self, batch_size: int, *, prefetch: int = 2, transform=None,
        workers: int = 1, **kw
    ) -> Iterator[CaptionBatch]:
        """``train_batches`` with a background decode thread so host image
        decode overlaps device compute (the reference leans on DataLoader
        workers, train.py:40-44; here one producer thread + a bounded queue).

        ``transform`` runs on each batch INSIDE the producer thread — passing
        a device_put closure there overlaps the host->device upload with the
        consumer's step dispatch (double-buffered input pipeline).

        ``workers > 1`` runs up to that many ``transform`` calls CONCURRENTLY
        (a dispatcher thread decodes batches in order and submits them to a
        thread pool; the consumer resolves futures in order, so epoch
        semantics are unchanged).  This is the serving pipeline-depth trick
        applied to the training feed: on the axon tunnel one upload is
        latency-bound, so D in-flight ``device_put``\\ s can raise aggregate
        feed bandwidth (measured by tools/bench_train_step.py
        --feed-depth-sweep)."""
        import queue
        import threading

        sentinel = object()
        err: list[BaseException] = []
        # Consumer-abandonment guard: if the caller breaks out of the epoch
        # (or the generator is GC'd / a transform raises), the producer side
        # must not stay blocked forever on q.put holding decoded batches.
        # The consumer's finally sets `stop`; producers put with a timeout
        # and re-check it, so the thread always exits and its queue slots
        # drain.
        stop = threading.Event()

        def _put(q, item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        if workers > 1 and transform is not None:
            from concurrent.futures import ThreadPoolExecutor

            q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, workers))

            def dispatcher(ex):
                try:
                    for batch in self.train_batches(batch_size, **kw):
                        if not _put(q, ex.submit(transform, batch)):
                            return
                except BaseException as e:  # noqa: BLE001 - reraised below
                    err.append(e)
                finally:
                    _put(q, sentinel)

            with ThreadPoolExecutor(max_workers=workers) as ex:
                t = threading.Thread(target=dispatcher, args=(ex,), daemon=True)
                t.start()
                try:
                    while True:
                        item = q.get()
                        if item is sentinel:
                            if err:
                                raise err[0]
                            return
                        yield item.result()
                finally:
                    stop.set()
            return

        q = queue.Queue(maxsize=prefetch)

        def producer():
            try:
                for batch in self.train_batches(batch_size, **kw):
                    out = batch if transform is None else transform(batch)
                    if not _put(q, out):
                        return
            except BaseException as e:  # noqa: BLE001 - reraised on consumer
                err.append(e)
            finally:
                _put(q, sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()

    def eval_batches(self, batch_size: int = 1) -> Iterator[EvalBatch]:
        for b in range(-(-len(self.items) // batch_size)):
            items = self.items[b * batch_size : (b + 1) * batch_size]
            pad = batch_size - len(items)
            images = np.stack([self._load_visual(it) for it in items])
            all_caps = np.asarray(
                [it["encoded_all_caps"] for it in items], dtype=np.int32
            )
            caplens = np.asarray([it["caption_len"] for it in items], dtype=np.int32)
            filenames = [os.path.basename(it["image_path"]) for it in items]
            valid = np.ones(batch_size, dtype=bool)
            if pad:
                images = np.concatenate([images, np.zeros_like(images[:1]).repeat(pad, 0)])
                all_caps = np.concatenate([all_caps, np.zeros_like(all_caps[:1]).repeat(pad, 0)])
                caplens = np.concatenate([caplens, np.ones_like(caplens[:1]).repeat(pad, 0)])
                valid[len(items):] = False
                filenames += [""] * pad
            yield EvalBatch(images, all_caps, caplens, filenames, valid)


def toy_dataset(
    *,
    num_images: int = 8,
    captions_per_image: int = 5,
    max_len: int = 16,
    height: int = 64,
    width: int = 64,
    vocab_words: int = 40,
    seed: int = 0,
    from_features: bool = False,
    num_regions: int = 36,
    feat_dim: int = 2048,
    learnable: bool = False,
) -> tuple[CaptionDataset, CaptionDataset, WordMap]:
    """Deterministic synthetic dataset for tests and benchmarks (SURVEY.md §4c).

    With ``learnable=True`` each image's captions are a fixed function of its
    index (all captions of an image identical, word = image id), so a working
    training loop must drive CIDEr well above zero — an end-to-end learning
    smoke signal that catches target-misalignment bugs.

    Returns (train_ds, val_ds, word_map)."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab_words)]
    raw_caps = []
    for img_idx in range(num_images):
        caps = []
        for _ in range(captions_per_image):
            if learnable:
                w = words[img_idx % vocab_words]
                caps.append([w, words[(img_idx + 1) % vocab_words], w])
            else:
                n = int(rng.integers(3, max_len))
                caps.append([words[int(j)]
                             for j in rng.integers(0, vocab_words, n)])
        raw_caps.append(caps)
    word_map = build_word_map((c for caps in raw_caps for c in caps), min_word_freq=1)

    train_items, val_items = [], []
    for i in range(num_images):
        if from_features:
            visual = rng.normal(size=(num_regions, feat_dim)).astype(np.float32)
        else:
            visual = rng.normal(size=(height, width, 3)).astype(np.float32)
        encs, lens = zip(
            *(encode_caption(c, word_map, max_len) for c in raw_caps[i])
        )
        base = {
            "image_path": f"toy_{i}.jpg",
            "image_array": visual,
            "encoded_all_caps": [list(e) for e in encs],
        }
        for e, ln in zip(encs, lens):
            train_items.append({**base, "encoded_cap": list(e), "caption_len": int(ln)})
        val_items.append({**base, "caption_len": [int(l) for l in lens]})

    kw = dict(
        height=height, width=width, from_features=False,
        num_regions=num_regions, feat_dim=feat_dim, seed=seed,
    )
    return (
        CaptionDataset(train_items, "train", **kw),
        CaptionDataset(val_items, "val", **kw),
        word_map,
    )
