"""Native BERTScore (Zhang et al., ICLR 2020) — the algorithm behind the
``bert_score`` package the reference wraps (``pycocoevalcap/bert/bert.py:43``,
``models/metrics.py:84-89``), implemented directly on ``transformers`` so the
metric works without the extra pip package.

Matches ``bert_score.score(cands, refs, lang='en')`` defaults:

- model ``roberta-large``, hidden states from layer 17,
- token embeddings L2-normalized, greedy cosine matching,
- P = mean over candidate tokens of max-sim, R = mean over reference tokens,
  F1 = 2PR/(P+R); BOS/EOS (CLS/SEP) tokens get weight 0,
- no idf weighting, no baseline rescaling (the package defaults).

Pretrained weights cannot be downloaded in a zero-egress environment; the
loader uses ``local_files_only`` and raises ``BertScoreUnavailable`` when the
model is absent, which the :class:`..metrics.scores.BERT` adapter turns into
the reference-style warn + 0.0 degradation (``metrics.py:62-67``).  Override
the checkpoint with ``$BERTSCORE_MODEL`` (and ``$BERTSCORE_LAYER``) to use any
locally available encoder.
"""

from __future__ import annotations

import os
import warnings
from typing import Sequence

DEFAULT_MODEL = "roberta-large"
DEFAULT_LAYER = 17  # bert_score's tuned layer for roberta-large / lang='en'


class BertScoreUnavailable(RuntimeError):
    """No local model weights (or no transformers) — caller should degrade."""


def _load_model(model_type: str | None = None, num_layers: int | None = None):
    model_type = model_type or os.environ.get("BERTSCORE_MODEL", DEFAULT_MODEL)
    if num_layers is None:
        num_layers = int(os.environ.get("BERTSCORE_LAYER", DEFAULT_LAYER))
    try:
        from transformers import AutoModel, AutoTokenizer
    except ImportError as e:  # pragma: no cover
        raise BertScoreUnavailable(f"transformers not importable: {e}") from e
    try:
        tok = AutoTokenizer.from_pretrained(model_type, local_files_only=True)
        model = AutoModel.from_pretrained(model_type, local_files_only=True)
    except Exception as e:
        raise BertScoreUnavailable(
            f"no local weights for '{model_type}' "
            f"(set $BERTSCORE_MODEL to a locally cached encoder): {e}"
        ) from e
    model.eval()
    return tok, model, num_layers


def _embed(sentences: Sequence[str], tok, model, layer: int,
           batch_size: int = 64):
    """Per-sentence (tokens, unit-norm embeddings [T, D], weights [T])."""
    import torch

    out = []
    with torch.no_grad():
        for i in range(0, len(sentences), batch_size):
            chunk = list(sentences[i: i + batch_size])
            enc = tok(chunk, return_tensors="pt", padding=True,
                      truncation=True)
            hidden = model(**enc, output_hidden_states=True).hidden_states
            if layer > len(hidden) - 1:
                # a tuned-layer request deeper than the encoder would silently
                # score from the wrong layer — surface it (ADVICE r2)
                warnings.warn(
                    f"BERTSCORE_LAYER={layer} exceeds the model's "
                    f"{len(hidden) - 1} layers; using the last layer — scores "
                    "are NOT the tuned-layer metric.")
            layer_i = min(layer, len(hidden) - 1)
            emb = hidden[layer_i]
            emb = emb / emb.norm(dim=-1, keepdim=True).clamp_min(1e-12)
            for j in range(len(chunk)):
                n = int(enc["attention_mask"][j].sum())
                ids = enc["input_ids"][j, :n]
                w = torch.ones(n)
                # special (CLS/SEP/BOS/EOS) tokens get weight 0 — the
                # bert_score idf_dict defaults
                for sid in (tok.cls_token_id, tok.sep_token_id,
                            tok.bos_token_id, tok.eos_token_id):
                    if sid is not None:
                        w[ids == sid] = 0.0
                out.append((emb[j, :n], w))
    return out


def score_pairs(
    cands: Sequence[str],
    refs: Sequence[str],
    *,
    model_type: str | None = None,
    num_layers: int | None = None,
    batch_size: int = 64,
    _loaded=None,  # (tokenizer, model, layer) injection point for tests
):
    """Pairwise BERTScore; returns (P, R, F1) float lists, one per pair."""
    assert len(cands) == len(refs)
    if _loaded is not None:
        tok, model, layer = _loaded
    else:
        tok, model, layer = _load_model(model_type, num_layers)
    import torch

    c_emb = _embed(cands, tok, model, layer, batch_size)
    r_emb = _embed(refs, tok, model, layer, batch_size)
    ps, rs, f1s = [], [], []
    for (ce, cw), (re_, rw) in zip(c_emb, r_emb):
        sim = ce @ re_.T  # (Tc, Tr) cosine similarities (unit-norm rows)
        word_p = sim.max(dim=1).values  # best ref match per cand token
        word_r = sim.max(dim=0).values  # best cand match per ref token
        p = float((word_p * cw).sum() / cw.sum().clamp_min(1e-12))
        r = float((word_r * rw).sum() / rw.sum().clamp_min(1e-12))
        f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
        ps.append(p)
        rs.append(r)
        f1s.append(f1)
    del torch
    return ps, rs, f1s


def bert_score_corpus(
    hyps: Sequence[str],
    refs: Sequence[Sequence[str]],
    **kw,
) -> tuple[float, list[float]]:
    """Reference ``Bert.compute_score`` aggregation
    (pycocoevalcap/bert/bert.py:27-46): flatten to one (hyp, ref) pair per
    reference sentence and average F1 over ALL pairs."""
    flat_c, flat_r = [], []
    for h, rl in zip(hyps, refs):
        for r in rl:
            flat_c.append(h)
            flat_r.append(r)
    if not flat_c:
        return 0.0, []
    _, _, f1s = score_pairs(flat_c, flat_r, **kw)
    return sum(f1s) / len(f1s), f1s
