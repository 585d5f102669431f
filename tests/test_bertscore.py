"""Native BERTScore tests (metrics/bertscore.py) — the algorithm is checked
against a literal NumPy transcription of bert_score's greedy cosine matching
on a tiny offline-constructed BERT (random weights, local vocab file; no
network, matching the zero-egress environment)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lrp_imagecaptioning_tpu.metrics.bertscore import (  # noqa: E402
    BertScoreUnavailable,
    bert_score_corpus,
    score_pairs,
)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat", "dog", "sat", "on",
         "the", "mat", "rug", "big", "small"]


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tinybert")
    vocab_file = os.path.join(d, "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(VOCAB))
    tok = BertTokenizer(vocab_file=vocab_file)
    torch.manual_seed(0)
    model = BertModel(BertConfig(
        vocab_size=len(VOCAB), hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32))
    model.eval()
    return tok, model, 2  # use the last hidden layer


def _oracle_pair(cand, ref, tok, model, layer):
    """Literal transcription of bert_score's greedy_cos_idf for one pair
    (bert_score/utils.py): unit-norm embeddings, row/col max, CLS/SEP
    weight 0."""
    def emb_and_w(s):
        enc = tok([s], return_tensors="pt")
        with torch.no_grad():
            h = model(**enc, output_hidden_states=True).hidden_states[layer]
        e = h[0].numpy()
        e = e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        ids = enc["input_ids"][0].numpy()
        w = np.ones(len(ids))
        w[ids == tok.cls_token_id] = 0.0
        w[ids == tok.sep_token_id] = 0.0
        return e, w

    ce, cw = emb_and_w(cand)
    re_, rw = emb_and_w(ref)
    sim = ce @ re_.T
    p = float((sim.max(axis=1) * cw).sum() / cw.sum())
    r = float((sim.max(axis=0) * rw).sum() / rw.sum())
    return p, r, 2 * p * r / (p + r)


def test_score_pairs_matches_oracle(tiny_bert):
    cands = ["a cat sat on the mat", "the dog sat", "a big rug"]
    refs = ["a cat sat on the rug", "a small dog sat on the mat", "the mat"]
    ps, rs, f1s = score_pairs(cands, refs, _loaded=tiny_bert)
    for c, r, p, rr, f1 in zip(cands, refs, ps, rs, f1s):
        op, orr, of1 = _oracle_pair(c, r, *tiny_bert)
        assert abs(p - op) < 1e-5
        assert abs(rr - orr) < 1e-5
        assert abs(f1 - of1) < 1e-5


def test_identical_sentences_score_one(tiny_bert):
    ps, rs, f1s = score_pairs(["a cat sat"], ["a cat sat"], _loaded=tiny_bert)
    assert f1s[0] == pytest.approx(1.0, abs=1e-5)
    assert ps[0] == pytest.approx(1.0, abs=1e-5)


def test_corpus_aggregation_flattens_per_reference(tiny_bert):
    """Reference Bert.compute_score averages over ALL (hyp, ref) pairs
    (pycocoevalcap/bert/bert.py:27-46), not per-image maxima."""
    hyps = ["a cat sat", "the dog"]
    refs = [["a cat sat", "the cat sat on the mat"], ["a small dog"]]
    avg, f1s = bert_score_corpus(hyps, refs, _loaded=tiny_bert)
    assert len(f1s) == 3
    flat = score_pairs(
        ["a cat sat", "a cat sat", "the dog"],
        ["a cat sat", "the cat sat on the mat", "a small dog"],
        _loaded=tiny_bert)[2]
    assert avg == pytest.approx(sum(flat) / 3, abs=1e-6)


def test_batching_invariance(tiny_bert):
    cands = [f"a cat sat on the mat" for _ in range(5)] + ["the dog sat"]
    refs = ["a cat sat"] * 5 + ["a dog"]
    a = score_pairs(cands, refs, _loaded=tiny_bert, batch_size=2)[2]
    b = score_pairs(cands, refs, _loaded=tiny_bert, batch_size=64)[2]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_adapter_degrades_without_weights(monkeypatch):
    """BERT adapter must warn + return 0.0 when no local model exists
    (reference metrics.py:62-67 degradation pattern)."""
    from lrp_imagecaptioning_tpu.metrics import bertscore, scores

    def boom(*a, **k):
        raise BertScoreUnavailable("no local weights")

    monkeypatch.setattr(bertscore, "_load_model", boom)
    with pytest.warns(UserWarning, match="BERTScore unavailable"):
        out = scores.BERT().calculate(
            {0: [{"caption": "a cat"}]}, {0: [{"caption": "a cat"}]})
    assert out == {"bert": 0.0}


def test_adapter_uses_native_scorer(tiny_bert, monkeypatch):
    from lrp_imagecaptioning_tpu.metrics import bertscore, scores

    monkeypatch.setattr(bertscore, "_load_model", lambda *a, **k: tiny_bert)
    out = scores.BERT().calculate(
        {0: [{"caption": "a cat sat"}]}, {0: [{"caption": "a cat sat"}]})
    assert out["bert"] == pytest.approx(1.0, abs=1e-4)
