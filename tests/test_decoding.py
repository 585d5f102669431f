"""Decoding suite: greedy/sample/beam/diverse-beam.

The fixed-shape jitted beam search is checked against a dynamic-shape oracle
that follows the reference algorithm step by step (gridTDmodel.py:400-478):
shrinking beams, archive-on-<end>, top-``u`` flat selection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.decoding import (
    beam_search,
    diverse_beam_search,
    greedy_search,
    sample,
)
from lrp_imagecaptioning_tpu.decoding.beam import expand_to_beam
from lrp_imagecaptioning_tpu.models import gridtd

V = 20
CFG = ModelConfig(embed_dim=8, hidden_dim=12, vocab_size=V, num_pixels=4)
END = V - 1
START = V - 2


def make_model(seed=0):
    params = gridtd.init_gridtd(jax.random.PRNGKey(seed), CFG, raw_dim=6)
    raw = jax.random.normal(jax.random.PRNGKey(seed + 100), (1, 4, 6))
    feats = gridtd.encode_features(params, raw, raw.mean(1))
    return params, feats


def make_step(params, feats):
    def step_fn(state, token):
        logits, _, state = gridtd.step(params, feats, state, token)
        return logits, state

    return step_fn


def beam_oracle(step_fn, state0, *, k, max_steps, fallback_len=20):
    """Dynamic-shape reference-semantics beam search in Python/NumPy."""
    state = state0
    seqs = [[START]] * k
    scores = np.zeros(k)
    prev = np.full((k,), START, np.int64)
    complete, complete_scores = [], []
    u = k
    first = True
    for _ in range(max_steps):
        logits, state = step_fn(state, jnp.asarray(prev[:u], jnp.int32))
        lp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))
        sc = scores[:u, None] + lp
        flat = sc[0] if first else sc.reshape(-1)
        top = np.argsort(-flat, kind="stable")[:u]
        top_scores = flat[top]
        beam_idx = (top // V) if not first else np.zeros(u, np.int64)
        word_idx = top % V
        first = False
        new_seqs = [seqs[b] + [int(w)] for b, w in zip(beam_idx, word_idx)]
        inc = [i for i, w in enumerate(word_idx) if w != END]
        comp = [i for i in range(u) if i not in inc]
        for i in comp:
            complete.append(new_seqs[i])
            complete_scores.append(top_scores[i])
        u -= len(comp)
        if u == 0:
            break
        seqs = [new_seqs[i] for i in inc]
        keep = beam_idx[inc]
        state = jax.tree_util.tree_map(lambda x: x[jnp.asarray(keep)], state)
        scores = top_scores[inc]
        prev = word_idx[inc]
    if complete:
        i = int(np.argmax(complete_scores))
        return complete[i], complete_scores[i]
    return seqs[0][:fallback_len], scores[0]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_beam_matches_oracle(seed):
    params, feats = make_model(seed)
    step_fn = make_step(params, feats)
    k = 3
    feats_k = expand_to_beam(feats, k)
    step_k = make_step(params, feats_k)
    res = jax.jit(
        lambda s0: beam_search(
            step_k, s0, start_token=START, end_token=END,
            beam_size=k, vocab_size=V, max_steps=12,
        )
    )(gridtd.init_state(k, CFG.hidden_dim))
    got = [int(t) for t in np.asarray(res.tokens)[: int(res.length)]]

    def oracle_step(state, tok):
        n = tok.shape[0]
        f = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape[1:]), feats
        )
        logits, _, state2 = gridtd.step(params, f, state, tok)
        return logits, state2

    want, want_score = beam_oracle(
        oracle_step, gridtd.init_state(k, CFG.hidden_dim), k=k, max_steps=12
    )
    assert got == want
    np.testing.assert_allclose(float(res.score), want_score, rtol=1e-5)


def test_greedy_matches_manual(seed=0):
    params, feats = make_model(seed)
    b = 3
    fb = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape[1:]), feats
    )
    step_fn = make_step(params, fb)
    res = greedy_search(
        step_fn, gridtd.init_state(b, CFG.hidden_dim),
        batch_size=b, start_token=START, end_token=END, num_steps=8,
    )
    # manual loop
    state, tok = gridtd.init_state(b, CFG.hidden_dim), jnp.full((b,), START, jnp.int32)
    unfin = np.ones(b, bool)
    for t in range(8):
        logits, _, state = gridtd.step(params, fb, state, tok)
        nxt = np.asarray(jnp.argmax(jax.nn.log_softmax(logits, -1), -1))
        unfin = unfin & (nxt != END)
        nxt = nxt * unfin
        np.testing.assert_array_equal(np.asarray(res.tokens)[:, t], nxt)
        tok = jnp.asarray(nxt, jnp.int32)


def test_diverse_group0_equals_beam_and_fallback_quirk():
    params, feats = make_model(7)
    k = 3
    feats_k = expand_to_beam(feats, k)
    step_k = make_step(params, feats_k)
    results = jax.jit(
        lambda: diverse_beam_search(
            step_k, lambda: gridtd.init_state(k, CFG.hidden_dim),
            start_token=START, end_token=END, beam_size=k,
            vocab_size=V, max_steps=12, diversity_prob=0.5,
        )
    )()
    assert len(results) == k
    plain = beam_search(
        step_k, gridtd.init_state(k, CFG.hidden_dim),
        start_token=START, end_token=END, beam_size=k,
        vocab_size=V, max_steps=12,
    )
    # group 0 is never penalized -> identical to plain beam search
    np.testing.assert_array_equal(results[0].tokens, plain.tokens)


def _table_step(table):
    """Stateless synthetic decoder: logits depend only on the input token."""

    def step_fn(state, token):
        return table[token], state

    return step_fn


def dbs_oracle(table, *, k, max_steps, diversity_prob, fallback_len=20):
    """Dynamic-shape diverse beam search following the reference loop
    (gridTDmodel.py:337-398) including the g<2 penalty rule, the mid-step
    break, and the group-0 fallback."""
    tb = np.asarray(jax.nn.log_softmax(table, -1))
    G = k
    seqs = [[[START]] * k for _ in range(G)]
    scores = [np.zeros(k) for _ in range(G)]
    prev = [np.full(k, START, np.int64) for _ in range(G)]
    complete = [[] for _ in range(G)]
    complete_scores = [[] for _ in range(G)]
    u = [k] * G
    first = [True] * G
    for _ in range(max_steps):
        previous_idx = []
        for g in range(G):
            if u[g] == 0:
                continue
            lp = tb[prev[g][: u[g]]].copy()
            for v in previous_idx:
                lp[:, v] -= diversity_prob
            sc = scores[g][: u[g], None] + lp
            flat = sc[0] if first[g] else sc.reshape(-1)
            top = np.argsort(-flat, kind="stable")[: u[g]]
            top_scores = flat[top]
            beam_idx = np.zeros(u[g], np.int64) if first[g] else top // V
            word_idx = top % V
            first[g] = False
            new_seqs = [seqs[g][b] + [int(w)] for b, w in zip(beam_idx, word_idx)]
            inc = [i for i, w in enumerate(word_idx) if w != END]
            comp = [i for i in range(u[g]) if i not in inc]
            for i in comp:
                complete[g].append(new_seqs[i])
                complete_scores[g].append(top_scores[i])
            old_prev = prev[g]
            old_u = u[g]
            u[g] -= len(comp)
            if u[g] == 0:
                break  # reference's mid-step break freezes later groups
            seqs[g] = [new_seqs[i] for i in inc]
            scores[g] = top_scores[inc]
            if g < 2:
                for vv in old_prev[:old_u]:
                    if int(vv) not in previous_idx:
                        previous_idx.append(int(vv))
            prev[g] = word_idx[inc]
    outs = []
    for g in range(G):
        if complete[g]:
            i = int(np.argmax(complete_scores[g]))
            outs.append(complete[g][i])
        else:
            outs.append(seqs[0][0][:fallback_len])
    return outs


@pytest.mark.parametrize("seed", [0, 1, 2, 5, 9])
def test_diverse_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    table = rng.normal(size=(V, V)).astype(np.float32) * 2.0
    table[:, END] += 1.5  # make completions reachable
    table_j = jnp.asarray(table)
    k = 3
    results = jax.jit(
        lambda: diverse_beam_search(
            _table_step(table_j), lambda: jnp.zeros((k, 1)),
            start_token=START, end_token=END, beam_size=k,
            vocab_size=V, max_steps=10, diversity_prob=0.5,
        )
    )()
    want = dbs_oracle(table_j, k=k, max_steps=10, diversity_prob=0.5)
    for g in range(k):
        got = [int(t) for t in np.asarray(results[g].tokens)[: int(results[g].length)]]
        assert got == want[g], (g, got, want[g])


def test_sample_topk_stays_in_topk():
    params, feats = make_model(1)
    b = 4
    fb = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape[1:]), feats
    )
    step_fn = make_step(params, fb)
    res = sample(
        step_fn, gridtd.init_state(b, CFG.hidden_dim), jax.random.PRNGKey(0),
        batch_size=b, start_token=START, end_token=END, num_steps=6,
        sample_method="top3",
    )
    # replay: at every step the sampled token must be in that step's top-3
    state, tok = gridtd.init_state(b, CFG.hidden_dim), jnp.full((b,), START, jnp.int32)
    alive = np.ones(b, bool)
    for t in range(6):
        logits, _, state = gridtd.step(params, fb, state, tok)
        lp = np.asarray(jax.nn.log_softmax(logits, -1))
        top3 = np.argsort(-lp, -1)[:, :3]
        got = np.asarray(res.tokens)[:, t]
        for i in range(b):
            if alive[i] and got[i] != 0:
                assert got[i] in top3[i]
        alive = alive & (got != 0)
        tok = jnp.asarray(got, jnp.int32)


def test_sample_gumbel_and_categorical_run():
    params, feats = make_model(2)
    step_fn = make_step(params, feats)
    for method in ["sample", "gumbel", "top0.9"]:
        res = sample(
            step_fn, gridtd.init_state(1, CFG.hidden_dim), jax.random.PRNGKey(1),
            batch_size=1, start_token=START, end_token=END, num_steps=5,
            sample_method=method,
        )
        assert res.tokens.shape == (1, 5)
        assert np.isfinite(np.asarray(res.logprobs)).all()
