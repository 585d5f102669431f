"""Batched greedy decoding and stochastic sampling as jitted scans.

Replaces the reference's per-token Python loops (``greedy_search``
gridTDmodel.py:480-520, ``sample``/``sample_next_word`` gridTDmodel.py:200-282)
with fixed-shape ``lax.scan`` loops shared by every model family: the model is
abstracted as ``step_fn(state, token) -> (logits, state)``.

Semantics parity notes:

- tokens after (and including) the first ``<end>`` are zeroed via the
  ``unfinished`` mask exactly like gridTDmodel.py:230-241,
- the reference's ``sample_method.startswith == 'top'`` comparison is dead code
  (always False, gridTDmodel.py:260) so its top-k/nucleus path never runs and
  every non-greedy/gumbel call degrades to plain categorical sampling.  We
  implement the *intended* top-k / top-p behavior and keep plain categorical
  as ``sample_method='sample'`` — divergence documented per SURVEY.md §7.5.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class DecodeResult(NamedTuple):
    tokens: jax.Array  # (B, T) int32, zeroed after <end>
    logprobs: jax.Array  # (B, T) float32 logprob of each sampled token


StepFn = Callable[..., tuple[jax.Array, object]]  # (state, token) -> (logits, state)


def greedy_search(
    step_fn: StepFn,
    state0,
    *,
    batch_size: int,
    start_token: int,
    end_token: int,
    num_steps: int,
) -> DecodeResult:
    """Batched greedy decode (gridTDmodel.py:480-520 semantics)."""

    def body(carry, _):
        state, token, unfinished = carry
        logits, state = step_fn(state, token)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        lp, nxt = jnp.max(logprobs, -1), jnp.argmax(logprobs, -1).astype(jnp.int32)
        unfinished = unfinished & (nxt != end_token)
        nxt = nxt * unfinished
        return (state, nxt, unfinished), (nxt, lp)

    start = jnp.full((batch_size,), start_token, jnp.int32)
    unfin = jnp.ones((batch_size,), bool)
    _, (tokens, lps) = jax.lax.scan(body, (state0, start, unfin), length=num_steps)
    return DecodeResult(tokens.T, lps.T)


def _sample_next(
    rng: jax.Array,
    logprobs: jax.Array,
    method: str,
    temperature: float,
) -> tuple[jax.Array, jax.Array]:
    """One sampling decision (gridTDmodel.py:244-282). Returns (token, logprob)."""
    if method == "greedy":
        it = jnp.argmax(logprobs, -1).astype(jnp.int32)
        lp = jnp.max(logprobs, -1)
        return it, lp
    if method == "gumbel":
        # gumbel-max trick; logprob gathered from the *untempered* distribution
        # like gridTDmodel.py:248-257.
        g = -jnp.log(-jnp.log(jax.random.uniform(rng, logprobs.shape) + 1e-20) + 1e-20)
        it = jnp.argmax((logprobs + g) / temperature, -1).astype(jnp.int32)
        lp = jnp.take_along_axis(logprobs, it[:, None], -1)[:, 0]
        return it, lp
    scaled = logprobs / temperature
    if method.startswith("top"):
        top_num = float(method[3:])
        if 0 < top_num < 1:  # nucleus sampling (intended semantics)
            sorted_lp = jnp.sort(scaled, -1)[:, ::-1]
            probs = jax.nn.softmax(sorted_lp, -1)
            csum = jnp.cumsum(probs, -1)
            keep = jnp.concatenate(
                [jnp.ones_like(csum[:, :1], bool), csum[:, :-1] < top_num], -1
            )
            thresh = jnp.min(jnp.where(keep, sorted_lp, jnp.inf), -1, keepdims=True)
            scaled = jnp.where(scaled >= thresh, scaled, -jnp.inf)
        else:  # top-k
            k = int(top_num)
            kth = jnp.sort(scaled, -1)[:, -k][:, None]
            scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
    it = jax.random.categorical(rng, scaled).astype(jnp.int32)
    lp = jnp.take_along_axis(jax.nn.log_softmax(scaled, -1), it[:, None], -1)[:, 0]
    return it, lp


def sample(
    step_fn: StepFn,
    state0,
    rng: jax.Array,
    *,
    batch_size: int,
    start_token: int,
    end_token: int,
    num_steps: int,
    sample_method: str = "greedy",
    temperature: float = 1.0,
) -> DecodeResult:
    """Free-running decode for SCST rollouts (gridTDmodel.py:200-242)."""

    def body(carry, srng):
        state, token, unfinished = carry
        logits, state = step_fn(state, token)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        it, lp = _sample_next(srng, logprobs, sample_method, temperature)
        unfinished = unfinished & (it != end_token)
        it = it * unfinished
        return (state, it, unfinished), (it, lp)

    start = jnp.full((batch_size,), start_token, jnp.int32)
    unfin = jnp.ones((batch_size,), bool)
    _, (tokens, lps) = jax.lax.scan(
        body, (state0, start, unfin), jax.random.split(rng, num_steps)
    )
    return DecodeResult(tokens.T, lps.T)
