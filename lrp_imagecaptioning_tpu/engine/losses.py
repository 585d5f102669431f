"""Training losses (reference ``train.py:154-180``, ``modelutils.py:31-46``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array,  # (B, T, V)
    targets: jax.Array,  # (B, T) int32
    pad_id: int = 0,
) -> jax.Array:
    """Mean CE over non-pad targets — torch CrossEntropyLoss(ignore_index=pad)
    semantics (train.py:134,165)."""
    mask = (targets != pad_id).astype(logits.dtype)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def top1_accuracy(
    logits: jax.Array, targets: jax.Array, pad_id: int = 0
) -> jax.Array:
    """Reference ``accuracy(scores, targets, 1)`` quirk included: correct
    counts only non-pad positions but the denominator is *all* flattened
    positions (modelutils.py:162-182 divides by targets.size(0) pre-mask)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(((pred == targets) & (targets != pad_id)).astype(jnp.float32))
    total = jnp.asarray(targets.size, jnp.float32)
    return correct * 100.0 / total


def reward_criterion(
    logprobs: jax.Array,  # (B, T) logprob of each sampled token
    seq: jax.Array,  # (B, T) sampled tokens (0 after <end>)
    reward: jax.Array,  # (B, T) broadcast per-image advantage
) -> jax.Array:
    """SCST policy-gradient loss (RewardCriterion, modelutils.py:31-46):
    mask = (seq > 0) shifted right one step with a leading 1 — the step that
    *produces* <end> still gets gradient."""
    m = (seq > 0).astype(logprobs.dtype)
    mask = jnp.concatenate([jnp.ones_like(m[:, :1]), m[:, :-1]], axis=1)
    out = -logprobs * reward * mask
    return jnp.sum(out) / jnp.sum(mask)
