"""LRP relevance-rule primitives, vectorized.

The reference applies ``lrp_linear_eps`` one vector at a time inside Python
loops (e.g. 196 per-pixel calls per timestep, gridTDmodel.py:1091-1095).  Here
every rule is a closed-form array op so the whole relevance walk fuses into one
XLA program.  All relevance math is float32 (SURVEY.md §7 precision
discipline).

Rule semantics (identical numerics to the reference):

- ``stabilize(z)``: ``z + EPS * sign(z)`` with exact zeros replaced by ``EPS``
  (gridTDmodel.py:757-759 — ``masked_fill_(z == 0, EPS)``),
- ``lrp_linear_eps``: epsilon rule through a linear map ``z = x @ W.T (+ b)``
  with the bias absorbed into the denominator:
  ``R_i = x_i * sum_j W_ji R_j / stabilize(z_j)`` (gridTDmodel.py:744-765),
- ``lrp_elem_eps``: the identity-weight special case the reference expresses
  as ``lrp_linear_eps(..., weight=eye)`` (gate/mix splits):
  ``R_in = contrib / stabilize(z) * R_out``,
- ``normalize_relevance``: max-abs normalize to [1-T, 1+T] (all-zero rows map
  to all-ones, LRPtools/utils.py:55-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 0.01  # LRPtools/utils.py:9
Z_EPSILON = 1e-7  # LRPtools/utils.py:10
RELEVANCE_RECT = -1e-6  # LRPtools/utils.py:12


def stabilize(z: jax.Array, eps: float = EPSILON) -> jax.Array:
    z = z.astype(jnp.float32)
    out = z + eps * jnp.sign(z)
    return jnp.where(out == 0, eps, out)


def safe_divide(num: jax.Array, den: jax.Array) -> jax.Array:
    """iNNvestigate-style safe division (LRPtools/utils.py:16-18)."""
    return num / (den + Z_EPSILON * (den == 0).astype(num.dtype))


def lrp_linear_eps(
    r_out: jax.Array,  # (..., out)
    x: jax.Array,  # (..., in)
    z: jax.Array,  # (..., out) forward pre-activation (with bias)
    weight: jax.Array,  # (out, in)
    eps: float = EPSILON,
) -> jax.Array:
    """Vectorized epsilon rule; batch dims broadcast."""
    s = (r_out.astype(jnp.float32) / stabilize(z, eps))
    return x.astype(jnp.float32) * (s @ weight.astype(jnp.float32))


def lrp_linear_eps_onehot(
    r_val: jax.Array,  # (...,) relevance at the single hot row
    x: jax.Array,  # (..., in)
    z_target: jax.Array,  # (...,) pre-activation of the hot row
    w_row: jax.Array,  # (..., in) the hot row of the weight
    eps: float = EPSILON,
) -> jax.Array:
    """Closed form of :func:`lrp_linear_eps` for a ONE-HOT output relevance
    (the fc seed of every explanation walk, gridTDmodel.py:1033-1034, and the
    LRP-weight step, gridTDmodel.py:549-578).

    Exact: the zero rows of ``s = R/stab(z)`` are exactly 0 and contribute
    ``0 @ W = 0``, so only the hot row survives — O(in) instead of the
    O(out*in) vocab-width matmul (padded_vocab x hidden = 9728 x 512 at the
    flagship scale)."""
    s = r_val.astype(jnp.float32) / stabilize(
        jnp.asarray(z_target, jnp.float32), eps)
    x = x.astype(jnp.float32)
    if jnp.ndim(s) < jnp.ndim(x):
        s = s[..., None]
    return x * (s * w_row.astype(jnp.float32))


def lrp_elem_eps(
    r_out: jax.Array, contrib: jax.Array, z: jax.Array, eps: float = EPSILON
) -> jax.Array:
    """Identity-weight epsilon rule: relevance of an additive contribution
    ``contrib`` to output ``z`` (elementwise)."""
    return contrib.astype(jnp.float32) / stabilize(z, eps) * r_out.astype(jnp.float32)


def normalize_relevance(
    x: jax.Array, axis: int = -1, temperature: float = 1.0
) -> jax.Array:
    """Map to [1-T, 1+T] by max-abs (zeros rows -> ones), utils.py:55-64."""
    m = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    m = jnp.where(m == 0, 1.0, m)
    xn = x / m
    if temperature > 1:
        return xn * temperature + temperature
    return xn * temperature + 1.0
