"""Unit equivalence of the one-hot closed-form epsilon rule
(`lrp_linear_eps_onehot`) with the dense rule it replaces at every fc-seed
site (gridTDmodel.py:1033-1034, 549-578)."""

import jax.numpy as jnp
import numpy as np

from lrp_imagecaptioning_tpu.ops.relevance import (
    lrp_linear_eps,
    lrp_linear_eps_onehot,
)


def test_onehot_equals_dense_unbatched():
    rng = np.random.default_rng(0)
    V, H = 37, 11
    w = rng.normal(size=(V, H)).astype(np.float32)
    x = rng.normal(size=(H,)).astype(np.float32)
    z = rng.normal(size=(V,)).astype(np.float32)
    for tgt in (0, 5, V - 1):
        r_out = np.zeros((V,), np.float32)
        r_out[tgt] = z[tgt]  # the walks seed R[target] = logit
        dense = lrp_linear_eps(jnp.asarray(r_out), jnp.asarray(x),
                               jnp.asarray(z), jnp.asarray(w))
        fast = lrp_linear_eps_onehot(
            jnp.asarray(z[tgt]), jnp.asarray(x), jnp.asarray(z[tgt]),
            jnp.asarray(w[tgt]))
        np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                                   rtol=1e-6, atol=1e-7)


def test_onehot_equals_dense_batched():
    rng = np.random.default_rng(1)
    B, V, H = 5, 23, 7
    w = rng.normal(size=(V, H)).astype(np.float32)
    x = rng.normal(size=(B, H)).astype(np.float32)
    z = rng.normal(size=(B, V)).astype(np.float32)
    labels = rng.integers(0, V, size=B)
    peak = z[np.arange(B), labels]
    r_out = np.zeros((B, V), np.float32)
    r_out[np.arange(B), labels] = peak
    dense = lrp_linear_eps(jnp.asarray(r_out), jnp.asarray(x),
                           jnp.asarray(z), jnp.asarray(w))
    fast = lrp_linear_eps_onehot(
        jnp.asarray(peak), jnp.asarray(x), jnp.asarray(peak),
        jnp.asarray(w[labels]))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                               rtol=1e-6, atol=1e-7)


def test_onehot_zero_logit_row():
    """A zero seed value must produce exactly zero relevance (the dense rule's
    0/stab = 0 rows)."""
    w = jnp.ones((4, 3))
    out = lrp_linear_eps_onehot(jnp.asarray(0.0), jnp.ones((3,)),
                                jnp.asarray(0.0), w[1])
    np.testing.assert_array_equal(np.asarray(out), np.zeros(3))
