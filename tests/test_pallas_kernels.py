"""Pallas epsilon-rule kernel vs the reference jnp implementation (interpret
mode on CPU; the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.ops.pallas_kernels import lrp_linear_eps_pallas
from lrp_imagecaptioning_tpu.ops.relevance import lrp_linear_eps


@pytest.mark.parametrize("shape", [
    (4, 20, 14),       # tiny, unaligned
    (16, 512, 512),    # aligned
    (3, 9600, 512),    # vocab-sized seed
    (1, 40, 1000),
])
def test_pallas_matches_jnp(shape):
    b, out, inn = shape
    rng = np.random.default_rng(hash(shape) % 2**31)
    r = jnp.asarray(rng.normal(size=(b, out)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, inn)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(b, out)).astype(np.float32))
    # sprinkle exact zeros into z to exercise the stabilizer branch
    z = z.at[:, ::7].set(0.0)
    w = jnp.asarray(rng.normal(size=(out, inn)).astype(np.float32))
    want = lrp_linear_eps(r, x, z, w)
    got = lrp_linear_eps_pallas(r, x, z, w)
    # fp32 accumulation order differs between the tiled reduction and one
    # monolithic dot (exact equality observed on real TPU; CPU interpret mode
    # reassociates) — tolerance scaled to the reduction length
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-3)


def test_pallas_one_hot_seed():
    """The fc-seed case: one-hot relevance row."""
    rng = np.random.default_rng(0)
    b, out, inn = 2, 300, 64
    r = np.zeros((b, out), np.float32)
    r[0, 17] = 3.3
    r[1, 2] = -1.1
    x = rng.normal(size=(b, inn)).astype(np.float32)
    z = rng.normal(size=(b, out)).astype(np.float32)
    w = rng.normal(size=(out, inn)).astype(np.float32)
    want = lrp_linear_eps(jnp.asarray(r), jnp.asarray(x), jnp.asarray(z),
                          jnp.asarray(w))
    got = lrp_linear_eps_pallas(jnp.asarray(r), jnp.asarray(x),
                                jnp.asarray(z), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)
