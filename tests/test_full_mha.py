"""Full MultiHeadedDotAttention option set vs a torch oracle of the reference
module semantics (aoamodel.py:54-108, eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from lrp_imagecaptioning_tpu.models.aoa import (
    BatchNorm1dParams,
    FullMHAParams,
    full_mha,
)
from lrp_imagecaptioning_tpu.models.core import LinearParams


def test_full_mha_matches_torch():
    rng = np.random.default_rng(0)
    b, p, h, nh = 2, 5, 16, 4

    def lin(out, inn):
        return (rng.normal(size=(out, inn)).astype(np.float32) * 0.3,
                rng.normal(size=out).astype(np.float32) * 0.1)

    qw, qb = lin(h, h)
    kw, kb = lin(h, h)
    vw, vb = lin(h, h)
    aw, ab = lin(2 * h, 2 * h)
    gamma = rng.uniform(0.5, 1.5, h).astype(np.float32)
    beta = rng.normal(size=h).astype(np.float32)
    mean = rng.normal(size=h).astype(np.float32)
    var = rng.uniform(0.5, 2.0, h).astype(np.float32)
    eps = 1e-5
    scale = gamma / np.sqrt(var + eps)
    shift = beta - mean * scale

    params = FullMHAParams(
        q_proj=LinearParams(jnp.asarray(qw), jnp.asarray(qb)),
        k_proj=LinearParams(jnp.asarray(kw), jnp.asarray(kb)),
        v_proj=LinearParams(jnp.asarray(vw), jnp.asarray(vb)),
        norm_q=BatchNorm1dParams(jnp.asarray(scale), jnp.asarray(shift)),
        aoa_layer=LinearParams(jnp.asarray(aw), jnp.asarray(ab)),
    )
    q = rng.normal(size=(b, h)).astype(np.float32)
    key = rng.normal(size=(b, p, h)).astype(np.float32)
    val = rng.normal(size=(b, p, h)).astype(np.float32)
    got, alpha = full_mha(params, jnp.asarray(q), jnp.asarray(key),
                          jnp.asarray(val), nh)

    # torch oracle (reference forward, eval mode / single query)
    qt = torch.tensor(q)
    qt = qt * torch.tensor(scale) + torch.tensor(shift)
    q_p = qt @ torch.tensor(qw).t() + torch.tensor(qb)
    k_p = torch.tensor(key) @ torch.tensor(kw).t() + torch.tensor(kb)
    v_p = torch.tensor(val) @ torch.tensor(vw).t() + torch.tensor(vb)
    d_k = h // nh
    qh = q_p.view(b, 1, nh, d_k).transpose(1, 2)
    kh = k_p.view(b, p, nh, d_k).transpose(1, 2)
    vh = v_p.view(b, p, nh, d_k).transpose(1, 2)
    att = torch.softmax(qh @ kh.transpose(-2, -1) / np.sqrt(d_k), -1)
    x = (att @ vh).transpose(1, 2).reshape(b, 1, h).squeeze(1)
    z = torch.cat([x, qt], -1) @ torch.tensor(aw).t() + torch.tensor(ab)
    want = torch.nn.functional.glu(z, -1) + qt
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(alpha), att.squeeze(2).numpy(), rtol=1e-4, atol=1e-6
    )
