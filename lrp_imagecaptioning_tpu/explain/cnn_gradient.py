"""CNN-stage backward passes for the gradient-family explainers.

- plain gradient: true vjp of the conv stack seeded with the decoder's
  feature-grid gradients (``ExplainGridTDGradient.explain_cnn``,
  gridTDmodel.py:1510-1523),
- guided backprop: the backward walk with the guided ReLU rule
  ``grad' = clamp(grad, min=0) * (relu_output > 0)``
  (register_hooks, gridTDmodel.py:1677-1691).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.encoders import VGG16_SPEC, VGGLayer, VGGParams, conv2d, maxpool2x2


def vgg_gradient(
    params: VGGParams, image: jax.Array, d_feature: jax.Array, *,
    spec: tuple[VGGLayer, ...] = VGG16_SPEC,
) -> jax.Array:
    """True input gradient: vjp of the conv stack."""
    from ..models.encoders import vgg_forward

    _, vjp = jax.vjp(
        lambda im: vgg_forward(params, im.astype(jnp.float32), spec=spec), image
    )
    (g,) = vjp(d_feature.astype(jnp.float32))
    return g


def make_vgg_guided_backward(
    params: VGGParams, image: jax.Array, *,
    spec: tuple[VGGLayer, ...] = VGG16_SPEC,
    g_dtype=jnp.float32,
    w_dtype=None,
):
    """Guided-backprop backward closure sharing one forward stash (same
    amortization as make_vgg_lrp_backward).

    The maxpool backward uses a first-winner mask precomputed once in the
    stash, so each per-word backward is elementwise (no per-word
    SelectAndScatter).  ``first_winner_mask`` routes window ties to the
    first element in scan order — exactly torch's ``max_pool2d`` backward
    (positive ties are NOT measure-zero on real images: constant regions
    propagate identical activations).

    ``w_dtype`` (default: follows ``g_dtype``) is the STORAGE dtype of the
    conv-transpose kernels, the same weight-read-traffic lever as
    cnn_lrp.make_vgg_lrp_backward's ``w_dtype`` (blocks 4-5 of the walk are
    weight-read-bound; this backend rounds conv operands to bf16 anyway)."""
    from .cnn_lrp import _conv_transpose_same, _flip_io

    w_dtype = g_dtype if w_dtype is None else w_dtype
    compact_w = jnp.dtype(w_dtype) != jnp.dtype(jnp.float32)
    x = image.astype(jnp.float32)
    records = []
    for layer in spec:
        if layer.kind == "conv":
            p = params.convs[layer.param_idx]
            if compact_w and p.weight.shape[:2] == (3, 3):
                wt = _flip_io(p.weight.astype(jnp.float32)).astype(w_dtype)

                def vjp(s, wt=wt):
                    return (_conv_transpose_same(s, wt),)
            else:
                _, vjp = jax.vjp(lambda xx, p=p: conv2d(p, xx), x)
            records.append(("conv", None, vjp))
            x = conv2d(p, x)
        elif layer.kind == "relu":
            x = jax.nn.relu(x)
            # stash the GATE (out > 0) as bool — 1-byte per-word reads, exact
            records.append(("relu", x > 0, None))
        elif layer.kind == "maxpool":
            from .cnn_lrp import first_winner_mask

            z = maxpool2x2(x)
            records.append(("maxpool_fast", first_winner_mask(x), None))
            x = z

    def backward(g: jax.Array) -> jax.Array:
        """``g_dtype`` is the storage dtype between layers (same rationale
        as cnn_lrp's ``r_dtype``: this backend's conv data-grads round to
        bf16 internally, so bf16 storage halves HBM traffic at the error
        scale already present)."""
        g = g.astype(jnp.float32)
        for kind, gate, vjp in reversed(records):
            if kind == "relu":
                # guided rule: positive grads, gated by positive activations
                g = jnp.where(gate,
                              jnp.maximum(g.astype(jnp.float32), 0.0),
                              0.0).astype(g_dtype)
            elif kind == "maxpool_fast":
                g = jnp.where(gate, jnp.repeat(jnp.repeat(
                    g.astype(jnp.float32), 2, axis=1), 2, axis=2),
                    0.0).astype(g_dtype)
            else:
                (g,) = vjp(g.astype(jnp.float32))
        return g.astype(jnp.float32)

    return backward


def vgg_guided_gradient(
    params: VGGParams, image: jax.Array, d_feature: jax.Array, *,
    spec: tuple[VGGLayer, ...] = VGG16_SPEC,
) -> jax.Array:
    return make_vgg_guided_backward(params, image, spec=spec)(d_feature)
