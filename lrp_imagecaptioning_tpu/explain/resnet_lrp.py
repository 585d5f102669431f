"""ResNet-stage LRP and guided-backprop walks.

Applies the reference's hook rules (LRPtools/lrp_wrapper.py:42-56 preset) over
the explicit ResNet structure:

- Conv2d -> alpha-beta (alpha=1, beta=0, bias-free convs),
- BatchNorm2d -> the |xw| / (|xw| + |b|) rule (lrp_modules.py:197-220) on the
  inference-mode scale/shift form,
- ReLU -> identity (guided variant: clamp(grad,0) * (out > 0)),
- MaxPool -> winner-take-all via the gradient trick,
- residual Add -> proportional split with the half-half zero-output guard
  (lrp_modules.py:256-280); exact zeros contribute 0 through the ratio term
  instead of the reference's latent inf (documented divergence — the reference
  would trip its own isinf assert there).

The forward stash is captured once per image; the returned backward closures
are linear in the relevance, so per-word explanation is vmap-able like the
VGG path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.resnet import (
    ConvBN,
    ResNetParams,
    bn,
    conv,
    maxpool3x3s2,
)
from .rules import EPSILON, Z_EPSILON, safe_divide


def _strided_conv_transpose(weight: jax.Array, stride: int,
                            x_shape, z_shape, *, w_dtype=None,
                            extra_weight=None):
    """Data-grad of a strided SAME-ish conv (pad = (k-1)//2 both sides, the
    :func:`~..models.resnet.conv` convention) as ONE explicit
    ``conv_general_dilated`` with a spatially-flipped IO-transposed kernel.

    ``extra_weight`` concatenates a second kernel's flipped transpose on the
    OUTPUT-channel axis: one conv then computes BOTH data-grads over the
    same cotangent (output slices ``[..., :Cin]`` / ``[..., Cin:]``) — the
    stem-merge trick, see ``make_resnet_lrp_backward``'s ``stem_merge``.

    Exists so the kernel can be STORED in ``w_dtype`` (bfloat16) while the
    accumulation/output stays float32 via ``preferred_element_type`` — the
    cnn_lrp._conv_transpose_same pattern generalized to stride 2.  Both
    ``jax.vjp`` and ``jax.linear_transpose`` reject the mixed-dtype form, and
    transposing an all-bf16 conv would round the OUTPUT gradient map to bf16
    at every one of ResNet-50's ~50 block convs (the round-3 advisor
    finding); here only the operands round — which this backend does in
    hardware regardless."""
    wd = jnp.dtype(weight.dtype if w_dtype is None else w_dtype)
    kh = weight.shape[0]
    pad = (kh - 1) // 2

    def _flip(w):
        return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).astype(wd)

    wt = (_flip(weight) if extra_weight is None
          else jnp.concatenate([_flip(weight), _flip(extra_weight)], axis=-1))
    h, w = x_shape[1], x_shape[2]
    ho, wo = z_shape[1], z_shape[2]
    pad_h = (kh - 1 - pad, h - stride * (ho - 1) - 1 + pad)
    pad_w = (kh - 1 - pad, w - stride * (wo - 1) - 1 + pad)

    def transpose(g: jax.Array) -> jax.Array:
        return jax.lax.conv_general_dilated(
            g.astype(wd), wt, (1, 1), [pad_h, pad_w],
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # f32 accumulation/output even for bf16 operands; promoted so
            # f64 operands (the x64 oracle-parity tests) stay f64 — a
            # narrower preferred type is a lax error
            preferred_element_type=jnp.promote_types(jnp.float32, wd),
        )

    return transpose


def _pool3x3s2_first_winner_masks(x: jax.Array, y: jax.Array) -> jax.Array:
    """(1,H,W,C) pool input / (1,Ho,Wo,C) pooled output -> bool
    (9,1,Ho,Wo,C): per 3x3/stride-2/pad-1 window, a one-hot mask over the
    9 taps marking the FIRST maximal element in row-major tap order —
    exactly XLA SelectAndScatter's (and torch max_pool2d backward's) tie
    routing, same probe as ``cnn_lrp.first_winner_mask`` generalized to
    OVERLAPPING windows (an input element may win several windows; it then
    appears in several per-window tap masks, and the fast backward's adds
    reproduce the scatter-add).  Computed once per caption; the per-word
    backward (:func:`_pool3x3s2_fast_bwd`) is 9 masked dilate-shift adds —
    pure elementwise, replacing a per-word SelectAndScatter custom-call
    that measured 2.04 ms/img for 16 words on v5e (HALF the whole resnet
    explain program)."""
    # even-size precondition: the fast backward reconstructs (1,2Ho,2Wo,C),
    # which equals the pool-input shape only for even H/W (maxpool3x3/s2/p1
    # on odd inputs gives Ho=(H+1)/2 and the rebuilt map would be one
    # row/col too large, silently mis-shaping the opt-in fast walk)
    if x.shape[1] != 2 * y.shape[1] or x.shape[2] != 2 * y.shape[2]:
        raise ValueError(
            f"pool_mode='fast' requires an even-sized pool input "
            f"(got input {x.shape[1]}x{x.shape[2]}, pooled "
            f"{y.shape[1]}x{y.shape[2]}); use the default vjp pool mode")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    ho, wo, c = y.shape[1], y.shape[2], y.shape[3]
    eqs = []
    for di in range(3):
        for dj in range(3):
            xt = jax.lax.slice(
                xp, (0, di, dj, 0),
                (1, di + 2 * ho - 1, dj + 2 * wo - 1, c), (1, 2, 2, 1))
            eqs.append(xt == y)
    taken = jnp.zeros_like(eqs[0])
    firsts = []
    for e in eqs:
        firsts.append(e & ~taken)
        taken = taken | e
    return jnp.stack(firsts)


def _pool3x3s2_fast_bwd(masks: jax.Array, r: jax.Array) -> jax.Array:
    """Scatter per-window values ``r`` (1,Ho,Wo,C) back to the pool input
    grid (1,2*Ho,2*Wo,C) through the precomputed first-winner tap masks:
    tap (di,dj)'s entries land at input position (2i+di-1, 2j+dj-1).

    Formulated as FOUR PARITY-PHASE planes assembled with one interleaving
    reshape — NOT as interior-dilation ``lax.pad``s, which this backend
    executes ~5x slower than the SelectAndScatter they were meant to
    replace (measured 10.4 vs 2.04 ms per 16 words on v5e).  Input row
    p = 2i+di-1 is even only for di=1 (i=p/2) and odd for di∈{0,2}
    (i=(p±1)/2), so each output parity phase (u,v) is a sum of 1/2/2/4
    shifted 56² tap maps; out-of-range shifts carry False masks (the -inf
    border in the mask builder), so zero-padding the shift is exact."""
    m = [r * masks[k] for k in range(9)]  # m[3*a+b], tap (a, b)

    def _sh(t, dr, dc):
        if dr:
            t = jnp.pad(t[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        if dc:
            t = jnp.pad(t[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
        return t

    p_ee = m[4]                                        # (a,b) = (1,1)
    p_eo = _sh(m[3], 0, 1) + m[5]                      # (1,0)->v+1, (1,2)
    p_oe = _sh(m[1], 1, 0) + m[7]                      # (0,1)->u+1, (2,1)
    p_oo = (_sh(m[0], 1, 1) + _sh(m[2], 1, 0)          # (0,0), (0,2)
            + _sh(m[6], 0, 1) + m[8])                  # (2,0), (2,2)
    row_e = jnp.stack([p_ee, p_eo], axis=3)            # (1,Ho,Wo,2,C)
    row_o = jnp.stack([p_oe, p_oo], axis=3)
    t = jnp.stack([row_e, row_o], axis=2)              # (1,Ho,2,Wo,2,C)
    b, ho, _, wo, _, c = t.shape
    return t.reshape(b, 2 * ho, 2 * wo, c)


def _conv_ab_vjp(p: ConvBN, x: jax.Array, *, nonneg: bool = False,
                 w_dtype=None):
    """(z+, linear-vjp) for the alpha-beta rule of a strided, bias-free conv.

    With ``nonneg`` (input provably post-relu) the clamped forward collapses
    to one w+ conv — exact, since min(x, 0) == 0 and R = x * grad vanishes at
    the only points where the vjp could differ (x == 0).

    ``w_dtype`` (nonneg convs only) is the STORAGE dtype of the kernel the
    per-word backward reads: a ResNet-50's clamped weights are ~94 MB f32
    re-read per explained word, the dominant per-word traffic of this walk
    (maps beyond the stem are <=56^2 — the measured reason bf16 STASH lost
    here while bf16 weights are a different axis).  The backward is an
    explicit transposed conv in ``w_dtype`` operands with
    ``preferred_element_type=float32`` (see :func:`_strided_conv_transpose`)
    so only operands — not accumulation or the output gradient map — round.
    Note ``w_dtype`` therefore also sets the operand dtype of the incoming
    relevance product (lax convs require matching operand dtypes); on TPU
    the hardware rounds conv operands to bf16 either way."""
    w_pos = ConvBN(jnp.maximum(p.weight, 0.0), p.bn_scale, p.bn_shift, p.stride)
    if nonneg:
        def pos_forward(xx):
            return conv(w_pos, xx)

        if w_dtype is not None and jnp.dtype(w_dtype) != jnp.dtype(x.dtype):
            z = pos_forward(x)
            t = _strided_conv_transpose(
                w_pos.weight, p.stride, x.shape, z.shape, w_dtype=w_dtype)

            def vjp(s, t=t, out=x.dtype):
                return (t(s).astype(out),)

            return z, vjp
    else:
        w_neg = ConvBN(jnp.minimum(p.weight, 0.0), p.bn_scale, p.bn_shift,
                       p.stride)

        def pos_forward(xx):
            return conv(w_pos, jnp.maximum(xx, 0.0)) + conv(
                w_neg, jnp.minimum(xx, 0.0))

    z, vjp = jax.vjp(pos_forward, x)
    return z, vjp


def _bn_abs_rule(p: ConvBN, x: jax.Array, r: jax.Array) -> jax.Array:
    xw = x * p.bn_scale
    return safe_divide(jnp.abs(xw), jnp.abs(xw) + jnp.abs(p.bn_shift)) * r


def _add_split(x1: jax.Array, x2: jax.Array, r: jax.Array):
    out = x1 + x2
    zero = out == 0
    denom = out + EPSILON * jnp.sign(out)
    r1 = jnp.where(zero, 0.0, r * x1 / jnp.where(zero, 1.0, denom))
    r2 = jnp.where(zero, 0.0, r * x2 / jnp.where(zero, 1.0, denom))
    half = r * 0.5 * zero
    return r1 + half, r2 + half


def make_resnet_lrp_backward(params: ResNetParams, image: jax.Array,
                             *, r_dtype=None, stash_dtype=None,
                             w_dtype=None, stem_merge: bool | None = None,
                             pool_mode: str = "vjp"):
    """Forward-stash once, return (backward(r_feature) -> r_image, features).

    Relevance math runs in the image's floating dtype (float32 normally;
    float64 under x64 for the torch-1.4 oracle parity tests, where fp32
    forward drift amplified by near-zero LRP denominators would otherwise
    dominate).  ``r_dtype`` is the STORAGE dtype of the relevance map
    between block records (arithmetic stays in ``dtype``) — bfloat16 on TPU
    halves the walk's HBM traffic, same rationale as cnn_lrp's knob.
    ``stash_dtype`` is the storage dtype of the shared per-caption factor
    maps (x_in, folded BN-abs*zinv, add-split ratios, relu outputs) —
    stashed once, read per word; arithmetic promotes back to ``dtype`` at
    the point of use.  Default: the compute ``dtype`` (NOT ``r_dtype``) —
    measured on v5e, bf16 stash is ~3% SLOWER for this walk (91.9 vs 89.3
    img/s walk-only A/B): beyond the stem the maps are <=56² so the walk is
    not HBM-bound and the cast overhead wins; the opposite of the VGG walk,
    where bf16 stash bought +21% end to end.  ``w_dtype`` is the separate
    weight-STORAGE axis (see ``_conv_ab_vjp``): the per-word backward
    re-reads the clamped kernels (~94 MB f32 for ResNet-50) every word —
    small maps made the stash cast a loss, but weights dwarf the maps
    here.  Applied to the nonneg block convs only (the stem's clamped pair
    is one 7x7x3 kernel — noise)."""
    dtype = (image.dtype if jnp.issubdtype(image.dtype, jnp.floating)
             else jnp.float32)
    if r_dtype is None:
        r_dtype = dtype
    if stash_dtype is None:
        stash_dtype = dtype
    x = image.astype(dtype)

    # stem.  stem_merge (None = auto ON): like cnn_lrp's conv1_merge, the
    # signed input layer's clamped backward needs BOTH a w+ and a w- data-
    # grad over the same cotangent; concatenating the flipped kernels on
    # the output-channel axis computes both in ONE strided conv_transpose
    # (halves that stage's conv launches and cotangent reads; same linear
    # map — the two output slices ARE the two grads, pinned bit-identical
    # in tests/test_resnet.py::test_resnet_lrp_stem_merge_bitexact).
    # Measured in situ on v5e (bench.py --encoder resnet50
    # --conv1-merge 0/1, iters=20): 249.0 vs 201.4 img/s — +23.6%; the
    # stem's two Cout=3 strided transposes were a large fixed cost of this
    # small-map walk.
    if stem_merge is None:
        stem_merge = True
    stem_x = x
    stem_z, stem_vjp = _conv_ab_vjp(params.stem, x)
    if stem_merge:
        w_st = params.stem.weight
        cin_st = w_st.shape[2]
        t2 = _strided_conv_transpose(
            jnp.maximum(w_st, 0.0), params.stem.stride, stem_x.shape,
            stem_z.shape, extra_weight=jnp.minimum(w_st, 0.0))
        sp_st, sn_st = stem_x > 0, stem_x < 0

        def stem_vjp(s, t2=t2, sp=sp_st, sn=sn_st, cin=cin_st,
                     out=stem_x.dtype):
            g = t2(s)
            return ((jnp.where(sp, g[..., :cin], 0.0)
                     + jnp.where(sn, g[..., cin:], 0.0)).astype(out),)
    a = conv(params.stem, x)
    stem_a = a
    x = jax.nn.relu(bn(params.stem, a))
    pool_in = x
    pool_z = maxpool3x3s2(x)
    if pool_mode == "fast":
        # RECORDED NEGATIVE (default stays "vjp"): precomputed first-winner
        # tap masks; the per-word backward is 9 masked shifts + one
        # interleaving reshape instead of a SelectAndScatter custom-call.
        # Identical tie routing and support (pinned in
        # tests/test_resnet.py::test_resnet_pool_fast_vs_vjp; values differ
        # only by summation order, ~1e-7 relative).  Measured on v5e: the
        # per-word SelectAndScatter costs 2.04 ms/img for 16 words (HALF
        # the resnet explain program) — but the mask form does not beat it:
        # interior-dilation lax.pads run 10.4 ms standalone (~5x), and this
        # parity-phase form ties standalone (2.49) yet LOSES 25% in situ
        # (187.5 vs 249.0 img/s headline) — the stack/reshape interleave
        # breaks the per-word fusion that the elementwise chain around the
        # custom-call otherwise enjoys.  The overlapping-pool stage is
        # treated as practically bound at the S&S form.
        pool_masks = _pool3x3s2_first_winner_masks(x, pool_z)

        def pool_vjp(s, masks=pool_masks):
            return (_pool3x3s2_fast_bwd(masks, s),)
    else:
        _, pool_vjp = jax.vjp(maxpool3x3s2, x)
    x = pool_z

    def _stab_inv(z):
        return 1.0 / (z + Z_EPSILON * (z == 0).astype(z.dtype))

    def _bn_factor(p, a):
        xw = a * p.bn_scale
        return safe_divide(jnp.abs(xw), jnp.abs(xw) + jnp.abs(p.bn_shift))

    def _st(m):
        return m.astype(stash_dtype)

    block_recs = []
    for stage in params.layers:
        for p in stage:
            rec = {"x_in": _st(x)}
            # every conv input here is post-relu (block inputs come out of a
            # relu; stem output passed through relu+maxpool) -> nonneg
            z1, v1 = _conv_ab_vjp(p.conv1, x, nonneg=True, w_dtype=w_dtype)
            a1 = conv(p.conv1, x)
            r1 = jax.nn.relu(bn(p.conv1, a1))
            z2, v2 = _conv_ab_vjp(p.conv2, r1, nonneg=True, w_dtype=w_dtype)
            a2 = conv(p.conv2, r1)
            r2 = jax.nn.relu(bn(p.conv2, a2))
            z3, v3 = _conv_ab_vjp(p.conv3, r2, nonneg=True, w_dtype=w_dtype)
            a3 = conv(p.conv3, r2)
            b3 = bn(p.conv3, a3)
            if p.downsample is not None:
                zd, vd = _conv_ab_vjp(p.downsample, x, nonneg=True, w_dtype=w_dtype)
                ad = conv(p.downsample, x)
                idn = bn(p.downsample, ad)
                # fold the BN-abs factor with the stabilized reciprocal into
                # ONE shared map per conv (word-independent; the per-word
                # backward is then multiply -> vjp -> multiply, no divides)
                rec.update(vd=vd, md=_st(_bn_factor(p.downsample, ad)
                                         * _stab_inv(zd)))
            else:
                idn = x
            # add-split factors with the half-half zero-output guard,
            # precomputed once (the reference recomputes the ratios per word)
            out = b3 + idn
            zero = out == 0
            denom = out + EPSILON * jnp.sign(out)
            safe_den = jnp.where(zero, 1.0, denom)
            f_b3 = jnp.where(zero, 0.0, b3 / safe_den) + 0.5 * zero
            f_idn = jnp.where(zero, 0.0, idn / safe_den) + 0.5 * zero
            rec.update(p=p, v1=v1, v2=v2, v3=v3, r1=_st(r1), r2=_st(r2),
                       f_b3=_st(f_b3), f_idn=_st(f_idn),
                       m1=_st(_bn_factor(p.conv1, a1) * _stab_inv(z1)),
                       m2=_st(_bn_factor(p.conv2, a2) * _stab_inv(z2)),
                       m3=_st(_bn_factor(p.conv3, a3) * _stab_inv(z3)))
            x = jax.nn.relu(b3 + idn)
            block_recs.append(rec)
    features = x

    pool_zinv = _st(_stab_inv(pool_z))
    m_stem = _st(_bn_factor(params.stem, stem_a) * _stab_inv(stem_z))
    pool_in_s = _st(pool_in)
    stem_x_s = _st(stem_x)

    def backward(r: jax.Array) -> jax.Array:
        r = r.astype(dtype)
        for rec in reversed(block_recs):
            p = rec["p"]
            r = r.astype(dtype)
            r_b3 = rec["f_b3"] * r  # relu identity, then add split
            r_idn = rec["f_idn"] * r
            # main path
            (rm,) = rec["v3"](rec["m3"] * r_b3)
            (rm,) = rec["v2"](rec["m2"] * (rec["r2"] * rm))
            (rm,) = rec["v1"](rec["m1"] * (rec["r1"] * rm))
            rm = rec["x_in"] * rm
            # identity path
            if p.downsample is not None:
                (ri,) = rec["vd"](rec["md"] * r_idn)
                ri = rec["x_in"] * ri
            else:
                ri = r_idn
            r = (rm + ri).astype(r_dtype)
        # stem: maxpool winner, relu identity, bn, conv
        r = r.astype(dtype)
        (g,) = pool_vjp((r * pool_zinv).astype(dtype))
        (g,) = stem_vjp((m_stem * (pool_in_s * g)).astype(dtype))
        return stem_x_s.astype(dtype) * g

    return backward, features


def make_resnet_guided_backward(params: ResNetParams, image: jax.Array):
    """Guided backprop through ResNet: the true linear backward of every
    conv/bn/pool with the guided rule ``clamp(grad, 0) * (relu_out > 0)`` at
    EVERY ReLU (the reference registers its hooks on all ReLU children,
    gridTDmodel.py:1687-1691)."""
    x = image.astype(jnp.float32)

    def guided_relu(g, out):
        return jnp.maximum(g, 0.0) * (out > 0)

    def track(fn, xx):
        return jax.vjp(fn, xx)

    stem_out, stem_vjp = track(lambda t: bn(params.stem, conv(params.stem, t)), x)
    relu1 = jax.nn.relu(stem_out)
    _, pool_vjp = track(maxpool3x3s2, relu1)
    x = maxpool3x3s2(relu1)

    block_recs = []
    for stage in params.layers:
        for p in stage:
            rec = {}
            z1, v1 = track(lambda t, p=p: bn(p.conv1, conv(p.conv1, t)), x)
            r1 = jax.nn.relu(z1)
            z2, v2 = track(lambda t, p=p: bn(p.conv2, conv(p.conv2, t)), r1)
            r2 = jax.nn.relu(z2)
            z3, v3 = track(lambda t, p=p: bn(p.conv3, conv(p.conv3, t)), r2)
            if p.downsample is not None:
                _, vd = track(
                    lambda t, p=p: bn(p.downsample, conv(p.downsample, t)), x
                )
                idn = bn(p.downsample, conv(p.downsample, x))
            else:
                vd, idn = None, x
            out = jax.nn.relu(z3 + idn)
            rec.update(v1=v1, v2=v2, v3=v3, vd=vd, r1=r1, r2=r2, out=out)
            block_recs.append(rec)
            x = out
    features = x

    def backward(g):
        g = g.astype(jnp.float32)
        for rec in reversed(block_recs):
            g = guided_relu(g, rec["out"])
            gm = rec["v3"](g)[0]
            gm = guided_relu(gm, rec["r2"])
            gm = rec["v2"](gm)[0]
            gm = guided_relu(gm, rec["r1"])
            gm = rec["v1"](gm)[0]
            gi = rec["vd"](g)[0] if rec["vd"] is not None else g
            g = gm + gi
        (g,) = pool_vjp(g)
        g = guided_relu(g, relu1)
        (g,) = stem_vjp(g)
        return g

    return backward, features
