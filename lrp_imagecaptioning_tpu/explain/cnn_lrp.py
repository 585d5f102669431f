"""CNN-stage LRP: explicit rule interpreter over the encoder layer IR.

Replaces the reference's forward/backward-hook machinery
(``LRPtools/lrp_wrapper.py:37-87`` + ``LRPtools/lrp_modules.py``) with a walk
over the explicit VGG IR (``..models.encoders.VGG16_SPEC``):

- Conv2d -> alpha-beta rule with alpha=1, beta=0, ignore_bias=True (the
  ``SequentialPresetA`` defaults, lrp_wrapper.py:7-12,42-56).  The reference
  computes it as gradient-of-clamped-weight-forward (PosNetConv + lrp_backward,
  lrp_modules.py:56-151); here that is one ``jax.vjp`` through
  ``conv(relu(x), w+) + conv(-relu(-x), w-)`` — same math, XLA-fused,
- ReLU -> identity rule (lrp_wrapper.py:51-52),
- MaxPool -> winner-take-all via the gradient trick with ``safe_divide``
  (lrp_modules.py:172-195, Z_EPSILON = 1e-7),
- the relevance seed is the decoder walk's ``r_img_feature`` reshaped onto the
  feature grid; the result is per-pixel input relevance.

Relevance dtype is float32 end to end regardless of the forward compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.encoders import ConvParams, VGG16_SPEC, VGGLayer, VGGParams, conv2d, maxpool2x2
from .rules import Z_EPSILON, safe_divide


def conv_alpha_beta(
    p: ConvParams, x: jax.Array, r_out: jax.Array, *,
    alpha: float = 1.0, beta: float = 0.0,
) -> jax.Array:
    """Alpha-beta rule for a conv layer, ignore_bias=True.

    z+ = conv(x+, w+) + conv(x-, w-) collects the positive contributions;
    z- = conv(x-, w+) + conv(x+, w-) the negative ones (lrp_modules.py:81-114).
    R_in = alpha * X * d/dX [z+ . R/z+] - beta * X * d/dX [z- . R/z-]."""
    x = x.astype(jnp.float32)
    r_out = r_out.astype(jnp.float32)
    w_pos = ConvParams(jnp.maximum(p.weight, 0.0).astype(jnp.float32), None)
    w_neg = ConvParams(jnp.minimum(p.weight, 0.0).astype(jnp.float32), None)

    def pos_forward(xx):
        return conv2d(w_pos, jnp.maximum(xx, 0.0)) + conv2d(w_neg, jnp.minimum(xx, 0.0))

    def neg_forward(xx):
        return conv2d(w_pos, jnp.minimum(xx, 0.0)) + conv2d(w_neg, jnp.maximum(xx, 0.0))

    def one_side(fwd):
        z, vjp = jax.vjp(fwd, x)
        (grad,) = vjp(safe_divide(r_out, z))
        return x * grad

    r = alpha * one_side(pos_forward)
    if beta != 0.0:
        r = r - beta * one_side(neg_forward)
    return r


def maxpool_winner(x: jax.Array, r_out: jax.Array) -> jax.Array:
    """Winner-take-all pool rule via the gradient trick (lrp_modules.py:182-195)."""
    x = x.astype(jnp.float32)
    z, vjp = jax.vjp(maxpool2x2, x)
    (grad,) = vjp(safe_divide(r_out.astype(jnp.float32), z))
    return x * grad


def vgg_lrp(
    params: VGGParams,
    image: jax.Array,  # (B, H, W, 3)
    r_feature: jax.Array,  # (B, h, w, C) relevance seeded on the output grid
    *,
    spec: tuple[VGGLayer, ...] = VGG16_SPEC,
) -> jax.Array:
    """Backward relevance pass through the conv stack; returns (B, H, W, 3).

    Equivalent to the reference's ``model.compute_lrp(img, target=R)``
    (lrp_wrapper.py:63-87) with hooks replaced by an explicit reversed walk
    over the layer IR and its stashed inputs."""
    x = image.astype(jnp.float32)
    stash: list[jax.Array] = []
    for layer in spec:
        stash.append(x)
        if layer.kind == "conv":
            x = conv2d(params.convs[layer.param_idx], x)
        elif layer.kind == "relu":
            x = jax.nn.relu(x)
        elif layer.kind == "maxpool":
            x = maxpool2x2(x)

    r = r_feature.astype(jnp.float32)
    for layer, x_in in zip(reversed(spec), reversed(stash)):
        if layer.kind == "conv":
            r = conv_alpha_beta(params.convs[layer.param_idx], x_in, r)
        elif layer.kind == "relu":
            pass  # identity rule (lrp_wrapper.py:51-52)
        elif layer.kind == "maxpool":
            r = maxpool_winner(x_in, r)
    return r


def _flip_io(w: jax.Array) -> jax.Array:
    """HWIO kernel of the data-grad of a stride-1 SAME odd conv: spatial
    flip + in/out channel swap (the conv-transpose kernel)."""
    return w[::-1, ::-1].swapaxes(2, 3)


def _conv_transpose_same(g: jax.Array, wt: jax.Array) -> jax.Array:
    """Data-grad of a 3x3/stride-1/SAME conv as ONE explicit conv with the
    prepared kernel from :func:`_flip_io`, run in the kernel's STORAGE dtype
    with float32 accumulation (``preferred_element_type``).

    Exists so the walk can store the clamped conv weights in bfloat16:
    ``jax.vjp``'s transpose rule rejects mixed-dtype conv operands, and on
    this backend the f32-weight conv rounds its operands to bf16 internally
    anyway (proved bit-exact by the block-1 Pallas kernel), so bf16 STORAGE
    of the w+/w- kernels halves the weight-read traffic that dominates
    blocks 4-5 of the walk (roofline artifact: 23.6 / 28.3 MB of weight
    bytes PER WORD vs 11.6 / 3.8 MB of maps) at the rounding the hardware
    already injects."""
    return jax.lax.conv_general_dilated(
        g.astype(wt.dtype), wt, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _upsample2x(z: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x spatial upsample of an NHWC map (inverse of the
    2x2/stride-2 pool grid)."""
    return jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)


def first_winner_mask(x: jax.Array) -> jax.Array:
    """Boolean map marking the FIRST maximal element of each 2x2/stride-2
    window in row-major scan order.

    Exact positive ties inside a window are not measure-zero on real images
    (constant borders, saturated regions propagate identical activations);
    both torch's ``max_pool2d`` backward — the reference Pool2d rule,
    lrp_modules.py:182-195 — and XLA's SelectAndScatter route the whole
    gradient to the first tied element (probed, round 3), so the fast
    winner-mask path must too or relevance is duplicated up to 4x per pool
    level, breaking conservation.  Computed once per caption; the per-word
    backward stays elementwise."""
    b, h, w, c = x.shape
    win = x == _upsample2x(maxpool2x2(x))
    v = win.reshape(b, h // 2, 2, w // 2, 2, c)
    w00, w01 = v[:, :, 0, :, 0], v[:, :, 0, :, 1]
    w10, w11 = v[:, :, 1, :, 0], v[:, :, 1, :, 1]
    first = jnp.stack(
        [jnp.stack([w00, w01 & ~w00], axis=3),
         jnp.stack([w10 & ~(w00 | w01), w11 & ~(w00 | w01 | w10)], axis=3)],
        axis=2,
    )
    return first.reshape(b, h, w, c)


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major: out[..., p*C + c] with
    p = 2*di + dj indexing the pixel's position inside its 2x2 block."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


# For output phase d (row or column), the three taps u of a 3x3/stride-1/SAME
# conv land at s2d block offset a (0-based index into a 2-tap kernel) and
# input phase dii, given the padding below:  out[i] reads blocks {i-1, i} for
# d=0 (pad (1,0)) and {i, i+1} for d=1 (pad (0,1)).  Derivation: input row of
# tap u at output row 2i+d is 2i+d+u-1 = 2(block)+phase.
_S2D_ROWMAP = {
    0: ((0, 1, 0), (1, 0, 1), (1, 1, 2)),  # (kernel_idx, in_phase, tap_u)
    1: ((0, 0, 0), (0, 1, 1), (1, 0, 2)),
}
_S2D_PAD = {0: (1, 0), 1: (0, 1)}


def s2d_phase_kernels(w: jax.Array):
    """Decompose a 3x3/stride-1/SAME conv's HWIO weight (3, 3, Cin, Cout)
    into four 2x2 kernels over the space-to-depth layout — one per output
    phase po = 2*dio + djo — such that

        concat_po conv(x_s2d, V_po, pad_po)  ==  s2d(conv(x, w, SAME))

    (phase-major channel layout on both sides).  Each V_po is
    (2, 2, 4*Cin, Cout) with 9 of its 16 (tap, in-phase) slots holding the
    original taps and the rest zero.  This moves the MXU-hostile
    224^2 x 64ch shape class onto the 112^2 x 256ch class (see
    ``make_vgg_lrp_backward``'s ``s2d_block1``)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    kernels = []
    for dio in range(2):
        for djo in range(2):
            v = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
            for a, dii, u in _S2D_ROWMAP[dio]:
                for b, djj, vv in _S2D_ROWMAP[djo]:
                    p = 2 * dii + djj
                    v = v.at[a, b, p * cin:(p + 1) * cin, :].set(w[u, vv])
            kernels.append((v, _S2D_PAD[dio], _S2D_PAD[djo]))
    return kernels


def s2d_dense_kernel(w: jax.Array) -> jax.Array:
    """Single-conv variant of :func:`s2d_phase_kernels`: one 3x3 HWIO kernel
    (3, 3, 4*Cin, 4*Cout) over the s2d layout with plain SAME padding such
    that ``conv(s2d(x), V, SAME) == s2d(conv(x, w, SAME))``.

    Each original tap appears once per output phase (36 of the 144
    (tap, in-phase, out-phase) channel-block slots are nonzero -> 4x the
    FLOPs of the original conv), traded for a single symmetric conv with no
    phase concat / minor-dim slicing: the data-grad is then ONE 3x3
    conv-transpose at 112^2 x 256ch — the shape class the walk's other
    convs run at 42-89% MXU roofline."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    # output phase d + tap u -> (SAME-padding kernel index P, input phase)
    def _pos(d, u):
        m = d + u - 1
        return (m - (m % 2)) // 2 + 1, m % 2

    v = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for dio in range(2):
        for djo in range(2):
            po = 2 * dio + djo
            for u in range(3):
                for vv in range(3):
                    p_r, dii = _pos(dio, u)
                    p_c, djj = _pos(djo, vv)
                    pi = 2 * dii + djj
                    v = v.at[p_r, p_c, pi * cin:(pi + 1) * cin,
                             po * cout:(po + 1) * cout].set(w[u, vv])
    return v


def s2d_conv_forward(kernels, x_s: jax.Array) -> jax.Array:
    """Apply the four phase kernels to an s2d map (B, h, w, 4*Cin) and
    concatenate the phase outputs -> (B, h, w, 4*Cout), phase-major."""
    outs = [
        jax.lax.conv_general_dilated(
            x_s, v, window_strides=(1, 1), padding=(rpad, cpad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        for v, rpad, cpad in kernels
    ]
    return jnp.concatenate(outs, axis=-1)


_TAPS3 = tuple((dy, dx) for dy in range(3) for dx in range(3))


def _conv_tap_matrix(w: jax.Array, *, clamped: bool) -> jax.Array:
    """Pack a 3x3 HWIO kernel into one GEMM right-operand for the
    tap-unrolled data-grad (see ``_tap_conv_transpose``).

    ``clamped=True`` packs BOTH weight branches of the alpha-beta rule's
    clamped forward: columns ``[2*Cin*t : 2*Cin*t+Cin]`` hold
    ``max(w,0)[dy,dx]`` and the next ``Cin`` hold ``min(w,0)[dy,dx]`` for tap
    ``t = 3*dy+dx`` — (Cout, 18*Cin).  ``clamped=False`` packs the plain
    kernel — (Cout, 9*Cin)."""
    w = w.astype(jnp.float32)
    branches = ((jnp.maximum(w, 0.0), jnp.minimum(w, 0.0)) if clamped
                else (w,))
    cols = []
    for dy, dx in _TAPS3:
        for b in branches:
            cols.append(b[dy, dx].T)  # (Cout, Cin)
    return jnp.concatenate(cols, axis=1)


def _tap_conv_transpose(s: jax.Array, tap_w: jax.Array, cin: int,
                        *, clamped: bool):
    """Data-grad of a 3x3/stride-1/SAME conv with TINY input channel count,
    reformulated as ONE tap-unrolled GEMM.

    A transposed 3x3 conv to Cin=3 output channels pads the MXU's 128 lanes
    3 wide (~42x wasted FLOPs per branch — the roofline artifact put conv1_1
    at 8% MXU while being half the walk).  Instead: a 3x3 transposed conv is
    9 shifted 1x1 convs, so packing all 9 taps (and, for the clamped
    alpha-beta backward, both +/- weight branches) into the GEMM's N
    dimension gives one [M, Cout] @ [Cout, 9*branches*Cin] dot (54 columns
    for conv1_1 — inside one 128-lane tile), followed by 9 spatially-shifted
    adds.  Measured on v5e: wins isolated (1.32 -> 0.92 ms per 8-image x
    8-word chunk, tools/bench_conv1_tapgemm.py) but LOSES in situ (see
    ``make_vgg_lrp_backward``'s ``conv1_tap`` docs — the production stage
    is HBM-bound and already operand-fused by XLA); default OFF.

    ``s`` (B, H, W, Cout) is the upstream sensitivity; returns ``(gp, gn)``
    (each (B, H, W, cin)) for ``clamped=True`` — the grads through the w+
    and w- branches — or the single grad for ``clamped=False``."""
    _, h, w_, _ = s.shape
    # explicit one-pass precision: the explainer pins BF16_BF16_F32_X3 over
    # the whole explain program (for the decoder-walk matmuls); the conv
    # data-grads ignore it on this backend but THIS einsum would honor it
    # and run 3 passes.  One bf16 pass is exactly what the conv_transpose
    # it replaces executes (measured bit-identical across settings).
    contrib = jnp.einsum("bhwk,kn->bhwn", s, tap_w,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT)
    # materialize ONCE: without the barrier XLA may fuse the GEMM into each
    # of the 9 shifted-slice consumers and recompute it per tap
    contrib = jax.lax.optimization_barrier(contrib)
    cp = jnp.pad(contrib, ((0, 0), (1, 1), (1, 1), (0, 0)))
    per_tap = (2 * cin) if clamped else cin
    gp = 0.0
    gn = 0.0
    for t, (dy, dx) in enumerate(_TAPS3):
        sl = cp[:, 2 - dy:2 - dy + h, 2 - dx:2 - dx + w_,
                per_tap * t:per_tap * (t + 1)]
        gp = gp + sl[..., :cin]
        if clamped:
            gn = gn + sl[..., cin:]
    return (gp, gn) if clamped else gp


def make_vgg_lrp_backward(
    params: VGGParams,
    image: jax.Array,  # (1, H, W, 3) — single image
    *,
    spec: tuple[VGGLayer, ...] = VGG16_SPEC,
    pool_mode: str = "fast",
    r_dtype=jnp.float32,
    stash_dtype=None,
    w_dtype=None,
    fuse_stash: bool | None = None,
    conv1_tap: bool | None = None,
    s2d_block1: bool | None = None,
    conv1_merge: bool | None = None,
):
    """Amortized per-caption CNN LRP: run the forward (and each rule's
    clamped-weight forward) ONCE, capture the per-layer vjp closures — which
    are linear in the relevance — and return a backward function to apply per
    explained word.  Explaining T words then costs T linear backward passes
    but only one forward stash (the reference re-fires all hooks per word,
    gridTDmodel.py:1147-1152).

    ``pool_mode`` selects the maxpool winner-take-all implementation:

    - ``"fast"`` (default): the boolean winner map ``W = (x == up(z)) & (x>0)``
      is precomputed ONCE per caption in the shared stash; each per-word
      backward is then ``W * up(r)`` — pure elementwise, no per-word
      SelectAndScatter.  Pool inputs are post-ReLU (x >= 0) in VGG, so the
      winner-take-all rule ``x * scatter(r/z)`` equals exactly ``r`` at the
      window argmax and 0 elsewhere (all-zero windows: the x factor kills the
      r/eps term).  The only divergence from the vjp form is exact positive
      ties inside a 2x2 window (relevance is then credited to every tied
      winner instead of one), measure-zero for float activations.
    - ``"vjp"``: the reference-faithful gradient trick
      (lrp_modules.py:182-195) via SelectAndScatter per word.

    ``r_dtype`` is the STORAGE dtype of the per-word relevance map between
    layers (all arithmetic stays f32).  ``bfloat16`` halves the dominant
    HBM traffic of the walk; on this TPU backend the conv data-grads round
    their operands to bf16 internally anyway (measured bit-identical across
    every matmul-precision setting, and max-rel ~7e-3 vs the CPU f32 walk
    with f32 storage), so bf16 storage adds error of the same order that
    the hardware already injects.  CPU/parity paths keep the f32 default.

    ``stash_dtype`` is the STORAGE dtype of the shared per-caption stash
    maps (x_in and the stabilized reciprocals) — stashed once but READ per
    word, so they are the other half of the walk's HBM traffic.  Defaults
    to ``r_dtype`` (bf16 on TPU via the explainer auto-default, f32 on
    CPU/parity paths).  Winner masks are always stored as bool (1 byte,
    exact).

    ``w_dtype`` is the STORAGE dtype of the clamped conv-transpose kernels
    read by every per-word backward (defaults to ``stash_dtype``).  The
    roofline artifact puts blocks 4-5 at 23.6 / 28.3 MB of weight bytes
    PER WORD (vs 11.6 / 3.8 MB of maps) — the dominant traffic of the deep
    walk — and this backend rounds conv operands to bf16 internally
    regardless (measured bit-identical across precision settings), so
    bfloat16 weight storage halves that traffic at the rounding the
    hardware already injects.  When active (3x3/stride-1 convs only — all
    of VGG), the per-layer backward is an explicit
    :func:`_conv_transpose_same` instead of the ``jax.vjp`` closure
    (``vjp`` rejects mixed-dtype convs); the two are the same linear map.
    Because lax convs require MATCHING operand dtypes, ``w_dtype`` is also
    the operand dtype of the incoming per-word cotangent (the r*zinv
    product is cast to it before each transposed conv) — i.e. the knob
    rounds activations as well as weights.  A no-op on TPU (the hardware
    rounds conv operands to bf16 either way) but a real precision choice
    when forcing ``cnn_w_dtype=bfloat16`` on CPU.  Accumulation and the
    output gradient map stay float32 (``preferred_element_type``).

    ``conv1_tap`` reformulates the data-grad of tiny-input-channel convs
    (conv1_1's 64->3 clamped backward) as one tap-unrolled GEMM instead of
    two transposed convs — see ``_tap_conv_transpose``.  Default OFF: a
    measured NEGATIVE result in situ (v5e, production shapes).  Isolated,
    the GEMM form wins 1.32 -> 0.92 ms per 8-image x 8-word chunk
    (tools/bench_conv1_tapgemm.py) because with Cout=3 the MXU pads lanes
    3 -> 128; but in the full walk the vjp form costs only 0.45 ms/img for
    ALL 16 words (down_to-truncation A/B) — XLA operand-fuses the
    r*zinv / x_in*grad elementwise chain into the conv_transposes and the
    stage sits AT the HBM roofline (~26 MB/word of unavoidable operand
    traffic).  The tap form materializes a 54-channel contrib map and
    re-reads it for 9 shifted adds (~3x the traffic: measured 1.63 ms/img
    in situ, headline 128.5 -> 110.0).  The stage is memory-bound, so the
    GEMM's FLOP-efficiency win is irrelevant; neither explicit one-pass
    precision nor an optimization barrier changes it (both tried).
    """
    stash_dtype = r_dtype if stash_dtype is None else stash_dtype
    w_dtype = stash_dtype if w_dtype is None else w_dtype
    compact_w = jnp.dtype(w_dtype) != jnp.dtype(jnp.float32)
    if conv1_tap is None:
        conv1_tap = False
    if s2d_block1 is None:
        s2d_block1 = False
    # conv1_merge: the clamped-INPUT backward of the signed input layer
    # (conv1_1 — every other VGG conv is post-relu and already collapses to
    # ONE w+ conv_transpose) runs TWO conv_transposes over the SAME
    # cotangent s (w+ routed through x>0, w- through x<0).  XLA cannot
    # merge two conv custom-calls, but concatenating the flipped kernels on
    # the OUTPUT-channel axis turns them into ONE conv (3,3,64,2*Cin) whose
    # output slices are exactly the two grads: halves the conv launches,
    # the per-word HBM reads of s, and the fixed per-conv inefficiency of
    # the MXU-hostile Cout=3 shape at that stage.  BIT-IDENTICAL to the
    # two-conv form (per-output-channel contractions are independent;
    # pinned in tests/test_cnn_lrp.py).  None = auto ON for the compact
    # (w_dtype != f32, i.e. TPU) path — measured in situ on v5e
    # (bench.py --conv1-merge 0/1, iters=20, two run pairs):
    # 139.5/139.1 vs 128.6/128.6 img/s, a reproducible +8.2% headline win
    # — the round-3 tap postmortem's "0.45 ms/img" for this stage measured
    # only the marginal cost of the SECOND conv, not the dispatch+tile
    # overhead both convs pay.  The f32 path keeps the jax.vjp backward
    # (conv1_merge has no effect there), preserving CPU parity exactly.
    if conv1_merge is None:
        conv1_merge = True
    # Fused-map path (opt-in, measured SLOWER): adjacent per-caption
    # multipliers in the walk — x_in of conv k and zinv of the conv visited
    # next, or a pool winner and the zinv below it — multiply the same
    # tensor with no conv between, so they collapse into ONE precomputed
    # product map (30 -> ~17 per-word map reads on paper).  Measured on v5e
    # it LOSES: 111.0 vs 129.0 img/s end-to-end — XLA already fuses the
    # sequential multiplies into the conv-grad operands, so the "saved"
    # passes were free, while the product maps break that operand fusion
    # and add per-caption build work.  Default OFF; kept for reproduction
    # (fuse_stash=True) and as the recorded negative result.
    if fuse_stash is None:
        fuse_stash = False
    x = image.astype(jnp.float32)
    records = []  # (kind, x_in, z_rule, vjp)
    f32_records = []  # same, pre-cast (fusion builds f32 products)
    nonneg = False  # is the current activation provably >= 0 (post-relu)?
    for layer in spec:
        if layer.kind == "conv":
            p = params.convs[layer.param_idx]
            kh, kw, cin, _ = p.weight.shape
            if (conv1_tap and not nonneg and (kh, kw) == (3, 3)
                    and 18 * cin <= 128):
                # tiny-Cin clamped backward -> tap-unrolled GEMM (conv1_1)
                w_pos = ConvParams(
                    jnp.maximum(p.weight, 0.0).astype(jnp.float32), None)
                w_neg = ConvParams(
                    jnp.minimum(p.weight, 0.0).astype(jnp.float32), None)
                z = conv2d(w_pos, jnp.maximum(x, 0.0)) + conv2d(
                    w_neg, jnp.minimum(x, 0.0))
                zinv = 1.0 / (z + Z_EPSILON * (z == 0))
                tap_w = _conv_tap_matrix(p.weight, clamped=True)
                records.append(("conv_tap", x.astype(stash_dtype),
                                zinv.astype(stash_dtype), tap_w))
                if fuse_stash:
                    # the fused path (opt-in negative result) keeps the vjp
                    def pos_forward(xx, w_pos=w_pos, w_neg=w_neg):
                        return conv2d(w_pos, jnp.maximum(xx, 0.0)) + conv2d(
                            w_neg, jnp.minimum(xx, 0.0))

                    f32_records.append(
                        ("conv", x, zinv, jax.vjp(pos_forward, x)[1]))
                else:
                    f32_records.append(("conv", x, zinv, None))
                x = conv2d(p, x)
                nonneg = False
                continue
            w_pos = ConvParams(jnp.maximum(p.weight, 0.0).astype(jnp.float32), None)
            if nonneg:
                # post-relu input: relu(x) == x and min(x, 0) == 0, so the
                # clamped-weight forward collapses to one w+ conv.  The vjp
                # differs from the clamped one only where x < 0 (nowhere) and
                # at exact zeros, where R = x * grad = 0 either way — exact.
                def pos_forward(xx, w_pos=w_pos):
                    return conv2d(w_pos, xx)
            else:
                w_neg = ConvParams(
                    jnp.minimum(p.weight, 0.0).astype(jnp.float32), None)

                def pos_forward(xx, w_pos=w_pos, w_neg=w_neg):
                    return conv2d(w_pos, jnp.maximum(xx, 0.0)) + conv2d(
                        w_neg, jnp.minimum(xx, 0.0)
                    )

            z, vjp = jax.vjp(pos_forward, x)
            if compact_w and (kh, kw) == (3, 3):
                # explicit conv-transpose with compact-dtype kernels (see
                # the w_dtype docs above); same linear map as `vjp`, with
                # the weight-read traffic halved for the per-word backward.
                wtp = _flip_io(jnp.maximum(p.weight, 0.0)
                               .astype(jnp.float32)).astype(w_dtype)
                if nonneg:
                    def bwd(s, wtp=wtp):
                        return (_conv_transpose_same(s, wtp),)
                else:
                    # clamped-input forward: d/dx routes the w+ grad through
                    # x>0 and the w- grad through x<0 (the vjp of max/min)
                    wtn = _flip_io(jnp.minimum(p.weight, 0.0)
                                   .astype(jnp.float32)).astype(w_dtype)
                    sp, sn = x > 0, x < 0

                    if conv1_merge:
                        # one conv, kernels concatenated on the output-
                        # channel axis (see the conv1_merge note above)
                        wt2 = jnp.concatenate([wtp, wtn], axis=-1)

                        def bwd(s, wt2=wt2, sp=sp, sn=sn, cin=cin):
                            g = _conv_transpose_same(s, wt2)
                            return (jnp.where(sp, g[..., :cin], 0.0)
                                    + jnp.where(sn, g[..., cin:], 0.0),)
                    else:
                        def bwd(s, wtp=wtp, wtn=wtn, sp=sp, sn=sn):
                            return (jnp.where(sp,
                                              _conv_transpose_same(s, wtp),
                                              0.0)
                                    + jnp.where(sn,
                                                _conv_transpose_same(s, wtn),
                                                0.0),)
            else:
                bwd = vjp
            # stash the stabilized reciprocal instead of z: the per-word
            # backward then multiplies instead of dividing (216M VPU divides
            # per 16-word image otherwise); r * (1/z~) == safe_divide(r, z)
            # to 1 ulp
            zinv = 1.0 / (z + Z_EPSILON * (z == 0))
            records.append(("conv", x.astype(stash_dtype),
                            zinv.astype(stash_dtype), bwd))
            f32_records.append(("conv", x, zinv, vjp))
            x = conv2d(p, x)
            nonneg = False
        elif layer.kind == "relu":
            records.append(("relu", x, None, None))
            f32_records.append(("relu", None, None, None))
            x = jax.nn.relu(x)
            nonneg = True
        elif layer.kind == "maxpool":
            if pool_mode == "fast":
                z = maxpool2x2(x)
                # pool inputs are post-ReLU (x >= 0), so the winner-take-all
                # rule x * scatter(r/z) equals r at the window argmax and 0
                # elsewhere (including all-zero windows, where the x factor
                # kills the r/eps term) — one exact boolean mask, no per-word
                # division or rounding.  first_winner_mask replicates the
                # reference's single-winner tie routing exactly.
                winner = first_winner_mask(x) & (x > 0)  # bool: 1-byte reads
                records.append(("maxpool_fast", winner, None, None))
                f32_records.append(("maxpool_fast", winner, None, None))
                x = z
            else:
                z, vjp = jax.vjp(maxpool2x2, x)
                zinv = 1.0 / (z + Z_EPSILON * (z == 0))
                records.append(("maxpool", x, zinv, vjp))
                f32_records.append(("maxpool", x, zinv, vjp))
                x = maxpool2x2(x)  # preserves non-negativity

    # Space-to-depth reformulation of the block-1 bottom stage (pool1 winner
    # scatter + conv1_2 alpha-beta backward).  Rationale: the conv1_2
    # data-grad at 224^2 x 64ch runs at ~8% of the MXU roofline and ~20% of
    # the HBM roofline (output/roofline_cnn_walk.json) — neither bound —
    # while every 112^2 x >=128ch conv in the walk achieves 42-89% MXU; the
    # 224^2 x 64ch SHAPE CLASS is the poison (64 channels fill half a lane
    # register, and both XLA and a hand-written Mosaic kernel tie at ~3.2-3.4
    # ms/img there).  The fix is structural: walk the segment in the s2d
    # layout, where the pool backward becomes a phase-broadcast elementwise
    # multiply and the conv1_2 data-grad becomes four 2x2 conv-transposes
    # whose OUTPUT is 256 channels at 112^2 (full lanes; contraction dim
    # 4 taps x 64).  FLOPs rise 16/9x (the phase kernels carry 9 taps in 16
    # slots), traded for the efficient shape class.  Numerically the same
    # chain up to float reassociation: the s2d forward is pinned equal to
    # s2d(conv(w+, .)) and the walk uses its jax.vjp (tests/test_cnn_s2d.py).
    #
    # MEASURED VERDICT (v5e in situ, bench.py --s2d {0,phase,dense},
    # iters=20): plain 129.2 img/s, phase 97.7, dense 111.4 — BOTH s2d forms
    # LOSE, so the default stays OFF.  Consistent with the conv1_tap lesson:
    # the production stage is HBM-bound (~0.45 ms/img with the elementwise
    # chain operand-fused into the conv_transposes), so trading FLOP
    # efficiency for MXU-friendly shapes only adds traffic — the phase form
    # pays cotangent concat/slice relayouts at 64-ch minor offsets, the dense
    # form pays 4x FLOPs plus double-width stash maps.  Kept opt-in for
    # reproduction and for non-HBM-bound deployments of the same shape class.
    if (s2d_block1 and not fuse_stash and pool_mode == "fast"
            and tuple(l.kind for l in spec[:5]) == _BLOCK1_KINDS
            and records[2][0] == "conv"
            and image.shape[1] % 2 == 0 and image.shape[2] % 2 == 0):
        dense = s2d_block1 == "dense"

        def _s2d_fwd_pos(w):
            """s2d-equivalent forward of conv(w, ., SAME) — 'dense' = one
            3x3 256-ch conv (no phase concat/slices, 4x FLOPs); 'phase' =
            four 2x2 convs (9/16-dense kernels, minor-dim slicing in the
            grad).  Measured on v5e in situ: phase 97.7 img/s vs plain
            129.2 — the phase form LOSES (cotangent concat/slice relayouts
            at 64-ch offsets)."""
            if dense:
                vd = ConvParams(s2d_dense_kernel(w), None)
                return lambda xs: conv2d(vd, xs)
            kernels = s2d_phase_kernels(w)
            return lambda xs: s2d_conv_forward(kernels, xs)

        w2 = params.convs[spec[2].param_idx].weight
        fwd2 = _s2d_fwd_pos(jnp.maximum(w2, 0.0).astype(jnp.float32))
        _, a1_f32, z2inv_f32, _ = f32_records[2]
        a1s = space_to_depth(a1_f32)
        _, vjp_s2d = jax.vjp(fwd2, a1s)
        # conv1_1 joins the s2d segment too (unless the tap-GEMM variant
        # claimed it): the whole pixels->pool1 walk then runs in the s2d
        # layout and the per-word depth_to_space happens on the tiny
        # 3-channel output map instead of the 64-channel intermediate.
        if records[0][0] == "conv":
            records[2] = ("conv_s2d", a1s.astype(stash_dtype),
                          space_to_depth(z2inv_f32).astype(stash_dtype),
                          vjp_s2d)
            w1 = params.convs[spec[0].param_idx].weight
            f1_pos = _s2d_fwd_pos(jnp.maximum(w1, 0.0).astype(jnp.float32))
            f1_neg = _s2d_fwd_pos(jnp.minimum(w1, 0.0).astype(jnp.float32))

            def clamped_fwd(xs):
                return (f1_pos(jnp.maximum(xs, 0.0))
                        + f1_neg(jnp.minimum(xs, 0.0)))

            _, img_f32, z1inv_f32, _ = f32_records[0]
            img_s = space_to_depth(img_f32)
            _, vjp1_s2d = jax.vjp(clamped_fwd, img_s)
            records[0] = ("conv_s2d_out", img_s.astype(stash_dtype),
                          space_to_depth(z1inv_f32).astype(stash_dtype),
                          vjp1_s2d)
        else:
            # conv1_tap holds conv1_1: leave the s2d segment after conv1_2
            records[2] = ("conv_s2d_out", a1s.astype(stash_dtype),
                          space_to_depth(z2inv_f32).astype(stash_dtype),
                          vjp_s2d)
        records[4] = ("maxpool_fast_s2d", space_to_depth(records[4][1]),
                      None, None)

    fused_ops = None
    if fuse_stash and pool_mode == "fast":
        fused_ops = []  # ("mul", map) | ("vjp", fn) | ("up", None)
        pending = None  # f32 multiplier awaiting fusion at current resolution
        for kind, x_in, z, vjp in reversed(f32_records):
            if kind == "relu":
                continue
            if kind == "conv":
                m = z if pending is None else pending * z
                fused_ops.append(("mul", m.astype(stash_dtype)))
                fused_ops.append(("vjp", vjp))
                pending = x_in
            else:  # maxpool_fast: x_in holds the boolean winner
                if pending is not None:
                    fused_ops.append(("mul", pending.astype(stash_dtype)))
                fused_ops.append(("up", None))
                pending = x_in  # bool; fuses into the next conv's zinv
        if pending is not None:
            fused_ops.append(("mul", pending.astype(stash_dtype)))

    def backward(r_feature: jax.Array, *, down_to: int = 0,
                 up_from: int | None = None) -> jax.Array:
        """Walk relevance from record index ``up_from`` (None = the feature
        grid) down to record index ``down_to`` (0 = all the way to input
        pixels; record index == spec index — used by the block-1 kernel
        split, the depth diagnostics in tools/bench_cnn_stages.py, and the
        two-level word chunking in the explainer)."""
        if down_to == 0 and up_from is None and fused_ops is not None:
            r = r_feature.astype(jnp.float32)
            for kind, arr in fused_ops:
                if kind == "mul":
                    r = (r * arr.astype(jnp.float32)).astype(r_dtype)
                elif kind == "up":
                    r = _upsample2x(r.astype(jnp.float32))
                else:  # vjp
                    (r,) = arr(r.astype(jnp.float32))
            return r.astype(jnp.float32)
        r = r_feature.astype(jnp.float32)
        for kind, x_in, z, vjp in reversed(records[down_to:up_from]):
            if kind == "relu":
                continue
            if kind == "maxpool_fast":
                r = jnp.where(x_in, _upsample2x(r.astype(jnp.float32)),
                              0.0).astype(r_dtype)
                continue
            if kind == "maxpool_fast_s2d":
                # s2d layout: the 2x upsample is a broadcast of the pool
                # output over the 4 phase groups (same map, phase-major)
                r = jnp.where(
                    x_in, jnp.tile(r.astype(jnp.float32), (1, 1, 1, 4)), 0.0
                ).astype(r_dtype)
                continue
            if kind in ("conv_s2d", "conv_s2d_out"):
                (grad,) = vjp(r.astype(jnp.float32) * z.astype(jnp.float32))
                r = (x_in.astype(jnp.float32) * grad)
                if kind == "conv_s2d_out":  # leave the s2d segment
                    r = depth_to_space(r)
                r = r.astype(r_dtype)
                continue
            if kind == "conv_tap":
                # vjp slot holds the packed tap matrix; z the reciprocal
                s = r.astype(jnp.float32) * z.astype(jnp.float32)
                xf = x_in.astype(jnp.float32)
                gp, gn = _tap_conv_transpose(
                    s, vjp, xf.shape[-1], clamped=True)
                r = (jnp.maximum(xf, 0.0) * gp
                     + jnp.minimum(xf, 0.0) * gn).astype(r_dtype)
                continue
            # z slot holds the stabilized reciprocal (see the stash loop)
            (grad,) = vjp(r.astype(jnp.float32) * z.astype(jnp.float32))
            r = (x_in.astype(jnp.float32) * grad).astype(r_dtype)
        return r.astype(jnp.float32)

    backward.records = records  # exposed for the split walk below
    return backward, x  # final feature map as a bonus


_BLOCK1_KINDS = ("conv", "relu", "conv", "relu", "maxpool")


def make_vgg_lrp_backward_split(
    params: VGGParams,
    image: jax.Array,  # (1, H, W, 3)
    *,
    spec: tuple[VGGLayer, ...] = VGG16_SPEC,
    r_dtype=jnp.float32,
):
    """Split the per-caption walk for the fused block-1 Pallas kernel
    (ops/pallas_block1.py): returns ``(upper, block1_inputs)`` where
    ``upper(r_feature)`` walks every record ABOVE spec[:5] (producing the
    pool-1 output relevance, (1, H/2, W/2, C1)) and ``block1_inputs`` is the
    ``(winner, z2, a1, z1c, image, w2, w1)`` tuple the kernel consumes —
    all derived from the same shared stash, so kernel-on and kernel-off
    walks are numerically the same chain."""
    assert tuple(l.kind for l in spec[:5]) == _BLOCK1_KINDS, spec[:5]
    backward, final = make_vgg_lrp_backward(
        params, image, spec=spec, pool_mode="fast", r_dtype=r_dtype)
    rec = backward.records
    assert rec[4][0] == "maxpool_fast"

    def upper(r_feature: jax.Array) -> jax.Array:
        return backward(r_feature, down_to=5)

    # the records stash stabilized RECIPROCALS; the kernel wants the raw
    # pre-activations — recompute them (cheap, once per caption; the walk's
    # unused reciprocals for these two layers are DCE'd)
    w2 = params.convs[spec[2].param_idx].weight
    w1 = params.convs[spec[0].param_idx].weight
    a1 = rec[2][1].astype(jnp.float32)
    img = rec[0][1].astype(jnp.float32)
    z2 = conv2d(ConvParams(jnp.maximum(w2, 0.0), None), a1)
    z1c = (conv2d(ConvParams(jnp.maximum(w1, 0.0), None),
                  jnp.maximum(img, 0.0))
           + conv2d(ConvParams(jnp.minimum(w1, 0.0), None),
                    jnp.minimum(img, 0.0)))
    block1_inputs = dict(
        winner=rec[4][1][0].astype(jnp.float32),  # kernel consumes f32 mask
        z2=z2[0],             # conv1_2 pos-forward pre-activation
        a1=a1[0],             # conv1_2 input = relu(z1)
        z1c=z1c[0],           # conv1_1 clamped-forward pre-activation
        image=img[0],         # conv1_1 input = the (normalized) image
    )
    return upper, block1_inputs, (w2, w1)


def vgg_lrp_multi(
    params: VGGParams,
    image: jax.Array,  # (1, H, W, 3)
    r_features: jax.Array,  # (T, h, w, C) one relevance seed per word
    *,
    spec: tuple[VGGLayer, ...] = VGG16_SPEC,
) -> jax.Array:
    """All per-word CNN relevance maps with one shared forward stash."""
    backward, _ = make_vgg_lrp_backward(params, image, spec=spec)
    return jax.vmap(lambda r: backward(r[None])[0])(r_features)
