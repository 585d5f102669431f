"""Fused VGG block-1 LRP backward as a Pallas TPU kernel.

The per-word CNN relevance walk spends ~70% of its time in the 224^2 region
(measured per-layer on 1xv5e, tools/bench_cnn_layer_micro.py): the pool1
winner scatter, the conv1_2 alpha-beta backward and the conv1_1 clamped
backward each materialize ~0.8 GB of f32 maps per 8-word chunk in HBM.  This
kernel fuses the whole chain

    r_pool (T, H/2, W/2, C1)
      -> winner-mask upsample            (pool1 rule, lrp_modules.py:182-195)
      -> * z2inv, 3x3 conv-transpose w2+, * a1   (conv1_2 alpha-beta,
                                          lrp_modules.py:56-151, nonneg input)
      -> (relu identity)
      -> * z1inv, 3x3 conv-transpose w1+/w1-, * img+/-  (conv1_1 alpha-beta,
                                          two-branch clamped form)
      -> r_img (T, H, W, 3)

into one pass over row tiles, with the word loop INSIDE the kernel so every
shared map (winner*z2inv, a1, z1inv, image) is read from HBM once per tile
instead of once per word.  The 3x3 transposed convolutions are im2col
matmuls on the MXU; `dot_mode` selects bf16 (1 pass) or bf16x3 (hi/lo split,
f32-faithful) operands with f32 accumulation.

Everything is numerically the same walk as cnn_lrp.make_vgg_lrp_backward's
records for spec[:5] — see block1_lrp_backward_ref for the literal jnp
transcription used by the tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z_EPS_DEFAULT = 1e-7


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _up2_rows(x):
    r, w, c = x.shape
    return jnp.concatenate([x[:, None], x[:, None]], axis=1).reshape(
        2 * r, w, c)


def _up2_cols(x):
    r, w, c = x.shape
    return jnp.concatenate([x[:, :, None], x[:, :, None]], axis=2).reshape(
        r, 2 * w, c)


def _pad_cols(x):
    r, w, c = x.shape
    z = jnp.zeros((r, 1, c), x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def _patches(xp, shift_s, out_rows, w):
    """xp: (out_rows+2, w+2, c) zero-padded tile -> (out_rows*w, 9c).

    The dx-shifted views are first STORED into ``shift_s`` scratch — a
    column-offset slice carries a misaligned vector layout that Mosaic's
    concatenate refuses ("offset mismatch on non-concat dimension"); a store
    forces the canonical layout, and the remaining dy row-slices are
    layout-free.  ``shift_s`` may be larger than the tile (it is shared
    across the kernel's resolution levels); stores/reads use sub-ranges.
    Its dtype may be bf16 (bf16 dot mode) — the store casts."""
    rows, _, c = xp.shape
    xp = xp.astype(shift_s.dtype)
    for dx in range(3):
        shift_s[dx, 0:rows, 0:w, 0:c] = xp[:, dx:dx + w, :]
    cols = [shift_s[dx, dy:dy + out_rows, 0:w, 0:c]
            for dy in range(3) for dx in range(3)]
    p = jnp.concatenate(cols, axis=-1)
    return p.reshape(out_rows * w, p.shape[-1])


def _dot(p, wmat, wmat_lo, dot_mode):
    """im2col matmul with f32 accumulation.

    bf16: single-pass bf16 operands.  bf16x3: hi/lo split of BOTH operands,
    three cross terms (hi*hi + hi*lo + lo*hi) — f32-faithful to ~2^-22.

    Precision is pinned explicitly: an ambient
    ``jax.default_matmul_precision`` algorithm preset (the explain core
    sets BF16_BF16_F32_X3) reaches dots with precision=None and Mosaic's
    dot lowering rejects algorithm presets ('DotAlgorithmPreset is not
    subscriptable')."""
    prec = jax.lax.Precision.DEFAULT
    if dot_mode == "f32":
        return jnp.dot(p, wmat, preferred_element_type=jnp.float32,
                       precision=prec)
    p_hi = p.astype(jnp.bfloat16)
    if dot_mode == "bf16":
        return jnp.dot(p_hi, wmat.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32, precision=prec)
    # bf16x3
    p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w_hi = wmat.astype(jnp.bfloat16)
    out = jnp.dot(p_hi, w_hi, preferred_element_type=jnp.float32,
                  precision=prec)
    out += jnp.dot(p_lo, w_hi, preferred_element_type=jnp.float32,
                   precision=prec)
    out += jnp.dot(p_hi, wmat_lo.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32, precision=prec)
    return out


def _block1_kernel(
    # inputs (HBM unless noted); B = image batch, leading axis
    rp_ref,      # (B, T, H/2 + 2, W/2, C1) pool-out relevance, rows padded 1
    m2_ref,      # (B, H + 4, W, C1) winner_mask * z2inv, rows padded by 2
    a1_ref,      # (B, H + 2, W, C1) relu(z1), rows padded by 1
    z1i_ref,     # (B, H + 2, W, C1) 1/stab(z1c), rows padded by 1
    imgp_ref,    # (B, Cin, H*W) max(img, 0), channel-planar
    imgn_ref,    # (B, Cin, H*W) min(img, 0)
    w2f_ref,     # (9*C1, C1) VMEM — conv1_2 w+ flipped+transposed
    w2f_lo_ref,  # (9*C1, C1) VMEM — f32 residual of bf16(w2f) (x3 mode)
    w1f_ref,     # (9*C1, 2*Cin) VMEM — [w1+ | w1-] flipped+transposed
    w1f_lo_ref,  # (9*C1, 2*Cin) VMEM
    out_ref,     # (B, T, Cin, H*W) output in HBM, channel-planar
    # scratch
    m2_s, a1_s, z1i_s, imgp_s, imgn_s, rp_s, out_s, shift_s,
    in_sems, rp_sems, out_sems,
    *,
    T: int, R: int, W: int, C1: int, C1t: int, Cin: int, dot_mode: str,
):
    # C1 = DMA-padded channel width (128-aligned); C1t = true width — the
    # matmuls run at the true width (padding both K and N 64->128 was a
    # measured 4x FLOP waste), values are lane-sliced after load.
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * R

    # shared tiles: one DMA set per (image, row tile), reused by every word
    shared = (
        pltpu.make_async_copy(m2_ref.at[b, pl.ds(r0, R + 4)], m2_s,
                              in_sems.at[0]),
        pltpu.make_async_copy(a1_ref.at[b, pl.ds(r0, R + 2)], a1_s,
                              in_sems.at[1]),
        pltpu.make_async_copy(z1i_ref.at[b, pl.ds(r0, R + 2)], z1i_s,
                              in_sems.at[2]),
        pltpu.make_async_copy(imgp_ref.at[b, :, pl.ds(r0 * W, R * W)],
                              imgp_s, in_sems.at[3]),
        pltpu.make_async_copy(imgn_ref.at[b, :, pl.ds(r0 * W, R * W)],
                              imgn_s, in_sems.at[4]),
    )
    for dma in shared:
        dma.start()

    def rp_dma(t, slot):
        return pltpu.make_async_copy(
            rp_ref.at[b, t, pl.ds(r0 // 2, R // 2 + 2)],
            rp_s.at[slot],
            rp_sems.at[slot],
        )

    def out_dma(t, slot):
        return pltpu.make_async_copy(
            out_s.at[slot],
            out_ref.at[b, t, :, pl.ds(r0 * W, R * W)],
            out_sems.at[slot],
        )

    rp_dma(0, 0).start()
    for dma in shared:
        dma.wait()

    w2f = w2f_ref[:]
    w2f_lo = w2f_lo_ref[:]
    w1f = w1f_ref[:]
    w1f_lo = w1f_lo_ref[:]
    m2 = m2_s[:][..., :C1t]
    a1 = a1_s[:][..., :C1t]
    z1i = z1i_s[:][..., :C1t]
    imgp = imgp_s[:]  # (Cin, R*W) channel-planar
    imgn = imgn_s[:]

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < T)
        def _():
            rp_dma(t + 1, 1 - slot).start()

        rp_dma(t, slot).wait()
        # (R/2 + 2, W/2, C1t), rows [r0/2 - 1, r0/2 + R/2 + 1)
        rp = rp_s[slot][..., :C1t]

        # pool1 backward: winner-mask upsample, fused with /stab(z2)
        up = _up2_cols(_up2_rows(rp))  # rows [r0-2, r0+R+2) at full res
        t2 = up * m2  # (R+4, W, C1)

        # conv1_2 alpha-beta backward (nonneg input -> single w+ branch)
        g2 = _dot(_patches(_pad_cols(t2), shift_s, R + 2, W),
                  w2f, w2f_lo, dot_mode)
        ra1 = a1 * g2.reshape(R + 2, W, C1t)  # rows [r0-1, r0+R+1)

        # (relu identity) then conv1_1 clamped two-branch backward
        t1 = ra1 * z1i
        g1 = _dot(_patches(_pad_cols(t1), shift_s, R, W),
                  w1f, w1f_lo, dot_mode)
        # channel-planar epilogue: Cin=3-minor layouts are unsliceable in
        # HBM DMAs and unsplittable in VMEM, so the image/output live as
        # (Cin, H*W) and g1 (R*W, 2Cin) is transposed (tiny)
        g1t = jnp.transpose(g1)  # (2Cin, R*W)
        r_img = imgp * g1t[:Cin] + imgn * g1t[Cin:]

        # double-buffered writeback: wait for the DMA that used this slot
        @pl.when(t >= 2)
        def _():
            out_dma(t - 2, slot).wait()

        out_s[slot] = r_img
        out_dma(t, slot).start()
        return ()

    jax.lax.fori_loop(0, T, body, (), unroll=False)

    # T is static: drain the (up to two) outstanding writeback DMAs
    if T >= 2:
        out_dma(T - 2, T % 2).wait()
    out_dma(T - 1, (T - 1) % 2).wait()


def _flip_transpose(w):
    """(3, 3, ci, co) conv kernel -> (9*co, ci) im2col backward matrix:
    rows ordered (dy, dx, co) to match _patches' concat order."""
    wf = w[::-1, ::-1]  # (3, 3, ci, co) spatially flipped
    wf = jnp.transpose(wf, (0, 1, 3, 2))  # (3, 3, co, ci)
    return wf.reshape(-1, w.shape[2])


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_tile", "dot_mode", "z_eps", "interpret"))
def block1_lrp_backward(
    r_pool: jax.Array,   # (B, T, H/2, W/2, C1) per-word pool-out relevance
    winner: jax.Array,   # (B, H, W, C1) boolean/float pool winner mask
    z2: jax.Array,       # (B, H, W, C1) conv1_2 pos-forward pre-activation
    a1: jax.Array,       # (B, H, W, C1) relu(z1)
    z1c: jax.Array,      # (B, H, W, C1) conv1_1 clamped-forward pre-act
    image: jax.Array,    # (B, H, W, Cin)
    w2: jax.Array,       # (3, 3, C1, C1) conv1_2 raw weights
    w1: jax.Array,       # (3, 3, Cin, C1) conv1_1 raw weights
    *,
    rows_per_tile: int = 4,
    dot_mode: str = "bf16x3",
    z_eps: float = Z_EPS_DEFAULT,
    interpret: bool | None = None,
) -> jax.Array:            # (B, T, H, W, Cin)
    """Image batch is a leading kernel-grid axis (NOT jax.vmap — the Mosaic
    lowering does not support vmapping manually-DMA'd ANY-space refs)."""
    B, T, H2, W2, C1 = r_pool.shape
    H, W = 2 * H2, 2 * W2
    Cin = image.shape[-1]
    R = rows_per_tile
    assert R % 2 == 0 and H % R == 0, (H, R)

    f32 = jnp.float32
    # Mosaic HBM DMA slices must be aligned to the 128-lane tiling: zero-pad
    # the C1 channel axis to a 128 multiple everywhere (weights padded to
    # match, so padded channels contribute exact zeros).
    C1p = -(-C1 // 128) * 128
    if C1p != C1:
        cpad = C1p - C1
        r_pool = jnp.pad(r_pool, ((0, 0),) * 4 + ((0, cpad),))
        _ = cpad  # maps below pad to C1p; weights stay at the true width
        winner = jnp.pad(winner, ((0, 0),) * 3 + ((0, cpad),))
        z2 = jnp.pad(z2, ((0, 0),) * 3 + ((0, cpad),))
        a1 = jnp.pad(a1, ((0, 0),) * 3 + ((0, cpad),))
        z1c = jnp.pad(z1c, ((0, 0),) * 3 + ((0, cpad),))
    # the channel-planar image/output sublane dim must match the f32
    # sublane tile (8): pad Cin with zero channels (zero w1f columns keep
    # padded outputs exactly zero)
    Cin_k = -(-Cin // 8) * 8
    if Cin_k != Cin:
        image = jnp.pad(image, ((0, 0),) * 3 + ((0, Cin_k - Cin),))
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, Cin_k - Cin), (0, 0)))
    winner = winner.astype(f32)
    z2 = z2.astype(f32)
    z2inv = 1.0 / (z2 + z_eps * (z2 == 0))
    m2 = winner * z2inv
    z1c = z1c.astype(f32)
    z1inv = 1.0 / (z1c + z_eps * (z1c == 0))
    image = image.astype(f32)

    pad_rows = lambda x, n: jnp.pad(x, ((0, 0), (n, n), (0, 0), (0, 0)))
    m2_p = pad_rows(m2, 2)
    a1_p = pad_rows(a1.astype(f32), 1)
    z1i_p = pad_rows(z1inv, 1)
    img_planar = jnp.moveaxis(image, -1, 1).reshape(B, Cin_k, H * W)
    imgp = jnp.maximum(img_planar, 0.0)
    imgn = jnp.minimum(img_planar, 0.0)
    rp_p = jnp.pad(r_pool.astype(f32),
                   ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))

    w2p = jnp.maximum(w2.astype(f32), 0.0)
    w2f = _flip_transpose(w2p)  # (9*C1, C1)
    w1p = _flip_transpose(jnp.maximum(w1.astype(f32), 0.0))  # (9*C1, Cin)
    w1n = _flip_transpose(jnp.minimum(w1.astype(f32), 0.0))
    w1f = jnp.concatenate([w1p, w1n], axis=1)  # (9*C1, 2*Cin)
    w2f_lo = w2f - w2f.astype(jnp.bfloat16).astype(f32)
    w1f_lo = w1f - w1f.astype(jnp.bfloat16).astype(f32)

    kernel = functools.partial(
        _block1_kernel, T=T, R=R, W=W, C1=C1p, C1t=C1, Cin=Cin_k,
        dot_mode=dot_mode)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        out_shape=jax.ShapeDtypeStruct((B, T, Cin_k, H * W), f32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # rp
            pl.BlockSpec(memory_space=pltpu.ANY),  # m2
            pl.BlockSpec(memory_space=pltpu.ANY),  # a1
            pl.BlockSpec(memory_space=pltpu.ANY),  # z1i
            pl.BlockSpec(memory_space=pltpu.ANY),  # imgp
            pl.BlockSpec(memory_space=pltpu.ANY),  # imgn
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2f
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2f_lo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1f
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1f_lo
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((R + 4, W, C1p), f32),       # m2_s (DMA width)
            pltpu.VMEM((R + 2, W, C1p), f32),       # a1_s
            pltpu.VMEM((R + 2, W, C1p), f32),       # z1i_s
            pltpu.VMEM((Cin_k, R * W), f32),        # imgp_s
            pltpu.VMEM((Cin_k, R * W), f32),        # imgn_s
            pltpu.VMEM((2, R // 2 + 2, W2, C1p), f32),  # rp_s (double buffer)
            pltpu.VMEM((2, Cin_k, R * W), f32),     # out_s (double buffer)
            pltpu.VMEM((3, R + 4, W, C1), f32),     # shift_s (true width)
            pltpu.SemaphoreType.DMA((5,)),          # shared-tile sems
            pltpu.SemaphoreType.DMA((2,)),          # rp sems
            pltpu.SemaphoreType.DMA((2,)),          # out sems
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * H * W * 9 * C1 * (C1 + 2 * Cin_k),
            bytes_accessed=4 * B * (T * (H2 * W2 * C1 + H * W * Cin)
                                    + 3 * H * W * C1),
            transcendentals=0,
        ),
        interpret=_use_interpret() if interpret is None else interpret,
    )(rp_p, m2_p, a1_p, z1i_p, imgp, imgn, w2f, w2f_lo, w1f, w1f_lo)
    return jnp.moveaxis(out.reshape(B, T, Cin_k, H, W), 2, -1)[..., :Cin]


def block1_lrp_backward_ref(
    r_pool, winner, z2, a1, z1c, image, w2, w1, *,
    z_eps: float = Z_EPS_DEFAULT,
):
    """Literal jnp transcription of the fused chain (the oracle for the
    kernel tests); matches cnn_lrp.make_vgg_lrp_backward's bottom five
    records bit-for-bit up to f32 reassociation.  Batched like the kernel:
    r_pool (B, T, H/2, W/2, C1), shared maps (B, H, W, C)."""
    from ..models.encoders import ConvParams, conv2d

    f32 = jnp.float32
    w2p = ConvParams(jnp.maximum(w2.astype(f32), 0.0), None)
    w1p = ConvParams(jnp.maximum(w1.astype(f32), 0.0), None)
    w1n = ConvParams(jnp.minimum(w1.astype(f32), 0.0), None)

    def one_image(rp_all, winner, z2, a1, z1c, image):
        winner = winner.astype(f32)
        z2 = z2.astype(f32)
        z1c = z1c.astype(f32)
        image = image.astype(f32)

        def one(rp):
            r_a2 = winner * jnp.repeat(jnp.repeat(rp, 2, 0), 2, 1)
            t2 = r_a2 / (z2 + z_eps * (z2 == 0))
            _, vjp2 = jax.vjp(
                lambda xx: conv2d(w2p, xx[None])[0], a1.astype(f32))
            (g2,) = vjp2(t2)
            ra1 = a1 * g2
            t1 = ra1 / (z1c + z_eps * (z1c == 0))

            def clamped(xx):
                return (conv2d(w1p, jnp.maximum(xx, 0.0)[None])[0]
                        + conv2d(w1n, jnp.minimum(xx, 0.0)[None])[0])

            _, vjp1 = jax.vjp(clamped, image)
            (g1,) = vjp1(t1)
            return image * g1

        return jax.vmap(one)(rp_all.astype(f32))

    return jax.vmap(one_image)(r_pool, winner, z2, a1, z1c, image)


# ---------------------------------------------------------------------------
# Extended fusion: blocks 1+2 (pool2 -> conv2_2 -> conv2_1 -> pool1 ->
# conv1_2 -> conv1_1) in one kernel.  The in-situ depth profile puts this
# region at ~6.1 of the walk's ~9.5 ms/img; crucially its INPUT is the
# pool-2 relevance at (H/4, W/4, C2=128) — native 128-lane minor, so the
# channel-padding HBM overhead that erased the block-1-only kernel's gains
# does not exist here.
# ---------------------------------------------------------------------------


def _block12_kernel(
    rp2_ref,    # (B, T, H/4 + 4, W/4, C2) pool2-out relevance, rows padded 2
    m22_ref,    # (B, H/2 + 6, W/2, C2) winner2 * z22inv, rows padded 3
    a21_ref,    # (B, H/2 + 4, W/2, C2) relu(bn-less conv2_1 out), pad 2
    z21i_ref,   # (B, H/2 + 4, W/2, C2) 1/stab(z21), rows padded 2
    x21_ref,    # (B, H/2 + 2, W/2, C1p) pool1 output, rows padded 1
    m1_ref,     # (B, H + 4, W, C1p) winner1 * z2inv, rows padded 2
    a1_ref,     # (B, H + 2, W, C1p) relu(z1), rows padded 1
    z1i_ref,    # (B, H + 2, W, C1p) 1/stab(z1c), rows padded 1
    imgp_ref,   # (B, Cin, H*W) channel-planar
    imgn_ref,   # (B, Cin, H*W)
    w22f_ref, w22f_lo_ref,  # (9*C2, C2)
    w21f_ref, w21f_lo_ref,  # (9*C2, C1t)
    w2f_ref, w2f_lo_ref,    # (9*C1t, C1t)
    w1f_ref, w1f_lo_ref,    # (9*C1t, 2*Cin)
    out_ref,    # (B, T, Cin, H*W)
    # scratch
    m22_s, a21_s, z21i_s, x21_s, m1_s, a1_s, z1i_s, imgp_s, imgn_s,
    rp_s, out_s, shift_s,
    in_sems, rp_sems, out_sems,
    *,
    T: int, R: int, W: int, C1p: int, C1t: int, C2: int, Cin: int,
    dot_mode: str,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * R
    W2 = W // 2

    shared = (
        pltpu.make_async_copy(m22_ref.at[b, pl.ds(r0 // 2, R // 2 + 6)],
                              m22_s, in_sems.at[0]),
        pltpu.make_async_copy(a21_ref.at[b, pl.ds(r0 // 2, R // 2 + 4)],
                              a21_s, in_sems.at[1]),
        pltpu.make_async_copy(z21i_ref.at[b, pl.ds(r0 // 2, R // 2 + 4)],
                              z21i_s, in_sems.at[2]),
        pltpu.make_async_copy(x21_ref.at[b, pl.ds(r0 // 2, R // 2 + 2)],
                              x21_s, in_sems.at[3]),
        pltpu.make_async_copy(m1_ref.at[b, pl.ds(r0, R + 4)], m1_s,
                              in_sems.at[4]),
        pltpu.make_async_copy(a1_ref.at[b, pl.ds(r0, R + 2)], a1_s,
                              in_sems.at[5]),
        pltpu.make_async_copy(z1i_ref.at[b, pl.ds(r0, R + 2)], z1i_s,
                              in_sems.at[6]),
        pltpu.make_async_copy(imgp_ref.at[b, :, pl.ds(r0 * W, R * W)],
                              imgp_s, in_sems.at[7]),
        pltpu.make_async_copy(imgn_ref.at[b, :, pl.ds(r0 * W, R * W)],
                              imgn_s, in_sems.at[8]),
    )
    for dma in shared:
        dma.start()

    def rp_dma(t, slot):
        return pltpu.make_async_copy(
            rp2_ref.at[b, t, pl.ds(r0 // 4, R // 4 + 4)],
            rp_s.at[slot], rp_sems.at[slot])

    def out_dma(t, slot):
        return pltpu.make_async_copy(
            out_s.at[slot], out_ref.at[b, t, :, pl.ds(r0 * W, R * W)],
            out_sems.at[slot])

    rp_dma(0, 0).start()
    for dma in shared:
        dma.wait()

    w22f, w22f_lo = w22f_ref[:], w22f_lo_ref[:]
    w21f, w21f_lo = w21f_ref[:], w21f_lo_ref[:]
    w2f, w2f_lo = w2f_ref[:], w2f_lo_ref[:]
    w1f, w1f_lo = w1f_ref[:], w1f_lo_ref[:]
    m22 = m22_s[:]
    a21 = a21_s[:]
    z21i = z21i_s[:]
    x21 = x21_s[:][..., :C1t]
    m1 = m1_s[:][..., :C1t]
    a1 = a1_s[:][..., :C1t]
    z1i = z1i_s[:][..., :C1t]
    imgp = imgp_s[:]
    imgn = imgn_s[:]

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < T)
        def _():
            rp_dma(t + 1, 1 - slot).start()

        rp_dma(t, slot).wait()
        rp2 = rp_s[slot]  # (R/4+4, W/4, C2), rows [r0/4-2, r0/4+R/4+2)

        # pool2 backward (winner-mask upsample fused with /stab(z22))
        up = _up2_cols(_up2_rows(rp2))  # rows [r0/2-4, r0/2+R/2+4)
        t22 = up[1:R // 2 + 7] * m22    # (R/2+6, W2, C2)

        # conv2_2 backward (nonneg input)
        g22 = _dot(_patches(_pad_cols(t22), shift_s, R // 2 + 4, W2),
                   w22f, w22f_lo, dot_mode)
        r21 = a21 * g22.reshape(R // 2 + 4, W2, C2)

        # conv2_1 backward
        t21 = r21 * z21i
        g21 = _dot(_patches(_pad_cols(t21), shift_s, R // 2 + 2, W2),
                   w21f, w21f_lo, dot_mode)
        rp1 = x21 * g21.reshape(R // 2 + 2, W2, C1t)

        # pool1 backward
        t2 = _up2_cols(_up2_rows(rp1)) * m1  # (R+4, W, C1t)

        # conv1_2 backward
        g2 = _dot(_patches(_pad_cols(t2), shift_s, R + 2, W),
                  w2f, w2f_lo, dot_mode)
        ra1 = a1 * g2.reshape(R + 2, W, C1t)

        # conv1_1 clamped two-branch backward, channel-planar epilogue
        t1 = ra1 * z1i
        g1 = _dot(_patches(_pad_cols(t1), shift_s, R, W),
                  w1f, w1f_lo, dot_mode)
        g1t = jnp.transpose(g1)  # (2Cin, R*W)
        r_img = imgp * g1t[:Cin] + imgn * g1t[Cin:]

        @pl.when(t >= 2)
        def _():
            out_dma(t - 2, slot).wait()

        out_s[slot] = r_img
        out_dma(t, slot).start()
        return ()

    jax.lax.fori_loop(0, T, body, (), unroll=False)
    if T >= 2:
        out_dma(T - 2, T % 2).wait()
    out_dma(T - 1, (T - 1) % 2).wait()


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_tile", "dot_mode", "z_eps", "interpret"))
def block12_lrp_backward(
    r_pool2: jax.Array,  # (B, T, H/4, W/4, C2) pool-2 output relevance
    winner2: jax.Array,  # (B, H/2, W/2, C2) pool-2 boolean winner mask
    z22: jax.Array,      # (B, H/2, W/2, C2) conv2_2 pos-forward pre-act
    a21: jax.Array,      # (B, H/2, W/2, C2) relu out of conv2_1
    z21: jax.Array,      # (B, H/2, W/2, C2) conv2_1 pos-forward pre-act
    x21: jax.Array,      # (B, H/2, W/2, C1) pool-1 output (conv2_1 input)
    winner1: jax.Array,  # (B, H, W, C1) pool-1 boolean winner mask
    z2: jax.Array,       # (B, H, W, C1) conv1_2 pos-forward pre-act
    a1: jax.Array,       # (B, H, W, C1) relu(z1)
    z1c: jax.Array,      # (B, H, W, C1) conv1_1 clamped-forward pre-act
    image: jax.Array,    # (B, H, W, Cin)
    w22: jax.Array,      # (3, 3, C2, C2) conv2_2 raw weights
    w21: jax.Array,      # (3, 3, C1, C2) conv2_1 raw weights
    w2: jax.Array,       # (3, 3, C1, C1) conv1_2 raw weights
    w1: jax.Array,       # (3, 3, Cin, C1) conv1_1 raw weights
    *,
    rows_per_tile: int = 4,
    dot_mode: str = "bf16",
    z_eps: float = Z_EPS_DEFAULT,
    interpret: bool | None = None,
) -> jax.Array:            # (B, T, H, W, Cin)
    B, T, H4, W4, C2 = r_pool2.shape
    H, W = 4 * H4, 4 * W4
    C1 = x21.shape[-1]
    Cin = image.shape[-1]
    R = rows_per_tile
    assert R % 4 == 0 and H % R == 0, (H, R)
    assert C2 % 128 == 0, C2  # native lane width — the input needs no pad

    f32 = jnp.float32

    def stab_inv(z):
        z = z.astype(f32)
        return 1.0 / (z + z_eps * (z == 0))

    C1p = -(-C1 // 128) * 128
    cpad = C1p - C1

    def pad_c(x):
        return (jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, cpad),))
                if cpad else x)

    Cin_k = -(-Cin // 8) * 8
    if Cin_k != Cin:
        image = jnp.pad(image, ((0, 0),) * 3 + ((0, Cin_k - Cin),))
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, Cin_k - Cin), (0, 0)))

    pad_rows = lambda x, n: jnp.pad(x, ((0, 0), (n, n), (0, 0), (0, 0)))
    m22_p = pad_rows(winner2.astype(f32) * stab_inv(z22), 3)
    a21_p = pad_rows(a21.astype(f32), 2)
    z21i_p = pad_rows(stab_inv(z21), 2)
    x21_p = pad_c(pad_rows(x21.astype(f32), 1))
    m1_p = pad_c(pad_rows(winner1.astype(f32) * stab_inv(z2), 2))
    a1_p = pad_c(pad_rows(a1.astype(f32), 1))
    z1i_p = pad_c(pad_rows(stab_inv(z1c), 1))
    img_planar = jnp.moveaxis(image.astype(f32), -1, 1).reshape(
        B, Cin_k, H * W)
    imgp = jnp.maximum(img_planar, 0.0)
    imgn = jnp.minimum(img_planar, 0.0)
    rp2_p = jnp.pad(r_pool2.astype(f32),
                    ((0, 0), (0, 0), (2, 2), (0, 0), (0, 0)))

    def prep_w(w):
        wf = _flip_transpose(jnp.maximum(w.astype(f32), 0.0))
        return wf, wf - wf.astype(jnp.bfloat16).astype(f32)

    w22f, w22f_lo = prep_w(w22)
    w21f, w21f_lo = prep_w(w21)
    w2f, w2f_lo = prep_w(w2)
    w1p = _flip_transpose(jnp.maximum(w1.astype(f32), 0.0))
    w1n = _flip_transpose(jnp.minimum(w1.astype(f32), 0.0))
    w1f = jnp.concatenate([w1p, w1n], axis=1)
    w1f_lo = w1f - w1f.astype(jnp.bfloat16).astype(f32)

    shift_dtype = jnp.bfloat16 if dot_mode == "bf16" else f32
    kernel = functools.partial(
        _block12_kernel, T=T, R=R, W=W, C1p=C1p, C1t=C1, C2=C2, Cin=Cin_k,
        dot_mode=dot_mode)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        out_shape=jax.ShapeDtypeStruct((B, T, Cin_k, H * W), f32),
        in_specs=[any_spec] * 10 + [vmem_spec] * 8,
        out_specs=any_spec,
        compiler_params=pltpu.CompilerParams(
            # the six-stage fusion peaks ~17 MB of scoped VMEM at R=4 —
            # just over the conservative 16 MB default
            vmem_limit_bytes=64 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((R // 2 + 6, W // 2, C2), f32),   # m22_s
            pltpu.VMEM((R // 2 + 4, W // 2, C2), f32),   # a21_s
            pltpu.VMEM((R // 2 + 4, W // 2, C2), f32),   # z21i_s
            pltpu.VMEM((R // 2 + 2, W // 2, C1p), f32),  # x21_s
            pltpu.VMEM((R + 4, W, C1p), f32),            # m1_s
            pltpu.VMEM((R + 2, W, C1p), f32),            # a1_s
            pltpu.VMEM((R + 2, W, C1p), f32),            # z1i_s
            pltpu.VMEM((Cin_k, R * W), f32),             # imgp_s
            pltpu.VMEM((Cin_k, R * W), f32),             # imgn_s
            pltpu.VMEM((2, R // 4 + 4, W // 4, C2), f32),  # rp_s (dbl buf)
            pltpu.VMEM((2, Cin_k, R * W), f32),          # out_s (dbl buf)
            pltpu.VMEM((3, R + 4, W, max(C2, C1p)), shift_dtype),  # shift_s
            pltpu.SemaphoreType.DMA((9,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (H * W * 9 * C1 * (C1 + 2 * Cin_k)
                               + (H // 2) * (W // 2) * 9 * C2 * (C2 + C1)),
            bytes_accessed=4 * B * (T * (H4 * W4 * C2 + H * W * Cin)
                                    + 3 * H * W * C1),
            transcendentals=0,
        ),
        interpret=_use_interpret() if interpret is None else interpret,
    )(rp2_p, m22_p, a21_p, z21i_p, x21_p, m1_p, a1_p, z1i_p, imgp, imgn,
      w22f, w22f_lo, w21f, w21f_lo, w2f, w2f_lo, w1f, w1f_lo)
    return jnp.moveaxis(out.reshape(B, T, Cin_k, H, W), 2, -1)[..., :Cin]


def block12_lrp_backward_ref(
    r_pool2, winner2, z22, a21, z21, x21, winner1, z2, a1, z1c, image,
    w22, w21, w2, w1, *, z_eps: float = Z_EPS_DEFAULT,
):
    """Literal jnp transcription of the six-stage chain (kernel oracle)."""
    from ..models.encoders import ConvParams, conv2d

    f32 = jnp.float32
    w22p = ConvParams(jnp.maximum(w22.astype(f32), 0.0), None)
    w21p = ConvParams(jnp.maximum(w21.astype(f32), 0.0), None)
    w2p = ConvParams(jnp.maximum(w2.astype(f32), 0.0), None)
    w1p = ConvParams(jnp.maximum(w1.astype(f32), 0.0), None)
    w1n = ConvParams(jnp.minimum(w1.astype(f32), 0.0), None)

    def one_image(rp_all, winner2, z22, a21, z21, x21, winner1, z2, a1,
                  z1c, image):
        def stab(z):
            return z.astype(f32) + z_eps * (z == 0)

        def one(rp):
            r_a22 = winner2 * jnp.repeat(jnp.repeat(rp, 2, 0), 2, 1)
            t22 = r_a22 / stab(z22)
            _, v22 = jax.vjp(lambda xx: conv2d(w22p, xx[None])[0],
                             a21.astype(f32))
            (g22,) = v22(t22)
            t21 = (a21 * g22) / stab(z21)
            _, v21 = jax.vjp(lambda xx: conv2d(w21p, xx[None])[0],
                             x21.astype(f32))
            (g21,) = v21(t21)
            rp1 = x21 * g21
            r_a2 = winner1 * jnp.repeat(jnp.repeat(rp1, 2, 0), 2, 1)
            t2 = r_a2 / stab(z2)
            _, v2 = jax.vjp(lambda xx: conv2d(w2p, xx[None])[0],
                            a1.astype(f32))
            (g2,) = v2(t2)
            t1 = (a1 * g2) / stab(z1c)

            def clamped(xx):
                return (conv2d(w1p, jnp.maximum(xx, 0.0)[None])[0]
                        + conv2d(w1n, jnp.minimum(xx, 0.0)[None])[0])

            _, v1 = jax.vjp(clamped, image.astype(f32))
            (g1,) = v1(t1)
            return image * g1

        return jax.vmap(one)(rp_all.astype(f32))

    return jax.vmap(one_image)(r_pool2, winner2, z22, a21, z21, x21,
                               winner1, z2, a1, z1c, image)
