"""Weight-resident fused VGG block-5 LRP backward as a Pallas TPU kernel.

The deep end of the CNN relevance walk is WEIGHT-bound, not map-bound:
``output/roofline_cnn_walk.json`` puts block 5 (conv5_3 -> conv5_2 ->
conv5_1 at 14^2 x 512) at 28.31 MB of weight bytes per word vs 3.81 MB of
maps — 75.6% of its HBM roofline is the same three conv kernels re-streamed
for every explained word, because XLA streams conv weights per batch tile
regardless of how the word axis is batched (the deep-split negative,
docs/PERF_NEGATIVES.md).  Every prior kernel/XLA attack (pallas_block1,
tap-GEMM, s2d, deep-split) targeted the map-bound bottom of the walk; this
kernel is the inverse of ``ops/pallas_block1.py``: the WORD LOOP runs
in-kernel and the three flipped conv kernels stay pinned in VMEM (bf16,
3 x 4.7 MB) across all T words, so weights read from HBM once per image
instead of T times.

Per word the chain is exactly records[24:30] of
``cnn_lrp.make_vgg_lrp_backward`` (reference alpha-beta conv rule,
LRPtools/lrp_modules.py:56-170, on post-relu inputs -> single w+ branch):

    r                      (T, S, S, C) seeds at the 14^2 feature grid
    t3 = r  * zinv5_3 ;  g3 = convT(t3, w5_3+) ;  r = x5_3 * g3
    t2 = r  * zinv5_2 ;  g2 = convT(t2, w5_2+) ;  r = x5_2 * g2
    t1 = r  * zinv5_1 ;  g1 = convT(t1, w5_1+) ;  out = x5_1 * g1

with the production dtype discipline preserved: stash maps load in their
storage dtype and upcast to f32, each transposed conv runs with w_dtype
(bf16) operands and f32 accumulation (matching ``_conv_transpose_same``),
and the inter-layer relevance rounds through r_dtype exactly like the
record walk stores it.  The 3x3 transposed convs are im2col matmuls on the
MXU (the ``_patches`` scratch-store trick from pallas_block1, whose Mosaic
lessons all apply).

Batching: the image axis is a kernel grid axis (Mosaic cannot vmap
manually-DMA'd refs), but the call site lives under the explainer's
per-image vmap — bridged with ``jax.custom_batching.custom_vmap``: the
unbatched call runs the kernel at B=1 and the vmap rule collapses the
image axis into the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_block1 import _dot, _flip_transpose, _pad_cols, _patches, \
    _use_interpret


def _block5_kernel(
    seeds_ref,  # (B, T, S, S, C) HBM — per-word relevance seeds (r_dtype)
    x3_ref,     # (B, S, S, C) HBM — conv5_3 input (relu out of 5_2)
    zi3_ref,    # (B, S, S, C) HBM — 1/stab(z5_3)
    x2_ref,     # (B, S, S, C) HBM — conv5_2 input
    zi2_ref,    # (B, S, S, C) HBM — 1/stab(z5_2)
    x1_ref,     # (B, S, S, C) HBM — conv5_1 input (pool4 out)
    zi1_ref,    # (B, S, S, C) HBM — 1/stab(z5_1)
    w3f_ref,    # (9C, C) VMEM — w5_3+ flipped+transposed (w_dtype)
    w2f_ref,    # (9C, C) VMEM
    w1f_ref,    # (9C, C) VMEM
    out_ref,    # (B, T, S, S, C) HBM (out_dtype)
    # scratch
    x3_s, zi3_s, x2_s, zi2_s, x1_s, zi1_s, r_s, out_s, shift_s,
    in_sems, r_sems, out_sems,
    *,
    T: int, S: int, C: int, dot_mode: str, r_store,
):
    b = pl.program_id(0)

    shared = (
        pltpu.make_async_copy(x3_ref.at[b], x3_s, in_sems.at[0]),
        pltpu.make_async_copy(zi3_ref.at[b], zi3_s, in_sems.at[1]),
        pltpu.make_async_copy(x2_ref.at[b], x2_s, in_sems.at[2]),
        pltpu.make_async_copy(zi2_ref.at[b], zi2_s, in_sems.at[3]),
        pltpu.make_async_copy(x1_ref.at[b], x1_s, in_sems.at[4]),
        pltpu.make_async_copy(zi1_ref.at[b], zi1_s, in_sems.at[5]),
    )
    for dma in shared:
        dma.start()

    def r_dma(t, slot):
        return pltpu.make_async_copy(seeds_ref.at[b, t], r_s.at[slot],
                                     r_sems.at[slot])

    def out_dma(t, slot):
        return pltpu.make_async_copy(out_s.at[slot], out_ref.at[b, t],
                                     out_sems.at[slot])

    r_dma(0, 0).start()
    for dma in shared:
        dma.wait()

    f32 = jnp.float32
    w3f = w3f_ref[:]
    w2f = w2f_ref[:]
    w1f = w1f_ref[:]
    x3 = x3_s[:].astype(f32)
    zi3 = zi3_s[:].astype(f32)
    x2 = x2_s[:].astype(f32)
    zi2 = zi2_s[:].astype(f32)
    x1 = x1_s[:].astype(f32)
    zi1 = zi1_s[:].astype(f32)

    zrow = jnp.zeros((1, S, C), f32)

    def conv_bwd(t_map, wf):
        """convT(t, wf) — 3x3/SAME data-grad as one im2col matmul; the
        _patches scratch store casts the cotangent to shift_s' dtype
        (w_dtype), matching _conv_transpose_same's operand rounding."""
        xp = _pad_cols(jnp.concatenate([zrow, t_map, zrow], axis=0))
        p = _patches(xp, shift_s, S, S)          # (S*S, 9C)
        g = _dot(p, wf, None, dot_mode)          # (S*S, C) f32
        return g.reshape(S, S, C)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < T)
        def _():
            r_dma(t + 1, 1 - slot).start()

        r_dma(t, slot).wait()
        r = r_s[slot].astype(f32)

        # conv5_3 backward; inter-layer r rounds through r_store exactly
        # like the record walk's r_dtype stores
        r = (x3 * conv_bwd(r * zi3, w3f)).astype(r_store).astype(f32)
        # conv5_2 backward
        r = (x2 * conv_bwd(r * zi2, w2f)).astype(r_store).astype(f32)
        # conv5_1 backward; the record walk stores this layer's output as
        # r_dtype too before the lower walk upcasts it
        out = (x1 * conv_bwd(r * zi1, w1f)).astype(r_store).astype(
            out_s.dtype)

        @pl.when(t >= 2)
        def _():
            out_dma(t - 2, slot).wait()

        out_s[slot] = out
        out_dma(t, slot).start()
        return ()

    jax.lax.fori_loop(0, T, body, (), unroll=False)
    if T >= 2:
        out_dma(T - 2, T % 2).wait()
    out_dma(T - 1, (T - 1) % 2).wait()


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "r_dtype", "dot_mode", "interpret"))
def _block5_batched(
    seeds, x3, zi3, x2, zi2, x1, zi1, w3f, w2f, w1f, *,
    out_dtype, r_dtype, dot_mode, interpret,
):
    B, T, S, _, C = seeds.shape
    f32 = jnp.float32
    w_dtype = w3f.dtype
    shift_dtype = w_dtype if dot_mode != "f32" else f32
    # inter-layer relevance rounds through the WALK's storage dtype (the
    # record walk stores r as r_dtype between layers), independent of the
    # seed dtype (seeds arrive f32 from the decoder walk)
    r_store = jnp.dtype(r_dtype)
    kernel = functools.partial(
        _block5_kernel, T=T, S=S, C=C, dot_mode=dot_mode, r_store=r_store)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    stash_vm = lambda ref: pltpu.VMEM((S, S, C), ref.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, T, S, S, C), jnp.dtype(out_dtype)),
        in_specs=[any_spec] * 7 + [vmem_spec] * 3,
        out_specs=any_spec,
        compiler_params=pltpu.CompilerParams(
            # 3 weight matrices (14.2 MB bf16 / 28.3 f32) + im2col patches
            vmem_limit_bytes=(100 if w_dtype == jnp.float32 else 64)
            * 1024 * 1024),
        scratch_shapes=[
            stash_vm(x3), stash_vm(zi3), stash_vm(x2), stash_vm(zi2),
            stash_vm(x1), stash_vm(zi1),
            pltpu.VMEM((2, S, S, C), seeds.dtype),          # r double buffer
            pltpu.VMEM((2, S, S, C), jnp.dtype(out_dtype)),  # out dbl buffer
            pltpu.VMEM((3, S + 2, S, C), shift_dtype),       # patches shifts
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * 3 * S * S * 9 * C * C,
            bytes_accessed=(B * (2 * T * S * S * C + 6 * S * S * C) * 2
                            + 3 * 9 * C * C * 2),
            transcendentals=0,
        ),
        interpret=_use_interpret() if interpret is None else interpret,
    )(seeds, x3, zi3, x2, zi2, x1, zi1, w3f, w2f, w1f)


@functools.lru_cache(maxsize=8)
def _wrapped(out_dtype_name: str, r_dtype_name: str, dot_mode: str,
             interpret):
    """custom_vmap bridge: unbatched call = B=1 kernel; under the
    explainer's per-image vmap the image axis becomes the kernel grid."""
    out_dtype = jnp.dtype(out_dtype_name)
    r_dtype = jnp.dtype(r_dtype_name)

    @jax.custom_batching.custom_vmap
    def fn(seeds, x3, zi3, x2, zi2, x1, zi1, w3f, w2f, w1f):
        return _block5_batched(
            seeds[None], x3[None], zi3[None], x2[None], zi2[None],
            x1[None], zi1[None], w3f, w2f, w1f,
            out_dtype=out_dtype, r_dtype=r_dtype, dot_mode=dot_mode,
            interpret=interpret)[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, seeds, x3, zi3, x2, zi2, x1, zi1,
              w3f, w2f, w1f):
        maps = [seeds, x3, zi3, x2, zi2, x1, zi1]
        for i, (m, batched) in enumerate(zip(maps, in_batched[:7])):
            if not batched:
                maps[i] = jnp.broadcast_to(m, (axis_size,) + m.shape)
        # weights are vmap-invariant (closed over params); a batched weight
        # would defeat the VMEM pinning — take lane 0, values are identical
        ws = [w3f, w2f, w1f]
        for i, (w, batched) in enumerate(zip(ws, in_batched[7:])):
            if batched:
                ws[i] = w[0]
        out = _block5_batched(*maps, *ws, out_dtype=out_dtype,
                              r_dtype=r_dtype, dot_mode=dot_mode,
                              interpret=interpret)
        return out, True

    return fn


def prep_weight(w: jax.Array, w_dtype) -> jax.Array:
    """(3, 3, C, C) raw conv weight -> (9C, C) im2col transpose matrix of
    the alpha-beta w+ kernel, in the walk's weight storage dtype."""
    return _flip_transpose(jnp.maximum(w.astype(jnp.float32), 0.0)).astype(
        w_dtype)


def block5_lrp_backward(
    seeds: jax.Array,   # (T, S, S, C) per-word seeds (single image)
    x3, zi3, x2, zi2, x1, zi1,  # (S, S, C) shared stash maps
    w3f, w2f, w1f,      # (9C, C) prepared weights (prep_weight)
    *,
    out_dtype=jnp.float32,
    r_dtype=jnp.bfloat16,
    dot_mode: str = "bf16",
    interpret: bool | None = None,
) -> jax.Array:         # (T, S, S, C) relevance at the pool-4 output
    """Single-image entry; composes with an outer image vmap (the batch
    axis lowers onto the kernel grid via custom_vmap)."""
    fn = _wrapped(jnp.dtype(out_dtype).name, jnp.dtype(r_dtype).name,
                  dot_mode, interpret)
    return fn(seeds, x3, zi3, x2, zi2, x1, zi1, w3f, w2f, w1f)


def block5_lrp_backward_ref(
    seeds, x3, zi3, x2, zi2, x1, zi1, w3, w2, w1, *,
    w_dtype=jnp.bfloat16, r_dtype=jnp.bfloat16,
):
    """Literal jnp transcription of records[24:30] of the production walk
    (the oracle for the kernel tests): raw (3,3,C,C) weights, the same
    _conv_transpose_same operand rounding and r_dtype inter-layer stores."""
    from ..explain.cnn_lrp import _conv_transpose_same, _flip_io

    f32 = jnp.float32
    wt3 = _flip_io(jnp.maximum(w3.astype(f32), 0.0)).astype(w_dtype)
    wt2 = _flip_io(jnp.maximum(w2.astype(f32), 0.0)).astype(w_dtype)
    wt1 = _flip_io(jnp.maximum(w1.astype(f32), 0.0)).astype(w_dtype)

    def one(r):
        r = r.astype(f32)
        for x, zi, wt in ((x3, zi3, wt3), (x2, zi2, wt2), (x1, zi1, wt1)):
            g = _conv_transpose_same((r * zi.astype(f32))[None], wt)[0]
            r = (x.astype(f32) * g).astype(r_dtype).astype(f32)
        return r

    return jax.vmap(one)(seeds)
