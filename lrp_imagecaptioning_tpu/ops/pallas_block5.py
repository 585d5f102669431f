"""Weight-resident fused VGG block-5 LRP backward as a Pallas TPU kernel.

The deep end of the CNN relevance walk is WEIGHT-bound, not map-bound:
``output/roofline_cnn_walk.json`` puts block 5 (conv5_3 -> conv5_2 ->
conv5_1 at 14^2 x 512) at 28.31 MB of weight bytes per word vs 3.81 MB of
maps — 75.6% of its HBM roofline is the same three conv kernels re-streamed
for every explained word, because XLA streams conv weights per batch tile
regardless of how the word axis is batched (the deep-split negative,
docs/PERF_NEGATIVES.md).  Every prior kernel/XLA attack (pallas_block1,
tap-GEMM, s2d, deep-split) targeted the map-bound bottom of the walk; this
kernel is the inverse of ``ops/pallas_block1.py``: the WORD BATCH is
processed in-kernel (all T words folded into each tap matmul's M axis —
see the kernel docstring for why the first-cut per-word loop lost) and the
three flipped conv kernels stay pinned in VMEM (bf16, 3 x 4.7 MB), so
weights read from HBM once per (image, chunk) instead of once per word.

MEASURED VERDICT (1xv5e, iters=20, production operating point): standalone
the kernel wins 0.83 -> 0.499 ms/img — the weight-traffic hypothesis is
CONFIRMED at stage level — but in situ the chunk-embedded integration ties
exactly (139.4 vs 139.3 img/s) and the all-words form loses 9% (the
deep-split shape): the boundary (seed pad/materialize, custom_vmap fusion
break, per-chunk weight loads) consumes the saving on a stage that is
7.6% of the core.  Default OFF (docs/PERF_NEGATIVES.md #12).

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

from .pallas_block1 import _dot, _flip_transpose, _use_interpret


def _block5_kernel(
    seeds_ref,  # (B, T, S, Wp, C) HBM — per-word relevance seeds (r_dtype)
    x3_ref,     # (B, S, Wp, C) HBM — conv5_3 input (relu out of 5_2)
    zi3_ref,    # (B, S, Wp, C) HBM — 1/stab(z5_3)
    x2_ref,     # (B, S, Wp, C) HBM — conv5_2 input
    zi2_ref,    # (B, S, Wp, C) HBM — 1/stab(z5_2)
    x1_ref,     # (B, S, Wp, C) HBM — conv5_1 input (pool4 out)
    zi1_ref,    # (B, S, Wp, C) HBM — 1/stab(z5_1)
    w3f_ref,    # (9C, C) VMEM — w5_3+ flipped+transposed (w_dtype)
    w2f_ref,    # (9C, C) VMEM
    w1f_ref,    # (9C, C) VMEM
    out_ref,    # (B, T, S, Wp, C) HBM (out_dtype)
    # scratch
    x3_s, zi3_s, x2_s, zi2_s, x1_s, zi1_s, r_s, out_s, shift_s,
    in_sems, r_sems, out_sems,
    *,
    T: int, S: int, Wp: int, C: int, dot_mode: str, r_store,
):
    """ALL T words are batched into each tap matmul (M = T*(S+2)*Wp rows):
    the first cut of this kernel looped words in-kernel with per-word
    (S*S, 9C) x (9C, C) dots — bit-exact on hardware but 1.38 vs XLA's
    0.83 ms/img, because M=196 fills 1.5 MXU row tiles and the 48
    dependent dots per image serialize.  Batching the word axis into M is
    what XLA's vmap enjoys; pinning the weights is what it lacks.

    The maps are processed at the PADDED width Wp: padded columns carry
    zeros, a SAME conv's edge semantics are preserved (the garbage columns
    beyond S are killed by the zero-padded x/zi multiplies), and every
    reshape that merges the word/row axes into M is tile-aligned (Wp is a
    sublane-tile multiple) — the Mosaic constraint that rejected the
    true-width form."""
    b = pl.program_id(0)

    shared = (
        pltpu.make_async_copy(x3_ref.at[b], x3_s, in_sems.at[0]),
        pltpu.make_async_copy(zi3_ref.at[b], zi3_s, in_sems.at[1]),
        pltpu.make_async_copy(x2_ref.at[b], x2_s, in_sems.at[2]),
        pltpu.make_async_copy(zi2_ref.at[b], zi2_s, in_sems.at[3]),
        pltpu.make_async_copy(x1_ref.at[b], x1_s, in_sems.at[4]),
        pltpu.make_async_copy(zi1_ref.at[b], zi1_s, in_sems.at[5]),
        pltpu.make_async_copy(seeds_ref.at[b], r_s, r_sems.at[0]),
    )
    for dma in shared:
        dma.start()
    for dma in shared:
        dma.wait()

    f32 = jnp.float32
    taps = ((w3f_ref, x3_s, zi3_s), (w2f_ref, x2_s, zi2_s),
            (w1f_ref, x1_s, zi1_s))
    zrow = jnp.zeros((T, 1, Wp, C), f32)
    shift_dt = shift_s.dtype

    def conv_bwd(s):
        """(T, S, Wp, C) cotangent -> (T, S, Wp, C) data-grad, 9
        accumulating tap matmuls with M = T*(S+2)*Wp.  dx (second-minor)
        shifts go through the scratch store (canonical-layout trick from
        pallas_block1._patches); dy row slices are layout-free."""
        sp = jnp.concatenate([zrow, s, zrow], axis=1)  # (T, S+2, Wp, C)
        spc = jnp.concatenate(
            [jnp.zeros((T, S + 2, 1, C), f32), sp,
             jnp.zeros((T, S + 2, 1, C), f32)], axis=2).astype(shift_dt)
        for dx in range(3):
            shift_s[dx] = spc[:, :, dx:dx + Wp, :]
        return [shift_s[dx, :, dy:dy + S, :, :].reshape(T * S * Wp, C)
                for dy in range(3) for dx in range(3)]

    r = r_s[:].astype(f32)
    for wf_ref, x_s, zi_s in taps:
        x = x_s[:].astype(f32)
        zi = zi_s[:].astype(f32)
        views = conv_bwd(r * zi)
        g = _dot(views[0], wf_ref[0:C, :], None, dot_mode)
        for k in range(1, 9):
            g += _dot(views[k], wf_ref[k * C:(k + 1) * C, :], None,
                      dot_mode)
        r = (x * g.reshape(T, S, Wp, C)).astype(r_store).astype(f32)

    out_s[:] = r.astype(out_s.dtype)
    out = pltpu.make_async_copy(out_s, out_ref.at[b], out_sems.at[0])
    out.start()
    out.wait()


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
    # Mosaic HBM<->VMEM copies need the SUBLANE (second-minor) dim aligned
    # to the tiling — 14 is not (the probe failed with "slice shape along
    # dimension 2 must be aligned to tiling (8)").  Pad the W axis to the
    # bf16 tile (16, also a multiple of the f32 tile) host-side, DMA full
    # padded maps, and slice at VALUE level in-kernel.
    Wp = -(-S // 16) * 16

    def pad_w(a):
        if Wp == S:
            return a
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2) + ((0, Wp - S), (0, 0)))

    seeds = pad_w(seeds)
    x3, zi3, x2, zi2, x1, zi1 = (pad_w(a)
                                 for a in (x3, zi3, x2, zi2, x1, zi1))
    kernel = functools.partial(
        _block5_kernel, T=T, S=S, Wp=Wp, C=C, dot_mode=dot_mode,
        r_store=r_store)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    stash_vm = lambda ref: pltpu.VMEM((S, Wp, C), ref.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, T, S, Wp, C),
                                       jnp.dtype(out_dtype)),
        in_specs=[any_spec] * 7 + [vmem_spec] * 3,
        out_specs=any_spec,
        compiler_params=pltpu.CompilerParams(
            # 3 weight matrices (14.2 MB bf16 / 28.3 f32) + the all-T
            # shift/accumulator buffers (~45 MB at T=16, S=14)
            vmem_limit_bytes=110 * 1024 * 1024),
        scratch_shapes=[
            stash_vm(x3), stash_vm(zi3), stash_vm(x2), stash_vm(zi2),
            stash_vm(x1), stash_vm(zi1),
            pltpu.VMEM((T, S, Wp, C), seeds.dtype),           # all-T seeds
            pltpu.VMEM((T, S, Wp, C), jnp.dtype(out_dtype)),  # all-T out
            pltpu.VMEM((3, T, S + 2, Wp, C), shift_dtype),    # dx shifts
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * 3 * S * S * 9 * C * C,
            bytes_accessed=(B * (2 * T * S * S * C + 6 * S * S * C) * 2
                            + 3 * 9 * C * C * 2),
            transcendentals=0,
        ),
        interpret=_use_interpret() if interpret is None else interpret,
    )(seeds, x3, zi3, x2, zi2, x1, zi1, w3f, w2f, w1f)
    return out[..., :S, :]


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
