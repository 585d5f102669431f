"""Pallas TPU kernels for the relevance hot ops.

``lrp_linear_eps`` — the epsilon rule ``R_in = x * ((r / stab(z)) @ W)`` — is
the inner op of every decoder relevance walk (fc seed: V x H per word; LSTM
gate blocks: H x (2E+2H) per step per word).  XLA already fuses the
elementwise pieces into the matmul pretty well; this kernel makes the fusion
explicit and keeps the stabilizer + input-product in VMEM next to the MXU
matmul, with an fp32 accumulator:

    S = r / (z + EPS * sign(z), 0 -> EPS)      (VPU)
    R = x * (S @ W)                            (MXU + VPU epilogue)

Shapes are padded to MXU tiles (8, 128) internally; grid over output tiles.
``interpret=True`` is used automatically off-TPU so the same code path is
exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .relevance import EPSILON


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lrp_linear_kernel(r_ref, z_ref, x_ref, w_ref, out_ref, *, eps: float,
                       nk: int):
    """Output tile (bb, bi); the OUT dimension is tiled as the innermost grid
    axis and accumulated into out_ref; the x-product epilogue fires on the
    last reduction step.

    r, z: (bb, bk); x: (bb, bi); w: (bk, bi)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    z = z_ref[:]
    stab = z + eps * jnp.sign(z)
    stab = jnp.where(stab == 0, eps, stab)
    s = r_ref[:] / stab  # (bb, bk)
    out_ref[:] += jnp.dot(s, w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = x_ref[:] * out_ref[:]


@functools.partial(jax.jit, static_argnames=("eps", "block_b", "block_in",
                                             "block_out"))
def lrp_linear_eps_pallas(
    r_out: jax.Array,  # (B, OUT)
    x: jax.Array,  # (B, IN)
    z: jax.Array,  # (B, OUT)
    weight: jax.Array,  # (OUT, IN)
    *,
    eps: float = EPSILON,
    block_b: int = 128,
    block_in: int = 512,
    block_out: int = 512,
) -> jax.Array:
    """Batched epsilon rule; exact match with ops.relevance.lrp_linear_eps."""
    B, OUT = r_out.shape
    IN = x.shape[1]
    r_out = r_out.astype(jnp.float32)
    x = x.astype(jnp.float32)
    z = z.astype(jnp.float32)
    weight = weight.astype(jnp.float32)

    # pad to tile boundaries (sublane 8, lane 128)
    Bp = _round_up(max(B, 8), 8)
    OUTp = _round_up(OUT, 128)
    INp = _round_up(IN, 128)
    bb = min(block_b, Bp)
    bi = min(block_in, INp)
    bk = min(block_out, OUTp)
    # grid must divide padded dims
    while Bp % bb:
        bb //= 2
    while INp % bi:
        bi //= 2
    while OUTp % bk:
        bk //= 2

    r_p = jnp.zeros((Bp, OUTp), jnp.float32).at[:B, :OUT].set(r_out)
    # padded z rows stabilize to EPS -> padded S entries are 0/EPS = 0; padded
    # W rows are 0 too, so padding contributes nothing.
    z_p = jnp.zeros((Bp, OUTp), jnp.float32).at[:B, :OUT].set(z)
    x_p = jnp.zeros((Bp, INp), jnp.float32).at[:B, :IN].set(x)
    w_p = jnp.zeros((OUTp, INp), jnp.float32).at[:OUT, :IN].set(weight)

    nk = OUTp // bk
    grid = (Bp // bb, INp // bi, nk)
    out = pl.pallas_call(
        functools.partial(_lrp_linear_kernel, eps=eps, nk=nk),
        out_shape=jax.ShapeDtypeStruct((Bp, INp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bb, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bb, bi), lambda i, j, k: (i, j)),
            pl.BlockSpec((bk, bi), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bb, bi), lambda i, j, k: (i, j)),
        interpret=_use_interpret(),
    )(r_p, z_p, x_p, w_p)
    return out[:B, :IN]
