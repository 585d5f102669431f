"""Device mesh + sharding layer (TPU-first, new surface — the reference has no
distributed runtime at all, SURVEY.md §2.2).

Layout: 2-D logical mesh ``(data, model)``.

- batch axis sharded over ``data`` (pjit data parallelism; XLA inserts the
  gradient psum over ICI),
- the vocabulary-sized parameters (embedding table, output projection) shard
  over ``model`` — the only >O(hidden^2) matrices in these models — giving
  tensor parallelism for the fc/vocab matmul and its gradient,
- everything else is replicated.

Collectives ride ICI within a slice; batches are fed host-sharded so DCN only
carries input data (multi-host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def build_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    assert dp * mp == n, f"mesh {dp}x{mp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, cfg: MeshConfig | None = None) -> NamedSharding:
    cfg = cfg or MeshConfig()
    return NamedSharding(mesh, P(cfg.data_axis))


def shard_mapped_data_parallel(fn, mesh: Mesh, *, data_axis: str = "data"):
    """Wrap ``fn(params, batch) -> outputs`` as a data-parallel program:
    params replicate, the batch (and every output) shards over ``data_axis``
    rows, and each shard runs ``fn`` locally under ``shard_map`` — making
    zero cross-device communication STRUCTURAL (under plain pjit the SPMD
    partitioner inserts a batch all-gather around the beam-search TopK
    custom-call; shard_map cannot — asserted on the optimized HLO in
    tests/test_sharded_explain.py).  Shared by the explainer's sharded cores
    and the serving layer's mesh mode.

    The returned callable device_puts its inputs (replicated / row-sharded)
    and exposes ``.lower`` for HLO inspection."""
    try:
        from jax import shard_map  # jax >= 0.6 stable API
    except ImportError:  # older jax only ships the experimental path
        from jax.experimental.shard_map import shard_map

    batch_sh = NamedSharding(mesh, P(data_axis))
    rep = NamedSharding(mesh, P())
    try:
        # check_vma=False: decode-scan carries start as unvarying constants
        # that become shard-varying — correct here (everything is local to
        # the shard), but the static varying-axis checker can't see that
        smapped = shard_map(
            fn, mesh=mesh, in_specs=(P(), P(data_axis)),
            out_specs=P(data_axis), check_vma=False)
    except TypeError:  # older jax spells it check_rep
        smapped = shard_map(
            fn, mesh=mesh, in_specs=(P(), P(data_axis)),
            out_specs=P(data_axis), check_rep=False)
    core = jax.jit(smapped)

    def f(params, batch):
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), params)
        batch = jax.device_put(jnp.asarray(batch), batch_sh)
        return core(params, batch)

    f.lower = core.lower
    return f


def _leaf_spec(path: str, leaf, axis: str, enabled: bool) -> P:
    """Vocab-dim sharding for embedding / fc of any decoder family."""
    if not enabled:
        return P()
    if path.endswith("embedding"):
        return P(axis) if leaf.ndim == 1 else P(axis, None)
    if ".fc." in path or path.endswith("fc.weight") or path.endswith("fc.bias"):
        return P(axis) if leaf.ndim == 1 else P(axis, *([None] * (leaf.ndim - 1)))
    return P()


def param_shardings(params, mesh: Mesh, cfg: MeshConfig | None = None):
    """Sharding pytree for CaptionerParams: replicate everything except the
    vocab-dim of embedding/fc when model_parallel > 1."""
    cfg = cfg or MeshConfig()
    enabled = mesh.shape[cfg.model_axis] > 1

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        name = ".".join(
            getattr(p, "name", getattr(p, "key", str(p))) for p in path
        )
        specs.append(NamedSharding(mesh, _leaf_spec(name, leaf, cfg.model_axis, enabled)))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_batch(batch, mesh: Mesh, cfg: MeshConfig | None = None):
    """Device_put a host batch with the batch axis over 'data'."""
    sh = batch_sharding(mesh, cfg)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sh), batch
    )
