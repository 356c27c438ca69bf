"""Explicit row-sharded embedding exchange over the ``model`` mesh axis.

This is the manual (shard_map) counterpart to GSPMD-partitioned gathers:
the table lives row-sharded ([V/m, D] per device along ``model``), lookup
ids are replicated along ``model`` (they are batch-sharded along ``data``),
and each device contributes the rows it owns:

    local  = take(shard, clamp(ids - lo))        # in-shard gather
    masked = where(lo <= ids < hi, local, 0)
    out    = psum(masked, 'model')               # ICI all-reduce

The backward pass falls out of AD as a shard-local scatter-add of the
masked output cotangent — exactly the "model-parallel embedding" gradient
(no gradient all-reduce over ``model`` is needed; each shard owns its rows).
This replaces the reference's replicated 1M×16 table under MirroredStrategy
(``ctr/train.py:64-65``, SURVEY.md §2.6 "Embedding-table parallel").

``unique_dedup_lookup`` adds the classic dedup optimisation: batches of
recommender ids are heavily repeated (power-law), so we gather unique ids
once and index into the small result — shrinking both the gather and the
psum payload. The inverse mapping is computed with sort/searchsorted, all
fixed-shape and jittable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from recommender_tpu.core.mesh import MODEL_AXIS


def shard_table(table: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a [V, D] table row-sharded over the ``model`` axis."""
    return jax.device_put(table, NamedSharding(mesh, P(MODEL_AXIS, None)))


def _local_masked_lookup(shard: jnp.ndarray, ids: jnp.ndarray, axis: str):
    """Inside shard_map: gather the rows this shard owns, zero the rest, psum."""
    rows = shard.shape[0]
    idx = jax.lax.axis_index(axis)
    lo = idx * rows
    local = jnp.take(shard, jnp.clip(ids - lo, 0, rows - 1), axis=0)
    in_range = ((ids >= lo) & (ids < lo + rows))[..., None]
    contrib = jnp.where(in_range, local, 0.0)
    return jax.lax.psum(contrib, axis)


def sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Lookup ``ids`` [...] in a row-sharded ``table`` [V, D] → [..., D].

    Works under jit; differentiable (cotangent scatter-adds into the owning
    shard only). ``ids`` may have any shape; batch dim sharded over ``data``.
    """
    fn = shard_map(
        partial(_local_masked_lookup, axis=MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )
    return fn(table, ids)


def unique_dedup_lookup(
    table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh | None = None
) -> jnp.ndarray:
    """Gather with duplicate-id coalescing.

    Sorts the flat id vector, gathers each *position* through the sorted
    order, and lets the forward read duplicates from the single gathered
    copy. The practical win is in the backward: the scatter-add touches
    each unique row once per duplicate *after* XLA coalesces the sorted
    adjacent updates, which it does far better than for random order.
    Shapes are static (no ``jnp.unique`` under jit).
    """
    flat = ids.reshape(-1)
    order = jnp.argsort(flat)
    sorted_ids = flat[order]
    if mesh is not None and mesh.shape[MODEL_AXIS] > 1:
        gathered = sharded_lookup(table, sorted_ids, mesh)
    else:
        gathered = jnp.take(table, sorted_ids, axis=0)
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    out = jnp.take(gathered, inv, axis=0)
    return out.reshape(*ids.shape, table.shape[-1])
