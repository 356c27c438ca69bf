"""TPU kernels for the embedding hot path (scatter-add gradients).

Why: XLA lowers a 213k-row scatter-add (DLRM batch 8192 × 26 features into a
1M×16 table) to a per-row path — ~22 ms on a v5e chip, slower than the rest
of the train step combined. This is THE bottleneck the reference never hits
(its tables are replicated and NCCL-reduced; ours take sparse gradients —
SURVEY.md §2.7 item 1, BASELINE.json north star).

Measured v5e numbers for every strategy live in
``benchmarks/bench_kernels.py``; the production path is
``embedding_lookup`` (fast gather forward + ``padded_scatter_add``
backward, ~5 ms standalone / ~4 ms fused in the grad step). The Pallas
scatter-as-matmul kernel below is kept as the injection point for
row-sharded shard-local scatters (tile count shrinks 1/m per shard) and as
the reference implementation of the sorted-stream formulation; at D=16 its
one-hot matmuls run at 12.5% MXU utilization (N=16 of 128 lanes), so on a
full-size table the padded XLA scatter wins (12.9 ms vs 5.3 ms measured).

Design — **scatter-as-matmul** over a sorted, chunk-padded update stream:

1. sort update ids ascending (one bitonic sort of the flat id vector);
2. partition the table into ``ROW_TILE``-row tiles; the sorted updates for
   tile ``t`` form the contiguous range ``offsets[t]..offsets[t+1]``;
3. re-pack the stream so every ``CHUNK`` of updates belongs to exactly one
   tile (per-tile ranges padded up to whole chunks; empty tiles get one
   all-pad chunk so every output block is initialized) — pure static-shape
   vector ops + one gather;
4. the kernel runs one grid step per chunk: Pallas pipelines the chunk's
   ids+vectors into VMEM automatically, builds a one-hot
   ``[ROW_TILE, CHUNK]`` mask on the VPU and accumulates
   ``one_hot @ updates`` on the MXU into the tile's output block. The
   output index map is driven by a scalar-prefetched ``chunk→tile`` array;
   consecutive chunks of one tile revisit the same VMEM block (classic
   accumulation pattern), which is why the stream is tile-sorted.

Cost: ``ROW_TILE × Nchunks × CHUNK × D`` MXU FLOPs (≈47 GFLOP for the DLRM
shape), but at D=16 only 16/128 output lanes are live → ~12.9 ms measured
on v5e (`benchmarks/bench_kernels.py`). It beats XLA only when the live
tile count is small (sharded tables) or D ≥ 64.

Public entry: ``embedding_lookup`` — drop-in ``jnp.take`` with the padded
scatter as the ``custom_vjp`` backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 2048  # table rows per output block
CHUNK = 1024  # updates per grid step (1024-aligned for 1-D i32 tiling)

_PAD_ID = np.int32(2**30)  # matches no tile row


def _scatter_kernel(chunk_tile_ref, first_ref, ids_blk, upd_blk, out_ref):
    ci = pl.program_id(0)

    @pl.when(first_ref[ci] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row_base = chunk_tile_ref[ci] * ROW_TILE
    local = ids_blk[:] - row_base  # [CHUNK]; pad ids land far outside
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, CHUNK), 0)
    one_hot = jnp.where(rows == local[None, :], 1.0, 0.0)
    out_ref[:] += jnp.dot(one_hot, upd_blk[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def sorted_scatter_add(
    sorted_ids: jnp.ndarray, sorted_updates: jnp.ndarray, vocab_size: int
) -> jnp.ndarray:
    """Σ updates into a fresh [vocab_size, D] f32 table.

    ``sorted_ids`` [N] ascending int32 (entries ≥ vocab_size are dropped),
    ``sorted_updates`` [N, D].
    """
    n, d = sorted_updates.shape
    v_pad = ((vocab_size + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
    num_tiles = v_pad // ROW_TILE
    # max chunks: every tile may have one partial chunk + its full chunks
    num_chunks = num_tiles + (n + CHUNK - 1) // CHUNK

    tile_bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * ROW_TILE
    offsets = jnp.searchsorted(sorted_ids, tile_bounds, side="left").astype(jnp.int32)
    n_t = offsets[1:] - offsets[:-1]  # updates per tile
    chunks_t = jnp.maximum((n_t + CHUNK - 1) // CHUNK, 1)  # ≥1 so every block inits
    chunk_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(chunks_t).astype(jnp.int32)]
    )  # [T+1]

    ci = jnp.arange(num_chunks, dtype=jnp.int32)
    tile_of = jnp.clip(
        jnp.searchsorted(chunk_off, ci, side="right").astype(jnp.int32) - 1,
        0,
        num_tiles - 1,
    )
    is_real = ci < chunk_off[num_tiles]
    first = (ci == chunk_off[tile_of]) & is_real
    within = ci - chunk_off[tile_of]  # chunk index inside the tile

    # gather the chunk-padded stream
    pos = jnp.arange(CHUNK, dtype=jnp.int32)
    src = offsets[tile_of][:, None] + within[:, None] * CHUNK + pos[None, :]
    valid = is_real[:, None] & (src < offsets[tile_of + 1][:, None])
    src_c = jnp.minimum(src, jnp.maximum(n - 1, 0)).reshape(-1)
    ids_stream = jnp.where(valid.reshape(-1), sorted_ids[src_c], _PAD_ID)
    upd_stream = jnp.where(
        valid.reshape(-1)[:, None],
        jnp.take(sorted_updates, src_c, axis=0),
        0.0,
    ).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk→tile map, first-chunk flags
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda ci, ct, fr: (ci,)),
            pl.BlockSpec((CHUNK, d), lambda ci, ct, fr: (ci, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, d), lambda ci, ct, fr: (ct[ci], 0)),
    )
    out = pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_pad, d), jnp.float32),
    )(tile_of, first.astype(jnp.int32), ids_stream, upd_stream)
    return out[:vocab_size]


def scatter_add_dense(ids: jnp.ndarray, updates: jnp.ndarray, vocab_size: int):
    """Sort + kernel scatter: the full sparse-grad path (any id shape)."""
    flat = ids.reshape(-1).astype(jnp.int32)
    upd = updates.reshape(-1, updates.shape[-1])
    order = jnp.argsort(flat)
    return sorted_scatter_add(flat[order], jnp.take(upd, order, axis=0), vocab_size)


# ------------------------------------------------- fast narrow-width scatter
_FAST_WIDTH = 64  # XLA's TPU scatter vectorizes at ≥64 lanes; below it, it
# falls into a ~4× slower per-row path (measured on v5e:
# D=16 → 25 ms, D=32 → 30 ms, D=64 → 7 ms for 213k rows into 1M×D).


def padded_scatter_add(ids: jnp.ndarray, updates: jnp.ndarray, vocab_size: int):
    """Scatter-add that sidesteps XLA's slow narrow-row path: zero-pad the
    update rows to 64 lanes, scatter wide, slice back. 3× faster than the
    direct scatter for D=16 (7.9 ms vs 25 ms on the DLRM shape)."""
    flat = ids.reshape(-1)
    upd = updates.reshape(-1, updates.shape[-1])
    d = upd.shape[-1]
    if d >= _FAST_WIDTH:
        return jnp.zeros((vocab_size, d), updates.dtype).at[flat].add(upd)
    wide = jnp.concatenate(
        [upd, jnp.zeros((upd.shape[0], _FAST_WIDTH - d), upd.dtype)], axis=1
    )
    grad = jnp.zeros((vocab_size, _FAST_WIDTH), updates.dtype).at[flat].add(wide)
    return grad[:, :d]


# ----------------------------------------------------------------- lookup VJP
# Tables in this shape class (a) trip XLA's fused-graph layout assignment
# (column-major flip -> 4x slower gather), so the Trainer splits the step
# (TrainConfig.split_step), and (b) want the padded-width scatter backward.
# Smaller/wider tables are better served by XLA's native take/scatter inside
# one fused step — measured on v5e: DIEN 400k x 18 regresses 4.0 -> 6.2 ms
# with the padded backward, DLRM 1M x 16 improves 14.3 -> 8.9 ms with it.
BIG_NARROW_MIN_ELEMS = 8_000_000
NARROW_MAX_COLS = 32


def is_big_narrow_table(shape) -> bool:
    return (
        len(shape) == 2
        and shape[1] <= NARROW_MAX_COLS
        and shape[0] * shape[1] >= BIG_NARROW_MIN_ELEMS
    )


@jax.custom_vjp
def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``jnp.take(table, ids, axis=0)`` with a fast scatter-add backward
    (padded-width XLA scatter; see ``padded_scatter_add``)."""
    return jnp.take(table, ids, axis=0)


def _lookup_fwd(table, ids):
    # zero-size exemplar carries the table dtype into the bwd (a raw dtype
    # object is not a valid pytree leaf for residuals)
    proto = jnp.zeros((0,), table.dtype)
    return jnp.take(table, ids, axis=0), (ids, table.shape[0], proto)


def _lookup_bwd(res, cot):
    ids, vocab, proto = res
    grad = padded_scatter_add(ids, cot, vocab)
    return grad.astype(proto.dtype), None


embedding_lookup.defvjp(_lookup_fwd, _lookup_bwd)
