"""Embedding tables.

Replaces ``keras.layers.Embedding`` everywhere the reference uses it
(``ctr/model.py:10,42``, ``dien/model.py:11-12``, ``esmm/base.py:9-11``,
``eges/model.py:20-102``, ``pinsage/train/layers.py:49-81``).

Design notes (TPU-first):
* The table is a plain f32 param; lookups cast activations to bf16 only
  downstream (gathers are bandwidth-bound; the table dtype is the knob).
* ``partition="model"`` attaches flax partitioning metadata so the
  parallel rules row-shard the table over the ``model`` mesh axis; under
  ``jit`` XLA/GSPMD then compiles the gather into the canonical
  masked-local-gather + all-reduce exchange. Its BACKWARD, however, is a
  replicated full-table scatter per device (the SPMD partitioner cannot
  row-split a scatter with arbitrary indices — compiled-HLO witness in
  tests/test_sharded_10m.py), so big sharded tables should take an
  explicit ``shard_map`` exchange instead: ``lookup_mode="psum"`` (same
  comm as gspmd, shard-local per-shard-gated backward) or ``"a2a"``
  (bandwidth-optimal at large batch). The planner picks between them.
* ``mask_zero`` parity: row 0 is the pad/OOV bucket by convention
  (``dien/model.py:11``, ``eges/data_loader.py:8-9``); masks are computed
  by callers as ``ids != 0`` — the table itself never masks.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EmbeddingSpec:
    """Declarative spec used by planners/checkpointing."""

    name: str
    vocab_size: int
    features: int
    combiner: Optional[str] = None  # None | 'sum' | 'mean'
    sharded: bool = False


class Embedding(nn.Module):
    vocab_size: int
    features: int
    partition: Optional[str] = None  # None → replicated; "model" → row-sharded
    param_dtype: jnp.dtype = jnp.float32
    # Sharded-lookup exchange for partitioned tables:
    # * "gspmd" (default): XLA compiles the gather into masked-local-gather
    #   + all-reduce. CAVEAT: its BACKWARD materializes a replicated
    #   full-table scatter on every device (the SPMD partitioner cannot
    #   row-split a scatter with arbitrary indices — verified from compiled
    #   HLO, tests/test_sharded_10m.py) — fine for small sharded tables,
    #   wasteful for big ones.
    # * "psum": the same masked-gather+all-reduce exchange built explicitly
    #   with shard_map (embedding.sharded.sharded_lookup) — identical comm,
    #   but the cotangent scatter stays SHARD-LOCAL ([V/m, D] per device)
    #   with the per-shard 3-way kernel gate. The planner's choice for big
    #   sharded tables at small batch. Requires ``mesh``.
    # * "a2a": ids routed to the owning shard and vectors back
    #   (embedding.sharded.all_to_all_lookup — comm drops from B·F·D to
    #   ≈2·B·F·D/m per device; the planner picks it for large batches).
    #   Requires ``mesh``. Routing buckets are fixed-size: ids beyond a
    #   destination shard's capacity (``capacity_factor`` × fair share) are
    #   served a 0 vector, so size it for the id-frequency skew you expect
    #   (``planner.plan_tables`` computes a skew-aware value;
    #   ``sharded.a2a_overflow_fraction`` measures one). capacity_factor ==
    #   num model shards is always lossless (degenerates to psum-grade
    #   communication).
    lookup_mode: str = "gspmd"
    mesh: Optional[object] = None
    capacity_factor: float = 2.0  # jax.sharding.Mesh (hashable, static)
    # Mixed-precision lookup: cast the table to this dtype before the
    # gather (master param stays ``param_dtype`` — the optimizer never sees
    # reduced precision). STANDALONE the bf16 scatter-add backward is 18%
    # faster (213k rows into 1M×16 on v5e: 5.8 → 4.8 ms) and the gather is
    # row-latency-bound (unchanged) — but END-TO-END the DLRM b8192 step
    # measured SLOWER (9.19 → 9.65 ms, 2026-08-19): the per-step f32→bf16
    # table materialization and the bf16→f32 dense-cotangent up-cast cost
    # more than the scatter saves, and the cast breaks XLA's
    # pad+scatter/cotangent-producer fusion. Keep None (f32) for big tables
    # on HBM; the knob exists for activation-dtype uniformity with bf16
    # MLP stacks on small tables, not as a speed lever.
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray, dedup_plan: Optional[dict] = None) -> jnp.ndarray:
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform", out_axis=0)
        if self.partition is not None:
            init = nn.with_partitioning(init, (self.partition, None))
        table = self.param(
            "embedding", init, (self.vocab_size, self.features), self.param_dtype
        )
        table = jnp.asarray(table)  # unbox partitioned param
        if self.compute_dtype is not None and table.dtype != self.compute_dtype:
            table = table.astype(self.compute_dtype)
        if (
            self.lookup_mode == "a2a"
            and self.partition is not None
            and self.mesh is not None
            and self.mesh.shape.get("model", 1) > 1
        ):
            from recommender_tpu.embedding.sharded import all_to_all_lookup

            vecs, dropped = all_to_all_lookup(
                table, ids, self.mesh, capacity_factor=self.capacity_factor,
                return_overflow=True,
            )
            # One psum'd scalar: ids served a 0 vector this step because a
            # destination bucket overflowed (skewed batch). Sown into the
            # "diagnostics" collection — a no-op unless the caller marks it
            # mutable (tasks._apply does during training), so eval paths
            # pay nothing. Rides the metrics dict as ``a2a_overflow``.
            self.sow(
                "diagnostics", "a2a_overflow", dropped,
                init_fn=lambda: jnp.zeros((), jnp.int32),
                reduce_fn=jnp.add,
            )
            return vecs
        if (
            self.lookup_mode == "psum"
            and self.partition is not None
            and self.mesh is not None
            and self.mesh.shape.get("model", 1) > 1
        ):
            from recommender_tpu.embedding.sharded import sharded_lookup

            return sharded_lookup(table, ids, self.mesh)
        # Narrow tables take the custom-VJP lookup (plain gather forward,
        # padded-width scatter backward) when THIS call scatters enough
        # rows that XLA's 4x-slow narrow scatter dominates the padding
        # overhead — purely volume-gated at PADDED_BWD_MIN_IDS (DLRM
        # b8192 213k-id lookups: 14.3 -> 8.9 ms/step with the Trainer's
        # split step; DIEN b1024 histories: 23.1 -> 14.0). Small lookups
        # keep the native take — the padded backward's pad/slice copies
        # regress them (DIEN b128: 3.9 -> 6.2 ms; MMOE per-table b8192:
        # 10.1 -> 16.5).
        # Measurements: benchmarks/bench_kernels.py; design: docs/DESIGN.md.
        from recommender_tpu.ops.embedding_kernels import (
            embedding_lookup,
            embedding_lookup_dedup,
            use_padded_backward,
        )

        # Host-precomputed dedup plan riding in the batch (data/dedup.py):
        # Zipf-skewed ids collapse ~6x to unique rows, and the plan-driven
        # backward (segment-sum into unique slots + small table scatter)
        # undercuts even the padded scatter. Replicated tables only — the
        # plan indexes the device-resident flat id stream (see
        # ops.embedding_kernels.embedding_lookup_dedup scope note).
        if dedup_plan is not None and self.partition is None:
            return embedding_lookup_dedup(
                table, ids,
                dedup_plan["perm"], dedup_plan["slot"], dedup_plan["uniq"],
            )
        if use_padded_backward(table.shape, ids.size):
            return embedding_lookup(table, ids)
        return jnp.take(table, ids, axis=0)

def bag_combine(emb: jnp.ndarray, weights: jnp.ndarray, combiner: str) -> jnp.ndarray:
    """Combine a bag of embeddings [..., K, D] with weights [..., K] → [..., D].

    ``mean`` divides by the weight sum clipped to >= 1 (multi-hot pooling as in
    ``pinsage/train/layers.py:76-78``).
    """
    w = weights.astype(emb.dtype)[..., None]
    s = jnp.sum(emb * w, axis=-2)
    if combiner == "sum":
        return s
    if combiner == "mean":
        return s / jnp.maximum(jnp.sum(w, axis=-2), 1.0)
    raise ValueError(f"unknown combiner {combiner}")
