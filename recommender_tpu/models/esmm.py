"""Multi-task CTR/CVR models: BASE, ESMM, MMOE (Ali-CCP).

Behavioral parity:
* ``MultiTaskBase``  — ``esmm/base.py:7-19``: per-feature embedding tables
  (18 tables, dim 18) → concat → MLP; one binary head. Used twice in the
  reference's Base protocol (a CTR model on impressions + a CVR model on
  clicks; CTCVR prob = product of both — ``esmm/train.py:49-54``).
* ``ESMM``           — ``esmm/esmm.py:7-44``: shared embedding, CTR + CVR
  towers, pCTCVR = pCTR·pCVR; probe heads ``compute_cvr/ctr/ctcvr``.
* ``MMOE``           — ``esmm/mmoe.py:8-109``: expert bank + per-task
  softmax gates + task towers, ESMM-style coupling of head 1 by head 0
  (``outputs[1] = outputs[0]*outputs[1]``, ``esmm/mmoe.py:44``). The
  reference's three probe methods each re-run the full forward; here one
  forward returns everything.

Batch schema (``esmm/tfrecord_io.py:116-138``): ``features`` [B, 18] int32
(one column per categorical field), labels ``click`` / ``purchase`` [B].
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recommender_tpu.embedding.table import Embedding
from recommender_tpu.nn.mlp import MLP
from recommender_tpu.nn.moe import ExpertBank, MMOEGate


class FeatureEmbedder(nn.Module):
    """Per-feature embedding tables → concatenated [B, F*D].

    ``stack=True`` enables **table stacking** (the TPUEmbedding trick): all
    F same-width tables live as one ``[ΣV, D]`` param, feature ``j``'s rows
    at offset ``Σ_{i<j} V_i``; the whole batch takes ONE gather of ``[B, F]``
    shifted ids (one scatter-add gradient) instead of F per-table pairs.
    Per-row semantics (lookup, Adam update, init distribution) are
    unchanged: each segment is initialized exactly as its standalone table
    would be, and elementwise optimizers never couple rows.

    Stacking is **off by default** — measured on v5e (2026-08-19, MMOE with
    18×100k×18 tables, benchmarks/exp_mmoe_stacking.py) it LOSES at both
    reference scales: b512 4.2 vs 3.4 ms, b8192 21.2 vs 10.1 ms, under
    every backward/split variant. One 147k-row scatter into a 1.8M×18
    big-narrow table serializes against a single fat Adam update, while 18
    small per-table scatter→Adam chains pipeline; the fused-step layout
    pathologies (docs/DESIGN.md) also engage at the stacked size. Stack
    only when the per-table dispatch overhead dominates instead — many
    genuinely tiny vocabs at small batch.

    ``partition``, ``lookup_modes`` and ``capacity_factors`` may each be a
    single policy for every table or a per-feature tuple — the rendered
    output of ``embedding.planner.plan_tables`` via ``planner.module_kwargs``
    (replicate the tiny tables; row-shard the large ones and give each its
    planned exchange + skew-aware a2a bucket capacity). A per-feature tuple
    needs per-table params, so it always disables stacking; a uniform
    policy (including ``"model"`` — GSPMD row-shards the stacked table as a
    whole) may stack. ``mesh`` is required by any ``"a2a"`` lookup
    (``Embedding.lookup_mode``).
    """

    vocab_sizes: Sequence[int]
    embed_dim: int = 18
    partition: str | None | Sequence[str | None] = None
    stack: bool = False
    lookup_modes: str | Sequence[str] = "gspmd"
    capacity_factors: float | Sequence[float] = 2.0
    mesh: object | None = None
    # bf16-stored tables + auto stochastic rounding: the r3 MMOE budget is
    # embedding-dominated (embedder fwd+bwd 7.65 of the 10.35 ms b8192
    # step + 1.10 ms table Adam) — bf16 halves those bytes. Per-table path
    # only (the stacked path stays f32).
    param_dtype: jnp.dtype = jnp.float32

    def _per_feat(self, v):
        n = len(self.vocab_sizes)
        return tuple(v) if isinstance(v, (list, tuple)) else (v,) * n

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        per_table_cfg = any(
            isinstance(v, (list, tuple))
            for v in (self.partition, self.lookup_modes, self.capacity_factors)
        )
        if not self.stack or per_table_cfg:
            per_feat = self._per_feat(self.partition)
            lookups = self._per_feat(self.lookup_modes)
            caps = self._per_feat(self.capacity_factors)
            cols = []
            for j, v in enumerate(self.vocab_sizes):
                emb = Embedding(
                    v, self.embed_dim, name=f"feat_{j}", partition=per_feat[j],
                    lookup_mode=lookups[j], capacity_factor=float(caps[j]),
                    mesh=self.mesh if lookups[j] in ("a2a", "psum") else None,
                    param_dtype=self.param_dtype,
                )
                cols.append(emb(features[:, j]))
            # bf16-stored tables: upcast gathered activations (cheap) so
            # towers/experts keep f32 math; the astype transpose rounds
            # the cotangent back to bf16 before each scatter.
            return jnp.concatenate(cols, axis=-1).astype(jnp.float32)

        if self.lookup_modes != "gspmd":
            raise ValueError(
                "stacked tables support only the gspmd lookup; use per-table "
                f"mode (stack=False) for lookup_modes={self.lookup_modes!r}"
            )
        if jnp.dtype(self.param_dtype) != jnp.float32:
            raise ValueError(
                "stacked tables are f32-only (measured slower anyway — module "
                "docstring); use per-table mode (stack=False) for "
                f"param_dtype={self.param_dtype}"
            )
        vocab_sizes = tuple(int(v) for v in self.vocab_sizes)
        total = sum(vocab_sizes)
        dim = self.embed_dim
        base = nn.initializers.variance_scaling(1.0, "fan_in", "uniform", out_axis=0)

        def stacked_init(key, shape, dtype=jnp.float32):
            # per-segment init == each standalone table's init (fan depends
            # on the table shape, so one call over [ΣV, D] would differ)
            keys = jax.random.split(key, len(vocab_sizes))
            segs = [
                base(k, (v, dim), dtype) for k, v in zip(keys, vocab_sizes)
            ]
            return jnp.concatenate(segs, axis=0)

        init = stacked_init
        if self.partition is not None:
            init = nn.with_partitioning(init, (self.partition, None))
        table = jnp.asarray(
            self.param("stacked_embedding", init, (total, dim), jnp.float32)
        )
        offsets = jnp.asarray(
            np.cumsum([0] + list(vocab_sizes[:-1])), dtype=features.dtype
        )
        # clamp within each feature's own segment BEFORE offsetting: an
        # out-of-range id must hit its own table's last row (jnp.take's
        # per-table clip semantics), not bleed into the next feature's rows
        maxima = jnp.asarray(
            np.asarray(vocab_sizes) - 1, dtype=features.dtype
        )
        local = jnp.clip(features, 0, maxima[None, :])
        ids = local + offsets[None, :]  # [B, F] global rows
        # NOTE: the stacked path supports only the default precision /
        # gspmd lookup config (param f32, no compute cast, no a2a) — it is
        # measured slower and off by default (module docstring); route
        # per-table via Embedding for the full knob surface.
        from recommender_tpu.ops.embedding_kernels import (
            embedding_lookup,
            use_padded_backward,
        )

        if use_padded_backward(table.shape, ids.size):
            emb = embedding_lookup(table, ids)
        else:
            emb = jnp.take(table, ids, axis=0)
        return emb.reshape(features.shape[0], len(vocab_sizes) * dim)


class MultiTaskBase(nn.Module):
    """Single-head model (used as CTR-only or CVR-only in the Base protocol)."""

    vocab_sizes: Sequence[int]
    embed_dim: int = 18
    mlp_units: Sequence[int] = (360, 200, 80, 2)
    partition: str | None | Sequence[str | None] = None  # see FeatureEmbedder
    stack_tables: bool = False
    lookup_modes: str | Sequence[str] = "gspmd"  # see FeatureEmbedder
    capacity_factors: float | Sequence[float] = 2.0
    mesh: object | None = None
    embed_param_dtype: jnp.dtype = jnp.float32  # see FeatureEmbedder.param_dtype

    @nn.compact
    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        x = FeatureEmbedder(
            self.vocab_sizes, self.embed_dim, self.partition, self.stack_tables,
            lookup_modes=self.lookup_modes,
            capacity_factors=self.capacity_factors, mesh=self.mesh,
            param_dtype=self.embed_param_dtype,
        )(batch["features"])
        out = MLP(self.mlp_units, final_activation=nn.softmax)(x, train=train)
        # reference uses a 2-unit softmax head; prob of class 1
        return out[:, 1] if out.shape[-1] == 2 else jnp.squeeze(nn.sigmoid(out), -1)


class ESMM(nn.Module):
    vocab_sizes: Sequence[int]
    embed_dim: int = 18
    mlp_units: Sequence[int] = (360, 200, 80, 1)
    partition: str | None | Sequence[str | None] = None  # see FeatureEmbedder
    stack_tables: bool = False
    lookup_modes: str | Sequence[str] = "gspmd"  # see FeatureEmbedder
    capacity_factors: float | Sequence[float] = 2.0
    mesh: object | None = None
    embed_param_dtype: jnp.dtype = jnp.float32  # see FeatureEmbedder.param_dtype

    def setup(self):
        self.embedder = FeatureEmbedder(
            self.vocab_sizes, self.embed_dim, self.partition, self.stack_tables,
            lookup_modes=self.lookup_modes,
            capacity_factors=self.capacity_factors, mesh=self.mesh,
            param_dtype=self.embed_param_dtype,
        )
        self.ctr_tower = MLP(self.mlp_units, final_activation=nn.sigmoid)
        self.cvr_tower = MLP(self.mlp_units, final_activation=nn.sigmoid)

    def __call__(self, batch: dict, *, train: bool = False) -> dict:
        x = self.embedder(batch["features"])
        p_ctr = jnp.squeeze(self.ctr_tower(x, train=train), -1)
        p_cvr = jnp.squeeze(self.cvr_tower(x, train=train), -1)
        return {"ctr": p_ctr, "cvr": p_cvr, "ctcvr": p_ctr * p_cvr}


class MMOE(nn.Module):
    vocab_sizes: Sequence[int]
    embed_dim: int = 18
    num_tasks: int = 2
    num_experts: int = 8
    expert_units: Sequence[int] = (200, 80)
    tower_units: Sequence[int] = (40, 1)
    partition: str | None | Sequence[str | None] = None  # see FeatureEmbedder
    stack_tables: bool = False
    lookup_modes: str | Sequence[str] = "gspmd"  # see FeatureEmbedder
    capacity_factors: float | Sequence[float] = 2.0
    mesh: object | None = None
    embed_param_dtype: jnp.dtype = jnp.float32  # see FeatureEmbedder.param_dtype

    def setup(self):
        self.embedder = FeatureEmbedder(
            self.vocab_sizes, self.embed_dim, self.partition, self.stack_tables,
            lookup_modes=self.lookup_modes,
            capacity_factors=self.capacity_factors, mesh=self.mesh,
            param_dtype=self.embed_param_dtype,
        )
        self.expert_bank = ExpertBank(self.num_experts, self.expert_units)
        self.gates = [
            MMOEGate(self.num_experts, name=f"gate_{i}") for i in range(self.num_tasks)
        ]
        self.towers = [
            MLP(self.tower_units, final_activation=nn.sigmoid, name=f"tower_{i}")
            for i in range(self.num_tasks)
        ]

    def __call__(self, batch: dict, *, train: bool = False) -> dict:
        x = self.embedder(batch["features"])
        experts = self.expert_bank(x)  # [B, E, H]
        heads = []
        for gate, tower in zip(self.gates, self.towers):
            mixed = gate(x, experts)
            heads.append(jnp.squeeze(tower(mixed, train=train), -1))
        p_ctr, p_cvr = heads[0], heads[1]
        return {"ctr": p_ctr, "cvr": p_cvr, "ctcvr": p_ctr * p_cvr}
