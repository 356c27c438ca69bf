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
import jax.numpy as jnp

from recommender_tpu.embedding.table import Embedding
from recommender_tpu.nn.mlp import MLP
from recommender_tpu.nn.moe import ExpertBank, MMOEGate


class FeatureEmbedder(nn.Module):
    """Per-feature embedding tables → concatenated [B, F*D].

    ``partition`` may be a single policy for every table or a per-feature
    tuple (e.g. from ``embedding.planner.plan_tables``: replicate the tiny
    tables, row-shard the large ones)."""

    vocab_sizes: Sequence[int]
    embed_dim: int = 18
    partition: str | None | Sequence[str | None] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        per_feat = (
            tuple(self.partition)
            if isinstance(self.partition, (list, tuple))
            else (self.partition,) * len(self.vocab_sizes)
        )
        cols = []
        for j, v in enumerate(self.vocab_sizes):
            emb = Embedding(v, self.embed_dim, name=f"feat_{j}", partition=per_feat[j])
            cols.append(emb(features[:, j]))
        return jnp.concatenate(cols, axis=-1)


class MultiTaskBase(nn.Module):
    """Single-head model (used as CTR-only or CVR-only in the Base protocol)."""

    vocab_sizes: Sequence[int]
    embed_dim: int = 18
    mlp_units: Sequence[int] = (360, 200, 80, 2)
    partition: str | None | Sequence[str | None] = None  # see FeatureEmbedder

    @nn.compact
    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        x = FeatureEmbedder(self.vocab_sizes, self.embed_dim, self.partition)(batch["features"])
        out = MLP(self.mlp_units, final_activation=nn.softmax)(x, train=train)
        # reference uses a 2-unit softmax head; prob of class 1
        return out[:, 1] if out.shape[-1] == 2 else jnp.squeeze(nn.sigmoid(out), -1)


class ESMM(nn.Module):
    vocab_sizes: Sequence[int]
    embed_dim: int = 18
    mlp_units: Sequence[int] = (360, 200, 80, 1)
    partition: str | None | Sequence[str | None] = None  # see FeatureEmbedder

    def setup(self):
        self.embedder = FeatureEmbedder(self.vocab_sizes, self.embed_dim, self.partition)
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

    def setup(self):
        self.embedder = FeatureEmbedder(self.vocab_sizes, self.embed_dim, self.partition)
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
