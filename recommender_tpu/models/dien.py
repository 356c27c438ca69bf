"""Behavior-sequence CTR models: BASE (mean-pool), DIN, DIEN.

Behavioral parity with ``/root/reference/dien/model.py:7-80``:
* shared item + category embedding tables (``mask_zero`` parity: id 0 = pad,
  masks are ``item_id != 0``), embeddings concatenated per step;
* BASE: masked mean-pool of history ∥ target → MLP(sigmoid)
  (``dien/model.py:24-34``);
* DIN: LocalActivationUnit attention pooling (``dien/model.py:37-53``);
* DIEN: masked GRU interest extractor + per-step auxiliary loss on
  pos/neg next-item (``dien/layers.py:76-133``), bilinear attention
  (``dien/layers.py:136-158``), AUGRU interest evolution
  (``dien/layers.py:161-204``); returns ``(prob, aux_loss)``
  (``dien/model.py:56-80``).

The MLP applies BatchNorm to its input (``dien/layers.py:22``); both
recurrences are single ``lax.scan``s with fused gate matmuls
(SURVEY.md §3.2 "On TPU these become lax.scans").

Batch schema (``dien/data_loader.py:35-63``): target_item, target_cat,
pos_his_item, pos_his_cat, [neg_his_item, neg_his_cat], label; histories
post-padded with 0 to a fixed max length.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommender_tpu.embedding.table import Embedding
from recommender_tpu.nn.losses import masked_auxiliary_loss
from recommender_tpu.nn.mlp import MLP
from recommender_tpu.nn.recurrent import AUGRU, GRU
from recommender_tpu.nn.sequence import (
    AuxiliaryNet,
    DIENAttention,
    LocalActivationUnit,
    masked_mean_pool,
)


class SequenceBase(nn.Module):
    """Shared embeddings + helpers for the BASE/DIN/DIEN family."""

    item_vocab: int
    cat_vocab: int
    item_dim: int = 18
    cat_dim: int = 18
    mlp_units: Sequence[int] = (200, 80, 1)
    partition: Optional[str] = None
    # Sharded-table exchange for partitioned tables ('gspmd'|'psum'|'a2a';
    # see embedding/table.py::Embedding.lookup_mode — 'psum' keeps the
    # history scatters shard-local, the gspmd backward replicates them).
    # 'psum'/'a2a' need ``mesh`` (static module attribute).
    lookup_mode: str = "gspmd"
    mesh: Optional[object] = None
    # One gather per table for ALL id sets of the step (target + pos
    # history + neg history concatenated) instead of one per set. Identical
    # math, and on paper one scatter-add backward per table instead of
    # three — but MEASURED SLOWER at the flagship shape (DIEN b1024 T100:
    # 14.98 ms shared vs 10.77 ms with per-set lookups,
    # benchmarks/profile_dien_mmoe.py 2026-08-21), so it is OFF by
    # default: the per-set scatters let XLA fuse each pad+scatter into its
    # own cotangent producer, while the combined path materializes the
    # concatenated [2BT+B, D] cotangent before one big scatter. Kept as a
    # measurable A/B knob.
    shared_gather: bool = False
    # bf16-stored tables + auto stochastic rounding (core/optim.py): the
    # r3 budget shows DIEN b1024 is embedding-bound (embeds fwd+bwd 6.49
    # of the 10.65 ms step), so halving table bytes is the direct lever —
    # measured in benchmarks/bench_models.py dien_amazon_*_bf16sr.
    embed_param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.item_embedding = Embedding(self.item_vocab, self.item_dim,
                                        partition=self.partition,
                                        lookup_mode=self.lookup_mode,
                                        mesh=self.mesh,
                                        param_dtype=self.embed_param_dtype)
        self.cat_embedding = Embedding(self.cat_vocab, self.cat_dim,
                                       partition=self.partition,
                                       lookup_mode=self.lookup_mode,
                                       mesh=self.mesh,
                                       param_dtype=self.embed_param_dtype)
        self.mlp = MLP(self.mlp_units, final_activation=nn.sigmoid, input_batch_norm=True)

    def embed(self, item, cat):
        # bf16-stored tables: upcast the GATHERED activations to f32 so the
        # downstream scans/MLPs keep their f32 carries — a [B,T,D]-sized
        # cast (~30 MB at b1024), not the per-step whole-table cast that
        # made Embedding.compute_dtype a loss. The astype's transpose
        # rounds the cotangent back to bf16 before the scatter, keeping
        # the half-byte backward.
        out = jnp.concatenate(
            [self.item_embedding(item), self.cat_embedding(cat)], axis=-1
        )
        return out.astype(jnp.float32)

    def embed_sets(self, items, cats):
        """Embed several (item_ids, cat_ids) sets — [B] target, [B, T]
        histories — with ONE lookup per table (see ``shared_gather``).
        Returns one [..., item_dim+cat_dim] array per input set."""
        if not self.shared_gather:
            return [self.embed(i, c) for i, c in zip(items, cats)]
        import numpy as np

        shapes = [tuple(i.shape) for i in items]
        flat_i = jnp.concatenate([i.reshape(-1) for i in items])
        flat_c = jnp.concatenate([c.reshape(-1) for c in cats])
        emb_i = self.item_embedding(flat_i)
        emb_c = self.cat_embedding(flat_c)
        out, off = [], 0
        for shp in shapes:
            n = int(np.prod(shp))
            out.append(
                jnp.concatenate(
                    [
                        emb_i[off : off + n].reshape(*shp, -1),
                        emb_c[off : off + n].reshape(*shp, -1),
                    ],
                    axis=-1,
                ).astype(jnp.float32)
            )
            off += n
        return out

    def head(self, target_emb, history_repr, train):
        x = jnp.concatenate([target_emb, history_repr], axis=-1)
        prob = self.mlp(x, train=train)
        return jnp.squeeze(prob, axis=-1)


class BaseModel(SequenceBase):
    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        mask = (batch["pos_his_item"] != 0).astype(jnp.float32)
        target, his = self.embed_sets(
            [batch["target_item"], batch["pos_his_item"]],
            [batch["target_cat"], batch["pos_his_cat"]],
        )  # [B, D], [B, T, D]
        pooled = masked_mean_pool(his, mask)
        return self.head(target, pooled, train)


class DIN(SequenceBase):
    def setup(self):
        super().setup()
        self.local_activation_unit = LocalActivationUnit()

    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        mask = (batch["pos_his_item"] != 0).astype(jnp.float32)
        target, his = self.embed_sets(
            [batch["target_item"], batch["pos_his_item"]],
            [batch["target_cat"], batch["pos_his_cat"]],
        )
        pooled = self.local_activation_unit(target, his, mask)
        return self.head(target, pooled, train)


class DIEN(SequenceBase):
    extract_hidden: int = 36
    evolve_hidden: int = 36
    # rematerialize scan steps: None = auto (on for T > 256, where it is
    # both the memory knob AND faster — nn/recurrent.py REMAT_MIN_T)
    remat: bool | None = None

    def setup(self):
        super().setup()
        self.extract_gru = GRU(hidden=self.extract_hidden, remat=self.remat)
        self.auxiliary_net = AuxiliaryNet()
        self.attention = DIENAttention()
        self.evolve = AUGRU(hidden=self.evolve_hidden, remat=self.remat)

    def __call__(self, batch: dict, *, train: bool = False):
        mask = (batch["pos_his_item"] != 0).astype(jnp.float32)
        target, pos_his, neg_his = self.embed_sets(
            [batch["target_item"], batch["pos_his_item"], batch["neg_his_item"]],
            [batch["target_cat"], batch["pos_his_cat"], batch["neg_his_cat"]],
        )  # [B, D], [B, T, D], [B, T, D]

        hidden = self.extract_gru(pos_his, mask)  # [B, T, H]
        # auxiliary loss: h(t) vs pos/neg item at t+1 (dien/layers.py:89-108)
        h_t = hidden[:, :-1, :]
        pos_next = pos_his[:, 1:, :]
        neg_next = neg_his[:, 1:, :]
        pos_logits = self.auxiliary_net(jnp.concatenate([h_t, pos_next], axis=-1))
        neg_logits = self.auxiliary_net(jnp.concatenate([h_t, neg_next], axis=-1))
        aux_loss = masked_auxiliary_loss(pos_logits, neg_logits, mask[:, 1:])

        score = self.attention(target, hidden, mask)  # [B, T, 1]
        final = self.evolve(hidden, score, mask)  # [B, H]
        prob = self.head(target, final, train)
        return prob, aux_loss
