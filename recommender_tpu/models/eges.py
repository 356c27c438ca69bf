"""Graph item-embedding models: DeepWalk (BGE), GES, EGES.

Behavioral parity with ``/root/reference/eges/model.py``:
* ``DeepWalk`` — input/output tables; logits = context-embs · hidden
  (sampled-softmax dot products, ``eges/model.py:26-36``).
* ``GES``     — hidden = mean(id, cat, brand embeddings)
  (``eges/model.py:58-80``).
* ``EGES``    — per-item softmax weights over the [id, cat, brand]
  embeddings via a ``[V, num_side]`` weight table (``eges/model.py:83-102``).

Batch schema (from ``recommender_tpu.graph.walks.skipgram_batches``):
``target`` [B], ``context`` [B, 1+k] (1 positive + k Zipf negatives),
``label`` [B, 1+k]; GES/EGES add ``target_cat``/``target_brand`` [B].
``get_hidden`` is the retrieval-side representation used for link-prediction
eval and cold-start (side-info-only) inference (``eges/README.md:16-17``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from recommender_tpu.embedding.table import Embedding


class DeepWalk(nn.Module):
    vocab_size: int
    embed_dim: int = 128
    partition: str | None = None  # 'model' → row-shard the big id tables
    lookup_mode: str = "gspmd"  # 'psum'/'a2a' need mesh (Embedding.lookup_mode)
    mesh: object | None = None

    def setup(self):
        self.input_embedding = Embedding(self.vocab_size, self.embed_dim, partition=self.partition, lookup_mode=self.lookup_mode, mesh=self.mesh)
        self.output_embedding = Embedding(self.vocab_size, self.embed_dim, partition=self.partition, lookup_mode=self.lookup_mode, mesh=self.mesh)

    def get_hidden(self, batch: dict) -> jnp.ndarray:
        return self.input_embedding(batch["target"])

    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        hidden = self.get_hidden(batch)  # [B, D]
        ctx = self.output_embedding(batch["context"])  # [B, 1+k, D]
        return jnp.einsum("bkd,bd->bk", ctx, hidden)


class GES(nn.Module):
    vocab_size: int
    cat_vocab: int
    brand_vocab: int
    embed_dim: int = 128
    partition: str | None = None
    lookup_mode: str = "gspmd"  # see DeepWalk
    mesh: object | None = None

    def setup(self):
        self.id_embedding = Embedding(self.vocab_size, self.embed_dim, partition=self.partition, lookup_mode=self.lookup_mode, mesh=self.mesh)
        self.cat_embedding = Embedding(self.cat_vocab, self.embed_dim)
        self.brand_embedding = Embedding(self.brand_vocab, self.embed_dim)
        self.output_embedding = Embedding(self.vocab_size, self.embed_dim, partition=self.partition, lookup_mode=self.lookup_mode, mesh=self.mesh)

    def side_stack(self, batch: dict) -> jnp.ndarray:
        """[B, 3, D]: id, cat, brand embeddings."""
        return jnp.stack(
            [
                self.id_embedding(batch["target"]),
                self.cat_embedding(batch["target_cat"]),
                self.brand_embedding(batch["target_brand"]),
            ],
            axis=1,
        )

    def get_hidden(self, batch: dict) -> jnp.ndarray:
        return jnp.mean(self.side_stack(batch), axis=1)

    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        hidden = self.get_hidden(batch)
        ctx = self.output_embedding(batch["context"])
        return jnp.einsum("bkd,bd->bk", ctx, hidden)


class EGES(GES):
    num_side: int = 3

    def setup(self):
        super().setup()
        self.weight_embedding = Embedding(self.vocab_size, self.num_side)

    def get_hidden(self, batch: dict) -> jnp.ndarray:
        stack = self.side_stack(batch)  # [B, 3, D]
        w = nn.softmax(self.weight_embedding(batch["target"]), axis=-1)  # [B, 3]
        return jnp.einsum("bs,bsd->bd", w, stack)
