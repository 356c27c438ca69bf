"""PinSage — importance-pooling graph convolution for item retrieval.

Behavioral parity with ``/root/reference/pinsage/train``:
* ``FeatureProjector`` — id/year/genre embeddings gathered for sampled
  nodes, concat dim 3*E (``layers.py:49-81``). Divergence (documented):
  the reference *embeds the 0/1 values* of the genre multi-hot through a
  ``num_genres``-row table (``layers.py:66-70``); we compute the intended
  multi-hot **mean of genre embeddings** (``multihot @ table / count``).
* ``Convolve`` — neighbor FC → importance-weighted mean with weight-sum
  clipped to ≥1 (``layers.py:23`` parity trap) → concat dst → FC → L2
  normalize. Divergence (documented, SURVEY.md §7 quirks): the reference
  normalizes by the norm of the whole batch tensor (``layers.py:28-29``);
  we L2-normalize **per row**, the PinSage paper semantics.
* ``SageNet`` — stacked Convolves + two output FCs (``layers.py:33-46``).
* scorer — per-pair dot product (``model.py:14-19`` ``u_dot_v``).

The ragged DGL blocks are replaced by the dense ``BlockBatch`` tree
(``recommender_tpu.graph.bipartite``): every op below is a batched matmul /
weighted segment mean with static shapes — the whole step jits (the
reference could not even ``tf.function`` its train step,
``pinsage/train/train.py:39``).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from recommender_tpu.embedding.table import Embedding


@dataclasses.dataclass(frozen=True)
class ItemFeatures:
    """Static per-item features (MovieLens: id implicit, year idx, genre multi-hot)."""

    year: np.ndarray  # [V] int32
    genre: np.ndarray  # [V, G] float32 multi-hot

    @property
    def num_items(self) -> int:
        return len(self.year)

    def __hash__(self):  # flax module attrs must be hashable
        return hash((self.year.shape, self.genre.shape, int(self.year.sum())))

    def __eq__(self, other):
        return self is other


class FeatureProjector(nn.Module):
    features: ItemFeatures
    embed_dim: int = 8
    # 'model' row-shards the ITEM id table (the only vocab that grows with
    # the corpus) over the model mesh axis; the year/genre tables are tiny
    # and stay replicated (the planner's replicate-below-threshold call).
    partition: str | None = None
    lookup_mode: str = "gspmd"  # 'psum'/'a2a' need mesh (Embedding.lookup_mode)
    mesh: object | None = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        f = self.features
        year_vocab = int(f.year.max()) + 1
        num_genres = f.genre.shape[1]
        year_emb = Embedding(year_vocab, self.embed_dim, name="year")(
            jnp.asarray(f.year)[ids]
        )
        genre_table = self.param(
            "genre_embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform", out_axis=0),
            (num_genres, self.embed_dim),
        )
        multihot = jnp.asarray(f.genre)[ids]  # [..., G]
        genre_emb = jnp.matmul(multihot, genre_table) / jnp.maximum(
            jnp.sum(multihot, axis=-1, keepdims=True), 1.0
        )
        id_emb = Embedding(
            f.num_items, self.embed_dim, name="id", partition=self.partition,
            lookup_mode=self.lookup_mode, mesh=self.mesh
        )(ids)
        return jnp.concatenate([year_emb, genre_emb, id_emb], axis=-1)


class Convolve(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(
        self, dst_h: jnp.ndarray, nbr_h: jnp.ndarray, w: jnp.ndarray
    ) -> jnp.ndarray:
        """dst_h [..., D], nbr_h [..., T, D], w [..., T] → [..., out]."""
        u = nn.relu(nn.Dense(self.hidden)(nbr_h))  # neighbor transform
        ws = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)  # clip ≥ 1
        pooled = jnp.einsum("...td,...t->...d", u, w) / ws  # importance pooling
        new = nn.relu(nn.Dense(self.out)(jnp.concatenate([pooled, dst_h], axis=-1)))
        norm = jnp.maximum(jnp.linalg.norm(new, axis=-1, keepdims=True), 1e-12)
        return new / norm  # per-row L2 (paper semantics; see module docstring)


class PinSage(nn.Module):
    features: ItemFeatures
    embed_dim: int = 8
    conv_hidden: int = 64
    conv_out: int = 32
    num_layers: int = 2
    partition: str | None = None  # see FeatureProjector.partition
    lookup_mode: str = "gspmd"
    mesh: object | None = None

    def setup(self):
        self.projector = FeatureProjector(
            self.features, self.embed_dim, partition=self.partition,
            lookup_mode=self.lookup_mode, mesh=self.mesh,
        )
        self.convs = [
            Convolve(self.conv_hidden, self.conv_out, name=f"conv_{i}")
            for i in range(self.num_layers)
        ]
        self.fc1 = nn.Dense(self.conv_hidden)
        self.fc2 = nn.Dense(self.conv_out)

    def get_repr(self, block: dict) -> jnp.ndarray:
        """Dense 2-layer tree → final reprs for ``block['nodes']`` [N, out]."""
        nodes = block["nodes"]  # [N]
        nbr1, w1 = block["nbr1"], block["w1"]  # [N, T]
        flat1 = block["flat1"]  # [N*(1+T)]
        nbr2, w2 = block["nbr2"], block["w2"]  # [N*(1+T), T]
        n = nodes.shape[0]
        t = nbr1.shape[1]

        h0_dst = self.projector(flat1)  # [N*(1+T), 3E]
        h0_nbr = self.projector(nbr2)  # [N*(1+T), T, 3E]
        h1 = self.convs[0](h0_dst, h0_nbr, w2)  # [N*(1+T), out]

        h1 = h1.reshape(n, 1 + t, -1)
        h1_nodes = h1[:, 0, :]
        h1_nbr1 = h1[:, 1:, :]
        h2 = self.convs[1](h1_nodes, h1_nbr1, w1)  # [N, out]
        return self.fc2(nn.relu(self.fc1(h2)))

    def __call__(self, batch: dict, *, train: bool = False):
        """batch: block tensors for the stacked [heads; pos; neg] node list.

        Returns (pos_score, neg_score) per pair (``model.py:21-30``)."""
        reprs = self.get_repr(batch)
        n = reprs.shape[0] // 3
        h, p, ng = reprs[:n], reprs[n : 2 * n], reprs[2 * n :]
        pos_score = jnp.sum(h * p, axis=-1)
        neg_score = jnp.sum(h * ng, axis=-1)
        return pos_score, neg_score
