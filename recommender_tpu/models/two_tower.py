"""Two-tower retrieval — in-batch-softmax dual encoders.

Beyond-reference model (the reference's only retrieval trainer is the
PinSage GNN): the two-tower + in-batch sampled softmax is the standard
industrial retrieval baseline (YouTube DNN / dual-encoder family), and
on TPU it is one dense [B, D]×[D, B] MXU matmul per step — every other
example in the global batch is a negative, free.

Pipeline fit: the ITEM tower exports a corpus exactly like PinSage's
reprs, so the whole serving stack applies unchanged
(``retrieval/export.py`` bundles, int8 quantization, ``cli/serve``,
seen-exclusion ``recommend_topk`` — the user tower produces the query
vectors). Training scales with GSPMD data parallelism: the logits matmul
over batch-sharded towers makes XLA all-gather the item-side reprs, i.e.
cross-device in-batch negatives come from the GLOBAL batch for free.

Loss: softmax cross-entropy on the [B, B] similarity matrix with the
diagonal as labels, temperature-scaled; returns the per-example CE
vector (Trainer means it — repo convention). A duplicate item appearing
twice in a batch is a standard false negative of this loss family; at
recommendation-scale vocabularies and batch ≤8k the collision rate is
negligible (documented, not corrected — logQ correction is a sampling-
bias fix for non-uniform samplers, out of scope for uniform streams).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommender_tpu.embedding.table import Embedding
from recommender_tpu.nn.mlp import MLP


class TwoTower(nn.Module):
    user_vocab: int
    item_vocab: int
    cat_vocab: int = 0  # 0 = no item category feature
    embed_dim: int = 32
    repr_dim: int = 32
    tower_units: Sequence[int] = (64,)
    temperature: float = 0.05
    partition: Optional[str] = None
    lookup_mode: str = "gspmd"
    mesh: Optional[object] = None
    embed_param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(partition=self.partition, lookup_mode=self.lookup_mode,
                  mesh=self.mesh, param_dtype=self.embed_param_dtype)
        self.user_embedding = Embedding(self.user_vocab, self.embed_dim, **kw)
        self.item_embedding = Embedding(self.item_vocab, self.embed_dim, **kw)
        if self.cat_vocab:
            self.cat_embedding = Embedding(self.cat_vocab, self.embed_dim, **kw)
        self.user_tower = MLP((*self.tower_units, self.repr_dim))
        self.item_tower = MLP((*self.tower_units, self.repr_dim))

    def user_repr(self, user_id: jnp.ndarray) -> jnp.ndarray:
        """[B] user ids → [B, repr_dim], L2-normalized (cosine scoring —
        the bounded-logit convention of the dual-encoder family)."""
        x = self.user_embedding(user_id).astype(jnp.float32)
        r = self.user_tower(x)
        return r / jnp.linalg.norm(r, axis=-1, keepdims=True).clip(1e-6)

    def item_repr(self, item_id: jnp.ndarray,
                  item_cat: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = self.item_embedding(item_id).astype(jnp.float32)
        if self.cat_vocab:
            assert item_cat is not None, "model built with cat_vocab"
            x = jnp.concatenate(
                [x, self.cat_embedding(item_cat).astype(jnp.float32)], axis=-1
            )
        r = self.item_tower(x)
        return r / jnp.linalg.norm(r, axis=-1, keepdims=True).clip(1e-6)

    def __call__(self, batch: dict, *, train: bool = False):
        u = self.user_repr(batch["user_id"])
        v = self.item_repr(batch["item_id"], batch.get("item_cat"))
        return u, v


def make_two_tower_task(model: TwoTower):
    """(loss_fn, eval_fn) for the Trainer: in-batch softmax CE.

    eval_fn returns (diagonal-is-top1 indicator, ones) — an in-batch
    retrieval accuracy proxy for train-time monitoring; certified quality
    uses the full-corpus hit-rate protocol (retrieval/eval.py) offline."""

    from recommender_tpu.models.tasks import _apply, _pop_diagnostics

    def loss_fn(params, model_state, batch, rng, train):
        (u, v), new_ms = _apply(model, params, model_state, batch, train)
        logits = (u @ v.T) / model.temperature  # [B, B]
        labels = jnp.arange(u.shape[0])
        per_ex = -jax.nn.log_softmax(logits, axis=-1)[labels, labels]
        top1 = jnp.mean((jnp.argmax(logits, axis=-1) == labels))
        aux = {"inbatch_top1": top1}
        new_ms, aux = _pop_diagnostics(new_ms, aux)
        return per_ex, aux, new_ms

    def eval_fn(params, model_state, batch):
        (u, v), _ = _apply(model, params, model_state, batch, False)
        logits = (u @ v.T) / model.temperature
        labels = jnp.arange(u.shape[0])
        hit = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        return hit, jnp.ones_like(hit)

    return loss_fn, eval_fn


def interaction_batches(graph, batch_size: int, seed: int = 0,
                        item_cat=None):
    """Infinite iid stream of (user_id, item_id[, item_cat]) training
    pairs sampled uniformly over a ``BipartiteGraph``'s edges — the
    two-tower input contract (fixed-shape batches, repo convention)."""
    import numpy as np

    users = np.repeat(
        np.arange(graph.num_users, dtype=np.int32),
        np.diff(graph.u2i_indptr),
    )
    items = graph.u2i_indices.astype(np.int32)
    cats = None if item_cat is None else np.asarray(item_cat, np.int32)
    rng = np.random.default_rng(seed)
    n = len(items)
    while True:
        sel = rng.integers(0, n, batch_size)
        batch = {"user_id": users[sel], "item_id": items[sel]}
        if cats is not None:
            batch["item_cat"] = cats[items[sel]]
        yield batch


def corpus_item_reprs(model: TwoTower, params, num_items: int,
                      item_cat=None, batch_size: int = 8192):
    """[V, repr_dim] item-tower corpus — the serving export input
    (``export_serving_bundle``); computed in jitted batches."""
    import numpy as np

    @jax.jit
    def reprs(ids, cats):
        kw = {} if cats is None else {"item_cat": cats}
        return model.apply({"params": params}, ids, method=model.item_repr,
                           **kw)

    out = []
    for s in range(0, num_items, batch_size):
        ids = np.arange(s, min(s + batch_size, num_items), dtype=np.int32)
        pad = batch_size - len(ids)
        ids_p = np.concatenate([ids, np.zeros(pad, np.int32)]) if pad else ids
        cats = None if item_cat is None else jnp.asarray(
            np.asarray(item_cat)[ids_p])
        r = np.asarray(reprs(jnp.asarray(ids_p), cats))
        out.append(r[: len(ids)])
    return np.concatenate(out, axis=0)
