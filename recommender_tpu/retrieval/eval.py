"""Retrieval: full-corpus inference, top-k recommendation, hit-rate.

Replaces ``/root/reference/pinsage/train/evaluation.py`` (numpy argpartition
on host) and the Spark map-reduce serving path (``pinsage/inference/*``,
which never even loads trained weights — ``inference.py:57-64``) with
on-chip batched matmul + ``lax.top_k`` under jit; shard the corpus matmul
over the data axis for multi-chip serving.

* ``full_corpus_reprs``  — every item id through sampled blocks → reprs
  (``evaluation.py:6-24``).
* ``recommend_topk``     — each user's latest item repr vs all items,
  seen-item masking with -inf, top-k (``evaluation.py:27-51``; exact
  ``lax.top_k`` instead of unordered ``argpartition``).
* ``hit_rate``           — any-hit mean over users (``evaluation.py:54-65``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def full_corpus_reprs(
    model, params, graph, rng: np.random.Generator, batch_size: int = 512, **sampler_kw
) -> np.ndarray:
    """Compute reprs for every item (PinSage: fresh sampled blocks per batch)."""
    from recommender_tpu.graph.bipartite import sample_block_batch

    @jax.jit
    def reprs(block):
        return model.apply({"params": params}, block, method=model.get_repr)

    out = []
    n = graph.num_items
    for s in range(0, n, batch_size):
        ids = np.arange(s, min(s + batch_size, n), dtype=np.int32)
        pad = batch_size - len(ids)
        if pad:
            ids = np.concatenate([ids, np.zeros(pad, np.int32)])
        block = sample_block_batch(graph, ids, rng, **sampler_kw).as_dict()
        r = np.asarray(reprs({k: jnp.asarray(v) for k, v in block.items()}))
        out.append(r[: batch_size - pad])
    return np.concatenate(out, axis=0)


@partial(jax.jit, static_argnames=("k",))
def _topk_scores(query_reprs, item_reprs, seen_mask, k: int):
    sim = jnp.matmul(query_reprs, item_reprs.T)  # [U, V]
    sim = jnp.where(seen_mask, -jnp.inf, sim)
    _, idx = jax.lax.top_k(sim, k)
    return idx


def recommend_topk(
    item_reprs: np.ndarray,
    latest_items: np.ndarray,
    seen: "np.ndarray | object",
    k: int = 10,
    batch_size: int = 1024,
) -> np.ndarray:
    """[U] users' latest item ids → [U, k] recommended items.

    ``seen``: [U, V] bool (dense or scipy sparse) — items already interacted,
    excluded from recommendations."""
    item_reprs = jnp.asarray(item_reprs)
    out = []
    U = len(latest_items)
    for s in range(0, U, batch_size):
        users = slice(s, min(s + batch_size, U))
        q = item_reprs[jnp.asarray(latest_items[users])]
        seen_block = seen[users]
        if hasattr(seen_block, "toarray"):
            seen_block = seen_block.toarray()
        idx = _topk_scores(q, item_reprs, jnp.asarray(seen_block, bool), k)
        out.append(np.asarray(idx))
    return np.concatenate(out, axis=0)


def hit_rate(recommendations: np.ndarray, ground_truth) -> float:
    """[U, k] recs vs [U, V] 0/1 ground truth → mean any-hit."""
    U, K = recommendations.shape
    user_idx = np.repeat(np.arange(U), K)
    item_idx = recommendations.reshape(-1)
    rel = np.asarray(ground_truth[user_idx, item_idx]).reshape(U, K)
    return float(rel.any(axis=1).mean())
