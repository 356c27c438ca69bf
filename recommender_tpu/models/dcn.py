"""DCNv2 — cross network ∥ deep tower over the shared Criteo embedding.

Beyond-reference model (the reference's CTR zoo stops at DeepFM + DLRM;
DCNv2 is the third standard interaction family). Same pipeline contract
as ``deepfm.py``/``dlrm.py``: one shared table for the 26 categorical
features (``ctr/model.py:6-31`` shape conventions), 13 log-transformed
dense ints, ``batch['label']`` CTR task — so every existing knob
(``partition``/``lookup_mode``/``embed_param_dtype`` + stochastic
rounding, dedup plans, the planner) applies unchanged, and
``cli/train_ctr --model_type DCN`` trains it on the same shards.

Structure (Wang et al. 2021, the "parallel" variant):
x0 = [flat embeddings ∥ ints] → CrossNetwork(x0) ∥ MLP(x0) → concat →
Dense(1) → sigmoid.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommender_tpu.embedding.table import Embedding
from recommender_tpu.nn.cross import CrossNetwork
from recommender_tpu.nn.mlp import MLP


class DCN(nn.Module):
    vocab_size: int
    embed_dim: int = 16
    num_int: int = 13
    num_cat: int = 26
    cross_layers: int = 3
    deep_units: Sequence[int] = (512, 256)
    partition: Optional[str] = None

    lookup_mode: str = "gspmd"
    mesh: Optional[object] = None
    capacity_factor: float = 2.0
    embed_compute_dtype: Optional[jnp.dtype] = None
    embed_param_dtype: jnp.dtype = jnp.float32  # bf16+SR: see deepfm.py note

    def setup(self):
        self.embedding = Embedding(
            self.vocab_size, self.embed_dim, partition=self.partition,
            lookup_mode=self.lookup_mode, mesh=self.mesh,
            capacity_factor=self.capacity_factor,
            compute_dtype=self.embed_compute_dtype,
            param_dtype=self.embed_param_dtype,
        )
        self.cross = CrossNetwork(self.cross_layers)
        self.deep = MLP(self.deep_units, final_activation=nn.relu)
        self.head = nn.Dense(1)

    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        ints = batch["int_features"].reshape(-1, self.num_int)
        cats = batch["cat_features"].reshape(-1, self.num_cat)
        emb = self.embedding(cats, dedup_plan=batch.get("cat_dedup"))
        x0 = jnp.concatenate(
            [emb.reshape(emb.shape[0], -1).astype(jnp.float32), ints], axis=1
        )
        out = jnp.concatenate(
            [self.cross(x0), self.deep(x0, train=train)], axis=1
        )
        return nn.sigmoid(jnp.squeeze(self.head(out), axis=-1))
