"""DeepFM — FM second-order cross + deep tower over a shared embedding.

Behavioral parity with ``/root/reference/ctr/model.py:6-31``:
* one shared table for all categorical features;
* FM 2nd-order term via the sum-square/square-sum identity
  (``ctr/model.py:21-23``; no 1st-order linear term, as in the reference);
* deep tower on [flattened embeddings ∥ 13 dense ints];
* output = sigmoid(fm + deep).

Hidden activations are ReLU (see divergence note in ``dlrm.py``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommender_tpu.embedding.table import Embedding
from recommender_tpu.nn.interactions import fm_cross
from recommender_tpu.nn.mlp import MLP


class DeepFM(nn.Module):
    vocab_size: int
    embed_dim: int = 16
    num_int: int = 13
    num_cat: int = 26
    mlp_units: Sequence[int] = (512, 256, 1)
    partition: Optional[str] = None

    lookup_mode: str = "gspmd"  # 'a2a' = explicit all-to-all exchange (needs mesh)
    mesh: Optional[object] = None
    capacity_factor: float = 2.0  # a2a bucket size; see Embedding.capacity_factor
    embed_compute_dtype: Optional[jnp.dtype] = None  # see Embedding.compute_dtype
    # Storage dtype of the table param itself. bf16 is a measured ~20% step
    # win at DLRM scale on v5e (8.89 -> 7.30 ms b8192: half-byte scatter
    # backward + half-byte Adam table update, no cast traffic) and is
    # QUALITY-NEUTRAL: the Trainer auto-enables stochastic rounding for
    # low-precision params (core/optim.py adam_sr + SR param writes), which
    # puts the 300-step fingerprint inside f32's own init-seed noise band
    # (0.726-0.744; plain round-to-nearest dropped it to 0.700) and the
    # 3k-step AUC is equal. bench.py runs this config; f32 stays the
    # default for bit-parity with the reference's replicated f32 tables
    # (benchmarks/exp_bf16_sr.py, exp_bf16_sr2.py, RESULTS.md).
    embed_param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = Embedding(
            self.vocab_size, self.embed_dim, partition=self.partition,
            lookup_mode=self.lookup_mode, mesh=self.mesh,
            capacity_factor=self.capacity_factor,
            compute_dtype=self.embed_compute_dtype,
            param_dtype=self.embed_param_dtype,
        )
        self.mlp = MLP(self.mlp_units, final_activation=None)

    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        ints = batch["int_features"].reshape(-1, self.num_int)
        cats = batch["cat_features"].reshape(-1, self.num_cat)
        # Optional host-precomputed dedup plan (data.pipeline.with_dedup_plans).
        emb = self.embedding(cats, dedup_plan=batch.get("cat_dedup"))  # [B, F, D]
        fm = fm_cross(emb)  # [B]
        deep_in = jnp.concatenate(
            [emb.reshape(emb.shape[0], -1), ints], axis=1
        )
        deep = jnp.squeeze(self.mlp(deep_in, train=train), axis=-1)  # [B]
        return nn.sigmoid(fm + deep)
