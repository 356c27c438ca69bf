"""DLRM — dense-bottom MLP + sharded embeddings + dot interaction + top MLP.

Behavioral parity with ``/root/reference/ctr/model.py:34-58``:
* single shared embedding table over all 26 categorical features;
* bottom MLP on the 13 dense ints, its output treated as a 27th embedding
  (``ctr/model.py:51-52``);
* DotInteraction(self_interaction=False, skip_gather=True) → dense
  ``(26+1)^2`` output (``ctr/model.py:55`` top-MLP width contract);
* top MLP on [interaction ∥ bottom-MLP output] → sigmoid prob.

Deliberate divergence (documented per SURVEY.md §7): the reference's
``ctr/layers.py:5-14`` MLP has **linear** hidden layers (keras Dense default);
we use ReLU hidden activations as in the DLRM paper — strictly more
expressive, parity target is AUC, not bug-for-bug math.

TPU notes: the embedding table may be row-sharded over the ``model`` mesh
axis (``partition='model'``); interaction + MLPs are bf16 on the MXU.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommender_tpu.embedding.table import Embedding
from recommender_tpu.nn.interactions import DotInteraction
from recommender_tpu.nn.mlp import MLP


class DLRM(nn.Module):
    vocab_size: int
    embed_dim: int = 16
    num_int: int = 13
    num_cat: int = 26
    bottom_units: Sequence[int] = (512, 256, 64, 16)
    top_units: Sequence[int] = (512, 256, 1)
    partition: Optional[str] = None  # 'model' → row-sharded table
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
        self.bottom_mlp = MLP(self.bottom_units, final_activation=nn.relu)
        self.top_mlp = MLP(self.top_units, final_activation=nn.sigmoid)
        self.interaction = DotInteraction(self_interaction=False, skip_gather=True)

    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        ints = batch["int_features"].reshape(-1, self.num_int)
        cats = batch["cat_features"].reshape(-1, self.num_cat)
        # Optional host-precomputed dedup plan for the id stream (attached
        # by data.pipeline.with_dedup_plans; see embedding.table.Embedding).
        cat_emb = self.embedding(cats, dedup_plan=batch.get("cat_dedup"))  # [B, 26, D]
        bottom = self.bottom_mlp(ints, train=train)  # [B, D]
        feats = jnp.concatenate([cat_emb, bottom[:, None, :]], axis=1)  # [B, 27, D]
        inter = self.interaction(feats)  # [B, 27*27]
        top_in = jnp.concatenate([inter, bottom], axis=1)
        prob = self.top_mlp(top_in, train=train)
        return jnp.squeeze(prob, axis=-1)
