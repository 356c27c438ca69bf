"""BST — Behavior Sequence Transformer over the DIEN batch schema.

Beyond-reference model (Chen et al. 2019, Alibaba; the reference's
sequence zoo stops at DIEN): self-attention with learned positions over
[history ∥ target], the modern replacement for the GRU/AUGRU recurrence.
Drops into the existing family unchanged — same shared item/cat tables
and batch schema as BASE/DIN/DIEN (``dien/data_loader.py:35-63``:
target_item/cat, pos_his_item/cat padded with 0, label), same
``partition``/``lookup_mode``/``embed_param_dtype`` knobs via
``SequenceBase``, trained by ``cli/train_dien --model_type BST``.

TPU angle: the whole forward is batched MXU matmuls — no ``lax.scan`` at
all — so unlike DIEN there is no sequential dependency to unroll or
remat; T=100 costs one [B, 101, 101] attention instead of 100 dependent
GRU steps.

Readout divergence from the paper (documented): the paper flattens every
position into the final MLP; with variable-length zero-padded histories
that feeds pad positions to the head, so instead the head gets
[target-position output ∥ masked mean of history outputs] — the same
fixed-shape, pad-robust readout contract as the rest of the family
(``SequenceBase.head``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from recommender_tpu.models.dien import SequenceBase
from recommender_tpu.nn.sequence import masked_mean_pool
from recommender_tpu.nn.transformer import TransformerBlock


class BST(SequenceBase):
    # 2 blocks / 4 heads is the measured floor that passes BOTH mechanism
    # ladders: 1 block saturates the drift (order) regime but is STUCK at
    # 0.63 AUC on fine-grained membership (50 distractor categories) and
    # degrades with more steps, while 2 blocks hit 1.0 by 3k steps —
    # probe sweep in logs/bst_membership_probe_r5.log
    num_heads: int = 4
    num_blocks: int = 2
    ffn_mult: int = 4
    max_len: int = 512  # position table size; histories up to max_len-1

    def setup(self):
        super().setup()
        dim = self.item_dim + self.cat_dim
        self.blocks = [
            TransformerBlock(dim=dim, num_heads=self.num_heads,
                             ffn_mult=self.ffn_mult, name=f"block_{i}")
            for i in range(self.num_blocks)
        ]
        self.positions = nn.Embed(self.max_len, dim, name="positions")

    def __call__(self, batch: dict, *, train: bool = False) -> jnp.ndarray:
        mask = (batch["pos_his_item"] != 0).astype(jnp.float32)  # [B, T]
        target, his = self.embed_sets(
            [batch["target_item"], batch["pos_his_item"]],
            [batch["target_cat"], batch["pos_his_cat"]],
        )  # [B, D], [B, T, D]
        B, T = mask.shape
        # sequence = history steps 0..T-1, target at position T
        seq = jnp.concatenate([his, target[:, None, :]], axis=1)  # [B, T+1, D]
        valid = jnp.concatenate(
            [mask, jnp.ones((B, 1), jnp.float32)], axis=1)  # [B, T+1]
        x = seq + self.positions(jnp.arange(T + 1))[None]
        # keys masked to valid positions; pad QUERIES produce garbage that
        # the masked readout never reads (nn/transformer.py contract —
        # the block picks plain vs flash attention by L)
        for blk in self.blocks:
            x = blk(x, valid)
        h_target = x[:, -1]
        pooled = masked_mean_pool(x[:, :-1], mask)
        return self.head(h_target, pooled, train)
