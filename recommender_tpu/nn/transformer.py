"""Post-LN transformer encoder block for behavior sequences (BST).

No reference counterpart (the reference's sequence zoo stops at DIEN);
added because self-attention is the standard modern alternative to the
AUGRU recurrence and it is a strictly better TPU fit: the whole block is
batched matmuls (MXU) with NO sequential scan — one fused attention over
[B, L, D] instead of T dependent steps. Masking contract matches the
rest of the sequence stack: pad positions (id 0) are excluded as KEYS via
the attention mask; their own outputs are dropped by the caller's masked
pooling (they attend freely — garbage-in positions whose outputs are
never read).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TransformerBlock(nn.Module):
    """MHSA + FFN, each with residual + LayerNorm (post-LN, BST-style)."""

    dim: int
    num_heads: int = 2
    ffn_mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """x: [B, L, D]; mask: broadcastable to [B, heads, L, L], True =
        may attend."""
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim
        )(x, x, mask=mask)
        x = nn.LayerNorm()(x + a)
        f = nn.Dense(self.dim * self.ffn_mult)(x)
        f = nn.relu(f)
        f = nn.Dense(self.dim)(f)
        return nn.LayerNorm()(x + f)
