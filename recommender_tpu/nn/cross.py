"""DCNv2 cross network — explicit bounded-degree feature crosses.

No reference counterpart (the reference's CTR zoo is DeepFM + DLRM);
added because the cross network is the third standard CTR interaction
family and it drops into the existing shared-embedding pipeline
unchanged. Wang et al. 2021 ("DCN V2"), full-rank W form:

    x_{l+1} = x_0 ⊙ (W_l x_l + b_l) + x_l

Each layer multiplies the ORIGINAL input element-wise against a dense
projection of the current state, so layer l represents all crosses up to
degree l+1 with d² parameters — one [d, d] MXU matmul per layer, no
dynamic shapes, nothing to special-case for TPU.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class CrossNetwork(nn.Module):
    """Stack of DCNv2 cross layers over a fixed-width input [B, d]."""

    num_layers: int = 3

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        x = x0
        for i in range(self.num_layers):
            # Dense = W_l x + b_l; the residual keeps lower-degree crosses
            x = x0 * nn.Dense(x0.shape[-1], name=f"cross_{i}")(x) + x
        return x
