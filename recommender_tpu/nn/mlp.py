"""Dense towers.

Covers the reference's four per-subproject ``MLP`` layers
(``ctr/layers.py:5-14``, ``dien/layers.py:20-31`` (with input BatchNorm),
``esmm/layers.py:4-13``) as one configurable module.

TPU notes: hidden matmuls run in bf16 on the MXU (params kept in f32,
outputs accumulated in f32 via ``preferred_element_type``-equivalent dtype
promotion inside flax Dense); widths should be multiples of 128 where the
caller can choose them freely.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """Stack of Dense layers.

    ``units[:-1]`` use ``activation``; the last layer uses
    ``final_activation`` (None = linear). ``input_batch_norm`` reproduces
    ``dien/layers.py:22`` (BatchNorm applied to the input before any Dense).
    """

    units: Sequence[int]
    activation: Callable = nn.relu
    final_activation: Optional[Callable] = None
    input_batch_norm: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        orig_dtype = x.dtype
        if self.input_batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = x.astype(self.compute_dtype)
        for i, unit in enumerate(self.units):
            x = nn.Dense(unit, dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
            if i < len(self.units) - 1:
                x = self.activation(x)
            elif self.final_activation is not None:
                # final activation in f32 for numerically clean sigmoids
                x = self.final_activation(x.astype(jnp.float32))
        return x.astype(jnp.float32) if x.dtype != orig_dtype else x
