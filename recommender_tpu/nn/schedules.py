"""Learning-rate schedules (optax-compatible callables).

``dlrm_warmup_cosine`` reproduces ``ctr/util.py:7-37`` (linear warmup to
``init_lr`` over ``warmup_steps``, then cosine decay over ``decay_steps``
to ``alpha * init_lr``, constant afterwards).
"""
from __future__ import annotations

import jax.numpy as jnp


def dlrm_warmup_cosine(
    init_lr: float, warmup_steps: int, decay_steps: int, alpha: float
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1) * init_lr
        capped = jnp.minimum(step, warmup_steps + decay_steps)
        frac = (capped - warmup_steps) / decay_steps
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        decayed = init_lr * ((1.0 - alpha) * cos + alpha)
        return jnp.where(step <= warmup_steps, warm, decayed)

    return schedule
