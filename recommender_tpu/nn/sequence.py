"""Behavior-sequence layers: masked pooling, DIN attention, DIEN attention.

Parity targets (behavioral, not structural):
* ``masked_mean_pool``      — ``dien/layers.py:5-17``  (pad-aware average).
* ``LocalActivationUnit``   — ``dien/layers.py:34-59`` (DIN: target⊕hist⊕diff⊕
  prod → sigmoid MLP 80→40→1 weights, mask-multiplied, *non-normalized*
  weighted sum of history).
* ``AuxiliaryNet``          — ``dien/layers.py:62-73`` (sigmoid 80→40→1 head).
* ``DIENAttention``         — ``dien/layers.py:136-158`` (bilinear h·W·target,
  additive -1e9 mask, softmax over time).

All layers take an explicit ``mask`` [B, T] (True = real step), computed
upstream from ``item_id != 0`` (the analogue of keras ``mask_zero=True``,
``dien/model.py:11-12``). Everything is batched matmul / VPU elementwise —
no per-step host loops.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def masked_mean_pool(his: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, T, D], [B, T] → [B, D]: average over real (unmasked) steps."""
    m = mask.astype(his.dtype)[..., None]  # [B, T, 1]
    s = jnp.sum(his * m, axis=1)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return s / n


class AuxiliaryNet(nn.Module):
    """Sigmoid-activated MLP head producing one logit per step."""

    units: Sequence[int] = (80, 40, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for u in self.units[:-1]:
            x = nn.sigmoid(nn.Dense(u)(x))
        x = nn.Dense(self.units[-1])(x)
        return jnp.squeeze(x, axis=-1)


class LocalActivationUnit(nn.Module):
    """DIN attention: returns the weighted history representation [B, D].

    Weights are raw MLP outputs (not softmaxed) zeroed at padded steps —
    the reference deliberately skips normalization (DIN paper §) and so do we.
    """

    hidden: Sequence[int] = (80, 40)

    @nn.compact
    def __call__(
        self, target: jnp.ndarray, history: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        # target [B, D] (or [B, 1, D]), history [B, T, D], mask [B, T]
        if target.ndim == 2:
            target = target[:, None, :]
        t = jnp.broadcast_to(target, history.shape)
        x = jnp.concatenate([t, history, t - history, t * history], axis=-1)
        for u in self.hidden:
            x = nn.sigmoid(nn.Dense(u)(x))
        w = nn.Dense(1)(x)  # [B, T, 1]
        w = w * mask.astype(w.dtype)[..., None]
        return jnp.einsum("btd,bto->bd", history, w)


class DIENAttention(nn.Module):
    """Bilinear attention scores softmaxed over time. Returns [B, T, 1]."""

    @nn.compact
    def __call__(
        self, target: jnp.ndarray, hidden: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        # target [B, D_t] or [B, 1, D_t]; hidden [B, T, H]; mask [B, T]
        if target.ndim == 3:
            target = jnp.squeeze(target, axis=1)
        d_t = target.shape[-1]
        h = hidden.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (h, d_t))
        trans = jnp.einsum("bth,hd->btd", hidden, kernel)
        score = jnp.einsum("btd,bd->bt", trans, target)
        score = score + (1.0 - mask.astype(score.dtype)) * -1e9
        score = nn.softmax(score, axis=1)
        return score[..., None]
