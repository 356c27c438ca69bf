"""Recurrent sequence layers as ``lax.scan`` — GRU and attention-gated AUGRU.

TPU-native re-design of the reference's two hot sequential loops
(``dien/distribute_train.py`` call stack, SURVEY.md §3.2):

* ``GRU``    — ``keras.layers.GRU(return_sequences=True)`` used by
  InterestExtract (``dien/layers.py:76-133``). Gates are fused into one
  [D+H, 3H] matmul per step so each scan iteration is a single MXU call.
* ``AUGRU``  — the attention-gated GRU cell (``dien/layers.py:161-188``):
  the update gate is scaled by the per-step attention score before the
  convex combination. The reference smuggles the score through the last
  input column to fit the keras RNN API (``dien/layers.py:179-180``); here
  the scan carries ``(x_t, a_t)`` tuples directly — no hack needed.

Masking matches ``keras.layers.RNN(mask=...)`` semantics: masked steps carry
the previous state through unchanged (``dien/layers.py:131,203``).

Everything is time-major inside the scan ([T, B, ...]) for friendly XLA
layout; the public API is batch-major [B, T, ...].
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gru_step(h, x, w_gates, b_gates, w_cand, b_cand):
    """One GRU step. h [B,H], x [B,D] → new h.

    z = sigma(W_z [h,x]), r = sigma(W_r [h,x]),
    c = tanh(W_c [x, r*h]), h' = (1-z)*h + z*c.
    """
    hidden = h.shape[-1]
    zr = jnp.dot(jnp.concatenate([h, x], axis=-1), w_gates) + b_gates
    z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
    c = jnp.tanh(jnp.dot(jnp.concatenate([x, r * h], axis=-1), w_cand) + b_cand)
    return (1.0 - z) * h + z * c


class GRU(nn.Module):
    """Masked GRU over [B, T, D]; returns all hidden states [B, T, H].

    ``remat=True`` rematerializes each scan step on the backward pass
    (``jax.checkpoint``), trading ~1 extra forward of FLOPs for O(T) →
    O(1) activation memory per step — the long-sequence growth path.

    ``unroll`` replicates the step body inside the scan loop: at DIEN scale
    (B=128, H=36) each step is a single tiny MXU call and the loop is
    bound by per-iteration overhead, so unrolling several steps per
    iteration is nearly free FLOPs-wise and cuts the scan wall-clock."""

    hidden: int
    remat: bool = False
    unroll: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.hidden
        w_gates = self.param("w_gates", nn.initializers.lecun_normal(), (h + d, 2 * h))
        b_gates = self.param("b_gates", nn.initializers.zeros, (2 * h,))
        w_cand = self.param("w_cand", nn.initializers.lecun_normal(), (h + d, h))
        b_cand = self.param("b_cand", nn.initializers.zeros, (h,))

        xs = jnp.swapaxes(x, 0, 1)  # [T, B, D]
        ms = jnp.swapaxes(mask.astype(x.dtype), 0, 1)[..., None]  # [T, B, 1]

        def step(carry, inp):
            xt, mt = inp
            new = _gru_step(carry, xt, w_gates, b_gates, w_cand, b_cand)
            carry = mt * new + (1.0 - mt) * carry
            return carry, carry

        if self.remat:
            step = jax.checkpoint(step)
        h0 = jnp.zeros((b, h), x.dtype)
        _, hs = jax.lax.scan(step, h0, (xs, ms), unroll=self.unroll)
        return jnp.swapaxes(hs, 0, 1)  # [B, T, H]


class AUGRU(nn.Module):
    """Attention-gated GRU; consumes hidden states + scores, returns final state.

    ``x``: [B, T, D] (interest-extractor hidden states),
    ``att``: [B, T, 1] (DIENAttention softmax scores),
    ``mask``: [B, T]. Returns [B, H].
    """

    hidden: int
    remat: bool = False
    unroll: int = 8  # see GRU.unroll

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, att: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.hidden
        w_gates = self.param("w_gates", nn.initializers.lecun_normal(), (h + d, 2 * h))
        b_gates = self.param("b_gates", nn.initializers.zeros, (2 * h,))
        w_cand = self.param("w_cand", nn.initializers.lecun_normal(), (h + d, h))
        b_cand = self.param("b_cand", nn.initializers.zeros, (h,))

        xs = jnp.swapaxes(x, 0, 1)  # [T, B, D]
        as_ = jnp.swapaxes(att, 0, 1)  # [T, B, 1]
        ms = jnp.swapaxes(mask.astype(x.dtype), 0, 1)[..., None]  # [T, B, 1]

        def step(carry, inp):
            xt, at, mt = inp
            zr = jnp.dot(jnp.concatenate([carry, xt], axis=-1), w_gates) + b_gates
            z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
            c = jnp.tanh(
                jnp.dot(jnp.concatenate([xt, r * carry], axis=-1), w_cand) + b_cand
            )
            za = z * at  # attention-scaled update gate (AUGRU)
            new = za * c + (1.0 - za) * carry
            carry = mt * new + (1.0 - mt) * carry
            return carry, None

        if self.remat:
            step = jax.checkpoint(step)
        h0 = jnp.zeros((b, h), x.dtype)
        final, _ = jax.lax.scan(step, h0, (xs, as_, ms), unroll=self.unroll)
        return final
