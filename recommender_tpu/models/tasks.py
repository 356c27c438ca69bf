"""Task wrappers: bind a model to the Trainer's (loss_fn, eval_fn) protocol.

The reference repeats this glue in every subproject's train script; here it
is written once per task *shape* (binary CTR, CTR+aux-loss, multi-task).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommender_tpu.nn.losses import binary_cross_entropy

MUTABLE = ("batch_stats",)


def init_model(model: nn.Module, example_batch: dict, seed: int = 0):
    """Initialize params (+ mutable collections). Returns boxed variables."""
    variables = model.init(jax.random.PRNGKey(seed), example_batch)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    return params, model_state


def _apply(model, params, model_state, batch, train):
    variables = {"params": params, **model_state}
    if train and model_state:
        out, updates = model.apply(
            variables, batch, train=True, mutable=list(model_state.keys())
        )
        return out, updates
    out = model.apply(variables, batch, train=train)
    return out, model_state


def make_ctr_task(model: nn.Module) -> tuple[Callable, Callable]:
    """Binary CTR on ``batch['label']`` with model(batch) → prob [B]."""

    def loss_fn(params, model_state, batch, rng, train):
        prob, new_ms = _apply(model, params, model_state, batch, train)
        per_ex = binary_cross_entropy(prob, batch["label"])
        aux = {"prob_mean": jnp.mean(prob)}
        return per_ex, aux, new_ms

    def eval_fn(params, model_state, batch):
        prob, _ = _apply(model, params, model_state, batch, False)
        return prob, batch["label"]

    return loss_fn, eval_fn


def make_aux_loss_task(model: nn.Module, aux_weight: float = 1.0):
    """CTR where model returns (prob, per-example aux loss) — DIEN."""

    def loss_fn(params, model_state, batch, rng, train):
        (prob, aux_loss), new_ms = _apply(model, params, model_state, batch, train)
        per_ex = binary_cross_entropy(prob, batch["label"]) + aux_weight * aux_loss
        return per_ex, {"aux_loss": jnp.mean(aux_loss)}, new_ms

    def eval_fn(params, model_state, batch):
        (prob, _), _ = _apply(model, params, model_state, batch, False)
        return prob, batch["label"]

    return loss_fn, eval_fn
