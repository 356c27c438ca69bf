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
    """Apply with mutable collections during training. The transient
    "diagnostics" collection (e.g. the a2a overflow counter sown by
    ``embedding.table.Embedding``) is always mutable at train time so sown
    scalars surface; callers split it off with ``_pop_diagnostics`` — it
    must NOT persist into ``TrainState.model_state``."""
    variables = {"params": params, **model_state}
    if train:
        out, updates = model.apply(
            variables, batch, train=True,
            mutable=list(model_state.keys()) + ["diagnostics"],
        )
        return out, updates
    out = model.apply(variables, batch, train=train)
    return out, model_state


def _pop_diagnostics(new_ms, aux):
    """Move sown diagnostics out of the mutable-collection tree into the
    step's metrics dict (flattened to scalar entries)."""
    if not isinstance(new_ms, dict) or "diagnostics" not in new_ms:
        return new_ms, aux
    new_ms = dict(new_ms)
    diag = new_ms.pop("diagnostics")
    flat = jax.tree_util.tree_leaves_with_path(diag)
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        # several tables sow under the same trailing name — sum them
        aux[name] = aux[name] + leaf if name in aux else leaf
    return new_ms, aux


def make_ctr_task(model: nn.Module) -> tuple[Callable, Callable]:
    """Binary CTR on ``batch['label']`` with model(batch) → prob [B]."""

    def loss_fn(params, model_state, batch, rng, train):
        prob, new_ms = _apply(model, params, model_state, batch, train)
        per_ex = binary_cross_entropy(prob, batch["label"])
        aux = {"prob_mean": jnp.mean(prob)}
        new_ms, aux = _pop_diagnostics(new_ms, aux)
        return per_ex, aux, new_ms

    def eval_fn(params, model_state, batch):
        prob, _ = _apply(model, params, model_state, batch, False)
        return prob, batch["label"]

    return loss_fn, eval_fn


def make_multitask_task(model: nn.Module):
    """ESMM/MMOE joint training: mean of BCE(ctr head, click) and
    BCE(ctcvr head, purchase) — keras ``binary_crossentropy`` on the 2-dim
    label averages the two heads (``esmm/train.py:100-103``)."""

    def loss_fn(params, model_state, batch, rng, train):
        heads, new_ms = _apply(model, params, model_state, batch, train)
        l_ctr = binary_cross_entropy(heads["ctr"], batch["click"])
        l_ctcvr = binary_cross_entropy(heads["ctcvr"], batch["purchase"])
        per_ex = 0.5 * (l_ctr + l_ctcvr)
        aux = {"ctr_loss": jnp.mean(l_ctr), "ctcvr_loss": jnp.mean(l_ctcvr)}
        new_ms, aux = _pop_diagnostics(new_ms, aux)
        return per_ex, aux, new_ms

    def eval_fn(params, model_state, batch):
        heads, _ = _apply(model, params, model_state, batch, False)
        return heads["ctcvr"], batch["purchase"]

    return loss_fn, eval_fn


def make_head_eval(model: nn.Module, head: str, label_key: str):
    """Eval fn scoring one named head of a dict-output model against a label —
    the ESMM protocol's CVR-on-clicks / CTCVR-on-impressions evals
    (``esmm/train.py:114-127``)."""

    def eval_fn(params, model_state, batch):
        heads, _ = _apply(model, params, model_state, batch, False)
        return heads[head], batch[label_key]

    return eval_fn


def evaluate_head(trainer, state, batches, head_eval_fn, exact: bool = False):
    """Run a one-off AUC eval with a custom (scores, labels) fn.

    ``exact=True`` gathers scores/labels for the sort-based exact AUC —
    use for certified final numbers (histogram error ≲2e-3, same order as
    the deltas being certified); the streaming histogram stays the cheap
    in-loop default."""
    import jax as _jax
    import numpy as np

    from recommender_tpu.core.metrics import AUCState, auc_from_state, auc_update

    @_jax.jit
    def step(params, model_state, batch, auc):
        scores, labels = head_eval_fn(params, model_state, batch)
        return auc_update(auc, scores, labels), scores, labels

    auc = AUCState.init()
    all_s, all_l = [], []
    for batch in batches:
        auc, scores, labels = step(
            state.params, state.model_state, trainer.put_batch(batch), auc
        )
        if exact:
            # np.asarray (not jax.device_get): the documented axon-safe
            # fetch convention (CLAUDE.md — device_get may hang on the relay)
            all_s.append(np.asarray(scores).reshape(-1))
            all_l.append(np.asarray(labels).reshape(-1))
    if exact:
        from recommender_tpu.core.metrics import exact_auc

        return float(exact_auc(np.concatenate(all_s), np.concatenate(all_l)))
    return float(auc_from_state(auc))


def make_skipgram_task(model: nn.Module):
    """EGES-family sampled-softmax training: model(batch) → logits [B, 1+k],
    loss = sigmoid CE against ``batch['label']`` (``eges/train.py:14-23``)."""
    from recommender_tpu.nn.losses import bce_with_logits

    def loss_fn(params, model_state, batch, rng, train):
        logits, new_ms = _apply(model, params, model_state, batch, train)
        per_ex = jnp.mean(bce_with_logits(logits, batch["label"]), axis=-1)
        new_ms, aux = _pop_diagnostics(new_ms, {})
        return per_ex, aux, new_ms

    def eval_fn(params, model_state, batch):
        logits, _ = _apply(model, params, model_state, batch, False)
        return jax.nn.sigmoid(logits.reshape(-1)), batch["label"].reshape(-1)

    return loss_fn, eval_fn


def link_prediction_auc(
    model: nn.Module, params, triples: dict, batch_size: int = 4096,
    exact: bool = True,
) -> float:
    """EGES link-prediction protocol (``eges/train.py:26-40``): score held-out
    edges and uniform negatives by sigmoid(hidden_q · hidden_x), AUC over
    pos-vs-neg. Uses ``model.get_hidden`` on each role.

    ``exact=True`` (default) computes the sort-based exact AUC on host —
    the 8192-bin histogram's ≲2e-3 error is the same order as the
    BGE/GES/EGES deltas being certified (VERDICT r2 weak #3); pass
    ``exact=False`` only for in-loop progress numbers."""
    import numpy as np

    from recommender_tpu.core.metrics import AUCState, auc_from_state, auc_update

    def hidden_for(role, batch):
        sub = {"target": batch[role]}
        for k, v in batch.items():
            if k.startswith(f"{role}_"):
                sub["target_" + k[len(role) + 1 :]] = v
        return model.apply({"params": params}, sub, method=model.get_hidden)

    @jax.jit
    def score(batch):
        q = hidden_for("query", batch)
        p = hidden_for("pos", batch)
        n = hidden_for("neg", batch)
        pos = jax.nn.sigmoid(jnp.sum(q * p, axis=-1))
        neg = jax.nn.sigmoid(jnp.sum(q * n, axis=-1))
        return pos, neg

    auc = AUCState.init()
    all_pos, all_neg = [], []
    total = len(triples["query"])
    for s in range(0, total, batch_size):
        batch = {k: jnp.asarray(v[s : s + batch_size]) for k, v in triples.items()}
        pos, neg = score(batch)
        if exact:
            # axon-safe fetch convention (see evaluate_head)
            all_pos.append(np.asarray(pos))
            all_neg.append(np.asarray(neg))
        else:
            auc = auc_update(auc, pos, jnp.ones_like(pos))
            auc = auc_update(auc, neg, jnp.zeros_like(neg))
    if not exact:
        return float(auc_from_state(auc))
    from recommender_tpu.core.metrics import exact_auc

    pos = np.concatenate(all_pos)
    neg = np.concatenate(all_neg)
    scores = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
    return float(exact_auc(scores, labels))


def make_aux_loss_task(model: nn.Module, aux_weight: float = 1.0):
    """CTR where model returns (prob, per-example aux loss) — DIEN."""

    def loss_fn(params, model_state, batch, rng, train):
        (prob, aux_loss), new_ms = _apply(model, params, model_state, batch, train)
        per_ex = binary_cross_entropy(prob, batch["label"]) + aux_weight * aux_loss
        new_ms, aux = _pop_diagnostics(new_ms, {"aux_loss": jnp.mean(aux_loss)})
        return per_ex, aux, new_ms

    def eval_fn(params, model_state, batch):
        (prob, _), _ = _apply(model, params, model_state, batch, False)
        return prob, batch["label"]

    return loss_fn, eval_fn
