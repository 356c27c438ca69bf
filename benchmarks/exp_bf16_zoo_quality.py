"""Quality check for the zoo's bf16+SR opt-in tables (DeepFM / DIEN):
3k-step synthetic runs, exact AUC, f32 vs bf16 — the same protocol as
quality_runs.py. The DLRM SR study (RESULTS.md) establishes the
mechanism; these rows confirm it transfers to the other families that
expose `embed_param_dtype`.

Run: timeout 3000 python -u benchmarks/exp_bf16_zoo_quality.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.pipeline import batch_iterator
from recommender_tpu.models.tasks import init_model, make_aux_loss_task, make_ctr_task


def mesh1():
    return make_mesh(MeshSpec(len(jax.devices()), 1))


def run_deepfm(dtype, steps=3000):
    from recommender_tpu.data.synthetic import SyntheticCTR
    from recommender_tpu.models.deepfm import DeepFM

    gen = SyntheticCTR(vocab_size=200_000, seed=0)
    train = gen.sample(2_000_000, seed=1)
    test = gen.sample(100_000, seed=2)
    model = DeepFM(vocab_size=200_000, embed_dim=16, embed_param_dtype=dtype)
    loss_fn, eval_fn = make_ctr_task(model)
    tr = Trainer(loss_fn, TrainConfig(learning_rate=1e-3, log_every=10**9),
                 mesh=mesh1(), eval_fn=eval_fn)
    state = tr.init_state(lambda: init_model(model, {k: v[:8] for k, v in train.items()}))
    state, _ = tr.fit(state, batch_iterator(train, 4096, epochs=None), steps=steps)
    ev = tr.evaluate(state, batch_iterator(test, 8192, shuffle=False), exact=True)
    return ev["eval_auc_exact"]


def run_dien(dtype, steps=3000):
    from recommender_tpu.data.synthetic import SyntheticSequence
    from recommender_tpu.models.dien import DIEN

    gen = SyntheticSequence(num_items=20_000, num_cats=200, max_len=50, seed=0)
    train = gen.sample(400_000, seed=1)
    test = gen.sample(50_000, seed=2)
    model = DIEN(item_vocab=gen.num_items, cat_vocab=gen.num_cats,
                 embed_param_dtype=dtype)
    loss_fn, eval_fn = make_aux_loss_task(model)
    tr = Trainer(loss_fn, TrainConfig(learning_rate=1e-3, log_every=10**9),
                 mesh=mesh1(), eval_fn=eval_fn)
    state = tr.init_state(lambda: init_model(model, {k: v[:8] for k, v in train.items()}))
    state, _ = tr.fit(state, batch_iterator(train, 512, epochs=None), steps=steps)
    ev = tr.evaluate(state, batch_iterator(test, 2048, shuffle=False), exact=True)
    return ev["eval_auc_exact"]


def main():
    for fam, fn in (("deepfm", run_deepfm), ("dien", run_dien)):
        for name, dt in (("f32", jnp.float32), ("bf16_sr", jnp.bfloat16)):
            auc = fn(dt)
            print(json.dumps({"family": fam, "variant": name,
                              "auc_3k_exact": round(auc, 4)}), flush=True)


if __name__ == "__main__":
    main()
