"""Does the bf16-stored table still need the split grads|optimizer step?

The split exists because XLA's layout assignment flips a big narrow F32
table to column-major when the fused graph also contains its Adam update
(docs/DESIGN.md "narrow-table layout trap": 14.3 fused vs 8.9 split). At
bf16 the tile shape changes ((16,128) native tiles vs (8,128)) and the
second dispatch (~1 ms) is now ~14% of the 7.30 ms step — re-measure the
trap at the new dtype.

Run: timeout 1200 python -u benchmarks/exp_bf16_fused.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from exp_bf16_sr import VARIANTS, make_trainer, step_time  # noqa: F401
import exp_bf16_sr


def step_time_split(split, batch=8192):
    import time

    import jax
    from recommender_tpu.core.mesh import MeshSpec, make_mesh
    from recommender_tpu.core.train import TrainConfig, Trainer
    from recommender_tpu.data.synthetic import SyntheticCTR
    from recommender_tpu.models.dlrm import DLRM
    from recommender_tpu.models.tasks import init_model, make_ctr_task
    from recommender_tpu.parallel.partitioning import param_shardings

    vocab = 1_000_000
    model = DLRM(vocab_size=vocab, embed_dim=16, embed_param_dtype=jnp.bfloat16)
    loss_fn, eval_fn = make_ctr_task(model)
    mesh = make_mesh(MeshSpec(1, 1))
    cfg = TrainConfig(learning_rate=1e-3, log_every=10**9, eval_every=0,
                      split_step=split)
    ex = SyntheticCTR(vocab_size=vocab, seed=0).sample(8, seed=9)
    pshard = param_shardings(
        model.init(jax.random.PRNGKey(0), ex)["params"], mesh)
    tr = Trainer(loss_fn, cfg, mesh=mesh, param_shardings=pshard, eval_fn=eval_fn)
    state = tr.init_state(lambda: init_model(model, ex))
    host = SyntheticCTR(vocab_size=vocab, seed=0).sample(batch, seed=1)
    dev = tr.put_batch(host)
    rng = jax.random.PRNGKey(0)
    step = tr._train_step
    for _ in range(10):
        state, m = step(state, dev, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(100):
        state, m = step(state, dev, rng)
    float(m["loss"])
    return (time.perf_counter() - t0) / 100


def main():
    for name, split in (("bf16_sr_split(auto)", None),
                        ("bf16_sr_fused", False),
                        ("bf16_sr_split(forced)", True)):
        dt = step_time_split(split)
        print(json.dumps({"variant": name, "step_ms": round(dt * 1e3, 3),
                          "ex_per_s": round(8192 / dt, 0)}), flush=True)


if __name__ == "__main__":
    main()
