"""bf16+SR follow-ups (round 3, after exp_bf16_sr.py's first sweep):

1. NOISE BAND — the r2 'done' bar is "bf16 AUC within run-to-run noise of
   f32": measure f32's own 300-step fingerprint spread over init seeds.
2. bf16_sr_fast — SR with the murmur3-hash generator (threefry over the
   param+moment tree measured ~1 ms of the step; the hash is ~10 VPU ops
   per element). Same quality expected (both unbiased), big step win.
3. bf16_sr_fast_m32 — hash SR on the param write only, f32 moments
   (isolates moment-storage precision from param-write rounding).

Run: timeout 3000 python -u benchmarks/exp_bf16_sr2.py [name ...]
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
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings

from exp_bf16_sr import step_time  # reuse the b8192/1M harness


def fingerprint(dtype, sr, mdt, init_seed=0):
    gen = SyntheticCTR(vocab_size=50_000, seed=0)
    train, test = gen.sample(100_000, 1), gen.sample(20_000, 2)
    model = DLRM(vocab_size=50_000, embed_dim=16, embed_param_dtype=dtype)
    loss_fn, eval_fn = make_ctr_task(model)
    mesh = make_mesh(MeshSpec(1, 1))
    cfg = TrainConfig(learning_rate=1e-3, log_every=10**9, eval_every=0,
                      stochastic_round=sr, moment_dtype=mdt, seed=init_seed)
    ex = {k: v[:8] for k, v in train.items()}
    pshard = param_shardings(model.init(jax.random.PRNGKey(0), ex)["params"], mesh)
    tr = Trainer(loss_fn, cfg, mesh=mesh, param_shardings=pshard, eval_fn=eval_fn)
    state = tr.init_state(lambda: init_model(model, ex, seed=init_seed))
    state, _ = tr.fit(state, batch_iterator(train, 4096, epochs=None), steps=300)
    ev = tr.evaluate(state, batch_iterator(test, 4096, shuffle=False), exact=True)
    return ev["eval_auc_exact"]


RUNS = {
    # name: (dtype, sr, moment_dtype, init_seed, also_time)
    "f32_seed1": (jnp.float32, False, None, 1, False),
    "f32_seed2": (jnp.float32, False, None, 2, False),
    "f32_seed3": (jnp.float32, False, None, 3, False),
    "bf16_sr_fast": (jnp.bfloat16, True, None, 0, True),
    "bf16_sr_fast_m32": (jnp.bfloat16, True, "float32", 0, True),
}


def main():
    which = sys.argv[1:] or list(RUNS)
    for name in which:
        dtype, sr, mdt, seed, also_time = RUNS[name]
        row = {"variant": name,
               "auc_300": round(fingerprint(dtype, sr, mdt, seed), 4)}
        if also_time:
            dt = step_time(dtype, sr, mdt)
            row["step_ms_b8192"] = round(dt * 1e3, 3)
            row["ex_per_s"] = round(8192 / dt, 0)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
