"""DLRM step time across embedding dims and batch sizes (bf16+SR config).

The headline row is the reference-parity shape (D=16, b8192). Production
DLRM deployments run wider embeddings — D=32/64 changes the hot-path
balance (D=64 rows are exactly the 64-lane fast scatter width, so the
padded backward becomes a no-pad copy) — and bigger batches amortize
fixed costs. One process, resident batches (no streamed puts), float()
sync per measurement.

Run: python -u benchmarks/exp_dlrm_dims.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings

VOCAB = 1_000_000
STEPS, WARMUP = 60, 10


def run(embed_dim: int, batch: int):
    mesh = make_mesh(MeshSpec(data=len(jax.devices()), model=1))
    model = DLRM(vocab_size=VOCAB, embed_dim=embed_dim,
                 bottom_units=(512, 256, 64, embed_dim),
                 embed_param_dtype=jnp.bfloat16)
    gen = SyntheticCTR(vocab_size=VOCAB, seed=0)
    host = gen.sample(batch, seed=1)
    loss_fn, eval_fn = make_ctr_task(model)
    cfg = TrainConfig(learning_rate=1e-3, log_every=10**9, eval_every=0)
    example = {k: v[:8] for k, v in host.items()}
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), example))
    pshard = param_shardings(var_shapes["params"], mesh)
    tr = Trainer(loss_fn, cfg, mesh=mesh, param_shardings=pshard,
                 eval_fn=eval_fn)
    state = tr.init_state(lambda: init_model(model, example))
    b = tr.put_batch(host)
    rng = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        state, m = tr._train_step(state, b, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = tr._train_step(state, b, rng)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "bench": f"dlrm_D{embed_dim}_b{batch}_bf16sr",
        "ms_per_step": round(dt * 1e3 / STEPS, 2),
        "examples_per_s": round(batch * STEPS / dt),
        "table_mb": round(VOCAB * embed_dim * 2 / 2**20),
    }))


def main():
    for embed_dim, batch in ((16, 8192), (32, 8192), (64, 8192),
                             (16, 32768), (64, 32768)):
        run(embed_dim, batch)


if __name__ == "__main__":
    main()
