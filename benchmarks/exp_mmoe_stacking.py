"""One-off experiment: MMOE stacked-table lookup strategy matrix on TPU.

Usage: python benchmarks/exp_mmoe_stacking.py <mode> [batch]
  mode = fused_padded | fused_native | split_native | split_padded
       | unstacked | unstacked_padded | unstacked_native
"""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import numpy as np

mode = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

import recommender_tpu.ops.embedding_kernels as ek
if "native" in mode:
    ek.use_padded_backward = lambda shape, n: False
elif "padded" in mode:
    ek.use_padded_backward = lambda shape, n: len(shape) == 2 and shape[1] < ek._FAST_WIDTH

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.synthetic import SyntheticMultiTask
from recommender_tpu.models.esmm import MMOE
from recommender_tpu.models.tasks import init_model, make_multitask_task

split = None
if mode.startswith("fused"):
    split = False
elif mode.startswith("split"):
    split = True

gen = SyntheticMultiTask(vocab_sizes=tuple([100_000] * 18), seed=0)
host = gen.sample(B, seed=1)
mesh = make_mesh(MeshSpec(len(jax.devices()), 1))
partition = (None,) * 18 if mode.startswith("unstacked") else None
model = MMOE(
    vocab_sizes=list(gen.vocab_sizes),
    partition=partition,
    stack_tables=not mode.startswith("unstacked"),
)
loss_fn, eval_fn = make_multitask_task(model)
tr = Trainer(loss_fn, TrainConfig(split_step=split), mesh=mesh, eval_fn=eval_fn)
state = tr.init_state(lambda: init_model(model, {k: v[:8] for k, v in host.items()}))
batch = tr.put_batch(host)
rng = jax.random.PRNGKey(0)
for _ in range(5):
    state, m = tr._train_step(state, batch, rng)
float(m["loss"])
t0 = time.perf_counter()
for _ in range(50):
    state, m = tr._train_step(state, batch, rng)
float(m["loss"])
dt = (time.perf_counter() - t0) / 50
print(json.dumps({"mode": mode, "batch": B, "ms": round(dt * 1e3, 2),
                  "ex_s": round(B / dt, 1)}), flush=True)
