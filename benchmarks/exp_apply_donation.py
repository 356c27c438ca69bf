"""EXPERIMENT (resolved 2026-08-19): the apply_step donation warning is
BENIGN surplus, not missed aliasing.

The split step's optimizer jit (`Trainer._apply_step`) donates
(state, grads, new_model_state); XLA warns "Some donated buffers were not
usable" listing exactly the 15 param shapes ONCE. Per output shape there
are FOUR donated candidates (params, grads, adam mu, adam nu) and only
THREE outputs (params', mu', nu') — the leftover buffer per shape is what
the warning reports. Measured on v5e, DLRM b8192:

  auto    9.17 ms/step  (893k ex/s)   warning present
  pinned  9.21 ms/step  (889k ex/s)   warning STILL present

"pinned" rebuilds the apply jit with explicit in/out Formats (layout +
sharding captured from the live arrays, in == out bit-for-bit) — if the
warning meant real out-of-place updates, pinning would have changed the
aliasing or the time; it changed neither. The in-place update path is
healthy; do not chase this warning again.

Usage: python benchmarks/exp_apply_donation.py {auto|pinned}
"""
import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings

mode = sys.argv[1] if len(sys.argv) > 1 else "auto"

mesh = make_mesh(MeshSpec(1, 1))
model = DLRM(vocab_size=1_000_000, embed_dim=16)
gen = SyntheticCTR(vocab_size=1_000_000, seed=0)
host = gen.sample(8192, seed=1)
loss_fn, eval_fn = make_ctr_task(model)
ex = {k: v[:8] for k, v in host.items()}
pshard = param_shardings(model.init(jax.random.PRNGKey(0), ex)["params"], mesh)
tr = Trainer(loss_fn, TrainConfig(split_step=True), mesh=mesh,
             param_shardings=pshard, eval_fn=eval_fn)
state = tr.init_state(lambda: init_model(model, ex))
batch = tr.put_batch(host)
rng = jax.random.PRNGKey(0)

if mode == "pinned":
    # run one step to learn the steady-state formats, then rebuild the
    # apply jit with those formats pinned on inputs AND outputs
    grads, new_ms, _ = tr._grad_step(state, batch, rng)

    def fmt_of(x):
        return x.format if hasattr(x, "format") else None

    state_fmt = jax.tree_util.tree_map(fmt_of, state)
    grads_fmt = jax.tree_util.tree_map(fmt_of, grads)
    ms_fmt = jax.tree_util.tree_map(fmt_of, new_ms)

    apply_fn = tr._apply_step.__wrapped__  # the raw python fn
    tr._apply_step = jax.jit(
        apply_fn,
        donate_argnums=(0, 1, 2),
        in_shardings=(state_fmt, grads_fmt, ms_fmt),
        out_shardings=state_fmt,
    )

with warnings.catch_warnings(record=True) as wlist:
    warnings.simplefilter("always")
    st, mm = tr._train_step(state, batch, rng)
    float(mm["loss"])
donation_msgs = [str(w.message)[:100] for w in wlist if "donated" in str(w.message)]

for _ in range(3):
    st, mm = tr._train_step(st, batch, rng)
float(mm["loss"])
t0 = time.perf_counter()
for _ in range(40):
    st, mm = tr._train_step(st, batch, rng)
float(mm["loss"])
full_ms = (time.perf_counter() - t0) / 40 * 1e3

print(json.dumps({"mode": mode, "full_step_ms": round(full_ms, 2),
                  "ex_s": round(8192 / full_ms * 1e3, 1),
                  "donation_warnings": donation_msgs}), flush=True)
