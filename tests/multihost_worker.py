"""Worker process for tests/test_multihost.py::test_two_process_training.

Runs the REAL multi-host CLI wiring end-to-end: base_parser flags →
setup_distributed (jax.distributed.initialize rendezvous) → global mesh →
host_local_data / host_batch_size per-host input sharding →
Trainer.put_batch's make_array_from_process_local_data assembly → jitted
train steps whose gradient psum spans both processes (gloo CPU
collectives). Prints one JSON line with the per-step losses; the test
compares them against a single-process run of the same global stream
(deterministic shuffle=False streams; the global batch is the same row
SET either way, and per-example losses are meaned, so the trajectories
must agree to float tolerance).

Invoke: python multihost_worker.py <process_id> <num_processes> <port>
(single-process mode: process_id=0 num_processes=1 port=0 → no flags).
"""
import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from recommender_tpu.cli.common import (  # noqa: E402
    base_parser,
    build_mesh,
    build_trainer,
    host_batch_size,
    host_local_data,
    setup_distributed,
)
from recommender_tpu.data.pipeline import batch_iterator  # noqa: E402
from recommender_tpu.data.synthetic import SyntheticCTR  # noqa: E402
from recommender_tpu.models.dlrm import DLRM  # noqa: E402
from recommender_tpu.models.tasks import init_model, make_ctr_task  # noqa: E402

STEPS, GLOBAL_BATCH = 4, 32

flags = ["--steps", str(STEPS), "--train_batch_size", str(GLOBAL_BATCH),
         "--log_every", "1"]
if nproc > 1:
    flags += ["--coordinator_address", f"localhost:{port}",
              "--num_processes", str(nproc), "--process_id", str(pid)]
args = base_parser("multihost smoke").parse_args(flags)
host_id, num_hosts = setup_distributed(args)
assert (host_id, num_hosts) == (pid, nproc), (host_id, num_hosts)

gen = SyntheticCTR(num_int=4, num_cat=3, vocab_size=500, seed=0)
full = gen.sample(STEPS * GLOBAL_BATCH, seed=1)
local = host_local_data(full)
it = batch_iterator(local, host_batch_size(GLOBAL_BATCH), shuffle=False,
                    epochs=None)

model = DLRM(vocab_size=500, embed_dim=8, num_int=4, num_cat=3,
             bottom_units=(16, 8), top_units=(16, 1))
loss_fn, _ = make_ctr_task(model)
mesh = build_mesh(args)  # all global devices on the data axis
trainer = build_trainer(args, loss_fn, None, mesh)
example = {k: v[: host_batch_size(GLOBAL_BATCH)] for k, v in full.items()}
state = trainer.init_state(lambda: init_model(model, example, seed=0))

losses = []
log = lambda m: losses.append(m["loss"]) if "loss" in m else None
state, _ = trainer.fit(state, it, steps=STEPS, log_fn=log)
print(json.dumps({"pid": pid, "nproc": nproc, "losses": losses}), flush=True)
