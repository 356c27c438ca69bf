"""Weak-scaling harness: DLRM examples/s/chip at 1..N devices.

The BASELINE.json north star: ≥80% weak-scaling efficiency on
embedding-bound DLRM at N hosts. This harness keeps the per-device batch
fixed and grows the ``data`` axis (optionally with a ``model`` axis for the
table), reporting ex/s/device and efficiency vs the 1-device run.

On real multi-chip hardware this measures ICI collectives; on a single chip
it degenerates to the 1-device row. Run on CPU with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`` to
exercise the harness + sharding logic (not meaningful as absolute perf).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the axon sitecustomize force-selects the TPU; honor an explicit CPU ask
# (the virtual-device harness mode in the module docstring)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings

PER_DEVICE_BATCH = 4096
VOCAB = 1_000_000
STEPS = 30


def bench_mesh(data: int, model_axis: int, vocab: int) -> float:
    devices = jax.devices()[: data * model_axis]
    mesh = make_mesh(MeshSpec(data, model_axis), devices=devices)
    model = DLRM(
        vocab_size=vocab, embed_dim=16,
        partition="model" if model_axis > 1 else None,
    )
    gen = SyntheticCTR(vocab_size=vocab, seed=0)
    host = gen.sample(PER_DEVICE_BATCH * data, seed=1)
    loss_fn, eval_fn = make_ctr_task(model)
    ex = {k: v[:8] for k, v in host.items()}
    var_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ex))
    pshard = param_shardings(var_shapes["params"], mesh)
    tr = Trainer(loss_fn, TrainConfig(), mesh=mesh, param_shardings=pshard,
                 eval_fn=eval_fn)
    state = tr.init_state(lambda: init_model(model, ex))
    batch = tr.put_batch(host)
    rng = jax.random.PRNGKey(0)
    step = tr._train_step
    for _ in range(5):
        state, m = step(state, batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    return PER_DEVICE_BATCH * data / dt / (data * model_axis)


def main():
    n = len(jax.devices())
    vocab = VOCAB if jax.devices()[0].platform == "tpu" else 50_000
    base = None
    data = 1
    while data <= n:
        ex_per_dev = bench_mesh(data, 1, vocab)
        if base is None:
            base = ex_per_dev
        print(
            json.dumps(
                {
                    "devices": data,
                    "mesh": [data, 1],
                    "examples_per_s_per_device": round(ex_per_dev, 1),
                    "weak_scaling_efficiency": round(ex_per_dev / base, 3),
                }
            ),
            flush=True,
        )
        data *= 2
    if n >= 4:
        ex_per_dev = bench_mesh(n // 2, 2, vocab)
        print(
            json.dumps(
                {
                    "devices": n,
                    "mesh": [n // 2, 2],
                    "examples_per_s_per_device": round(ex_per_dev, 1),
                    "weak_scaling_efficiency": round(ex_per_dev / base, 3),
                    "note": "row-sharded table over model axis",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
