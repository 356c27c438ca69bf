"""Component budget for the streamed-from-disk training path (VERDICT r4 #1).

The r4 gap: the only logged real-format training drive sustained 119-150k
ex/s at b4096 (benchmarks/logs/e2e_raw_tpu.log) against the 1.12-1.14M
ex/s on-device-data headline, with no decomposition. This experiment
measures every component of the npz-shard pipeline at the headline shape
(DLRM 1M x 16, b8192, bf16+SR) on the real chip:

  1. shard read      — dict(np.load(shard)) per 500k-row shard
  2. batch slice     — permutation fancy-index per b8192 batch
  3. host stream     — shard_batches end-to-end host-only rate
  4. h2d put         — Trainer.put_batch, per-put-synced AND pipelined
  5. device step     — resident-batch train step (the bench.py number)
  6. e2e streamed    — Trainer.fit from disk, prefetch depth 2,
                       1 and 2 read workers (interleave_ordered)

and derives the budget: which term eats the difference between the device
rate and the streamed rate, and what a production host (N cores, local
PCIe instead of the axon relay) would need to feed the chip at the
headline rate.

Run: python -u benchmarks/exp_stream_budget.py [--quick]
(one TPU process at a time; 600 s first-compile timeout — CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np

BATCH = 8192
VOCAB = 1_000_000
SHARD_ROWS = 500_000
N_SHARDS = 4


def log(**kw):
    print(json.dumps(kw), flush=True)


def make_shards(data_dir: Path, n_shards: int, rows: int) -> list[str]:
    from recommender_tpu.data.synthetic import SyntheticCTR

    data_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    gen = SyntheticCTR(vocab_size=VOCAB, seed=0)
    for i in range(n_shards):
        p = data_dir / f"shard_{i:05d}.npz"
        if not p.exists():
            t0 = time.perf_counter()
            np.savez(p, **gen.sample(rows, seed=10 + i))
            log(stage="make_shard", i=i, s=round(time.perf_counter() - t0, 2))
        paths.append(str(p))
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer steps")
    ap.add_argument("--data_dir", default="/tmp/stream_shards")
    ap.add_argument("--cpu", action="store_true", help="debug off-TPU")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from recommender_tpu.core.mesh import MeshSpec, make_mesh
    from recommender_tpu.core.train import TrainConfig, Trainer
    from recommender_tpu.data.criteo import shard_batches
    from recommender_tpu.data.pipeline import batch_iterator, interleave_ordered
    from recommender_tpu.models.dlrm import DLRM
    from recommender_tpu.models.tasks import init_model, make_ctr_task
    from recommender_tpu.parallel.partitioning import param_shardings

    steps = 30 if args.quick else 100
    paths = make_shards(Path(args.data_dir), N_SHARDS, SHARD_ROWS)
    bytes_per_row = 13 * 4 + 26 * 4 + 4  # int f32 + cat i32 + label f32
    log(stage="config", batch=BATCH, shards=len(paths), rows=SHARD_ROWS,
        mb_per_shard=round(SHARD_ROWS * bytes_per_row / 2**20, 1),
        cores=os.cpu_count(), backend=jax.default_backend())

    # ---- 1. shard read ----------------------------------------------------
    for trial in range(2):  # trial 0 = cold-ish, trial 1 = page-cache warm
        t0 = time.perf_counter()
        arrays = dict(np.load(paths[trial % len(paths)]))
        arrays = {k: np.ascontiguousarray(v) for k, v in arrays.items()}
        dt = time.perf_counter() - t0
        log(stage="shard_read", trial=trial, ms=round(dt * 1e3, 1),
            ms_per_batch=round(dt * 1e3 / (SHARD_ROWS // BATCH), 2),
            mb_s=round(SHARD_ROWS * bytes_per_row / 2**20 / dt, 1))

    # ---- 2. batch slice ---------------------------------------------------
    n_b = SHARD_ROWS // BATCH
    t0 = time.perf_counter()
    batches = list(batch_iterator(arrays, BATCH, seed=0, epochs=1))
    dt = time.perf_counter() - t0
    log(stage="batch_slice", ms_per_batch=round(dt * 1e3 / n_b, 2), batches=n_b)

    # ---- 3. host-only stream ----------------------------------------------
    it = shard_batches(paths, BATCH, seed=0, epochs=None)
    next(it)  # prime (first shard load)
    t0 = time.perf_counter()
    for _ in range(steps):
        next(it)
    dt = time.perf_counter() - t0
    host_rate = BATCH * steps / dt
    log(stage="host_stream", ms_per_batch=round(dt * 1e3 / steps, 2),
        rows_per_s=round(host_rate))

    # ---- model + trainer (bench.py production config) ---------------------
    mesh = make_mesh(MeshSpec(data=len(jax.devices()), model=1))
    model = DLRM(vocab_size=VOCAB, embed_dim=16, embed_param_dtype=jnp.bfloat16)
    loss_fn, eval_fn = make_ctr_task(model)
    cfg = TrainConfig(learning_rate=1e-3, log_every=10**9, eval_every=0)
    example = {k: v[:8] for k, v in batches[0].items()}
    var_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), example))
    pshard = param_shardings(var_shapes["params"], mesh)
    trainer = Trainer(loss_fn, cfg, mesh=mesh, param_shardings=pshard, eval_fn=eval_fn)
    state = trainer.init_state(lambda: init_model(model, example))

    @jax.jit
    def touch(b):  # forces the put to fully materialize on device
        return sum(jnp.sum(v) for v in b.values())

    # ---- 4. h2d put -------------------------------------------------------
    put = [trainer.put_batch(b) for b in batches[:2]]  # warm the path
    float(touch(put[-1]))
    t0 = time.perf_counter()
    for b in batches[: min(20, n_b)]:
        d = trainer.put_batch(b)
        float(touch(d))  # per-put sync: includes the relay RTT every time
    dt = time.perf_counter() - t0
    log(stage="h2d_put_synced", ms_per_batch=round(dt * 1e3 / min(20, n_b), 2),
        mb_s=round(min(20, n_b) * BATCH * bytes_per_row / 2**20 / dt, 1))
    t0 = time.perf_counter()
    ds = [trainer.put_batch(b) for b in batches[: min(20, n_b)]]
    float(touch(ds[-1]))
    for d in ds:
        float(touch(d))
    dt = time.perf_counter() - t0
    log(stage="h2d_put_pipelined", ms_per_batch=round(dt * 1e3 / min(20, n_b), 2),
        mb_s=round(min(20, n_b) * BATCH * bytes_per_row / 2**20 / dt, 1))

    # ---- 5. device step (resident batch) ----------------------------------
    rng = jax.random.PRNGKey(0)
    resident = trainer.put_batch(batches[0])
    for _ in range(10):
        state, metrics = trainer._train_step(state, resident, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer._train_step(state, resident, rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    dev_ms = dt * 1e3 / steps
    log(stage="device_step", ms=round(dev_ms, 2),
        ex_per_s=round(BATCH * steps / dt))

    # ---- 6. e2e streamed --------------------------------------------------
    def run_e2e(tag, train_iter, prefetch):
        nonlocal state
        state, _ = trainer.fit(state, train_iter, steps=5, prefetch=prefetch)
        s2, m = trainer._train_step(state, resident, rng)
        float(m["loss"])  # drain the queue before timing
        t0 = time.perf_counter()
        state, _ = trainer.fit(state, train_iter, steps=steps, prefetch=prefetch)
        s2, m = trainer._train_step(state, resident, rng)
        float(m["loss"])
        dt = time.perf_counter() - t0
        log(stage=tag, ms_per_step=round(dt * 1e3 / (steps + 1), 2),
            ex_per_s=round(BATCH * (steps + 1) / dt))

    run_e2e("e2e_stream_w1", shard_batches(paths, BATCH, seed=1, epochs=None),
            prefetch=2)
    run_e2e(
        "e2e_stream_w2",
        interleave_ordered(
            [shard_batches(paths[w::2], BATCH, seed=2 + w, epochs=None)
             for w in range(2)],
            size=2,
        ),
        prefetch=0,
    )
    # no-prefetch control: serialized host+put+step — the sum of the terms
    run_e2e("e2e_stream_noprefetch",
            shard_batches(paths, BATCH, seed=4, epochs=None), prefetch=0)

    log(stage="budget_note",
        device_ms=round(dev_ms, 2),
        host_cores_for_headline=round(
            (BATCH / host_rate * 1e3) / dev_ms, 2,
        ),
        note=("host_cores_for_headline = host ms/batch ÷ device ms/step: "
              "how many of THIS host's cores a production host needs to "
              "feed the chip at the device rate (reads+slices parallelize "
              "across shards/workers)"))


if __name__ == "__main__":
    main()
