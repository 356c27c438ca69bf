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
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    ap.add_argument("--batch", type=int, default=BATCH,
                    help="e2e-stage batch size (components always run the "
                         "headline b8192; b4096 is the relay-stable size "
                         "from the r4 drive)")
    ap.add_argument("--stage", default="components",
                    choices=["components", "e2e_w1", "e2e_w2", "e2e_nopf"],
                    help="run ONE stage per process: the e2e variants each "
                         "need fresh relay state (a long in-process mix of "
                         "puts/steps/threaded reads can poison the axon "
                         "relay's dispatch path — every later device_put "
                         "fails INVALID_ARGUMENT; observed r5, logs). "
                         "Sequential per-stage processes also match real "
                         "CLI usage. Drive all: for s in components e2e_w1 "
                         "e2e_w2 e2e_nopf; do python -u ... --stage $s; done")
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

    n_b = SHARD_ROWS // BATCH
    host_rate = None
    if args.stage == "components":
        # ---- 1. shard read ------------------------------------------------
        for trial in range(2):  # trial 0 = cold-ish, trial 1 = page-cache warm
            t0 = time.perf_counter()
            arrays = dict(np.load(paths[trial % len(paths)]))
            arrays = {k: np.ascontiguousarray(v) for k, v in arrays.items()}
            dt = time.perf_counter() - t0
            log(stage="shard_read", trial=trial, ms=round(dt * 1e3, 1),
                ms_per_batch=round(dt * 1e3 / (SHARD_ROWS // BATCH), 2),
                mb_s=round(SHARD_ROWS * bytes_per_row / 2**20 / dt, 1))

        # ---- 2. batch slice -----------------------------------------------
        t0 = time.perf_counter()
        batches = list(batch_iterator(arrays, BATCH, seed=0, epochs=1))
        dt = time.perf_counter() - t0
        log(stage="batch_slice", ms_per_batch=round(dt * 1e3 / n_b, 2), batches=n_b)

        # ---- 3. host-only stream (1 and 2 read workers) --------------------
        it = shard_batches(paths, BATCH, seed=0, epochs=None)
        next(it)  # prime (first shard load)
        t0 = time.perf_counter()
        for _ in range(steps):
            next(it)
        dt = time.perf_counter() - t0
        host_rate = BATCH * steps / dt
        log(stage="host_stream", ms_per_batch=round(dt * 1e3 / steps, 2),
            rows_per_s=round(host_rate))
        # window must span several shard loads per worker (61 batches/shard)
        # or it only measures draining pre-loaded slices
        n_w2 = steps * 4
        it2 = interleave_ordered(
            [shard_batches(paths[w::2], BATCH, seed=6 + w, epochs=None)
             for w in range(2)], size=2)
        next(it2)
        t0 = time.perf_counter()
        for _ in range(n_w2):
            next(it2)
        dt = time.perf_counter() - t0
        log(stage="host_stream_w2", ms_per_batch=round(dt * 1e3 / n_w2, 2),
            rows_per_s=round(BATCH * n_w2 / dt), batches=n_w2)
    else:
        batches = list(batch_iterator(
            dict(np.load(paths[0])), args.batch, seed=0, epochs=1))
    bs = args.batch

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

    rng = jax.random.PRNGKey(0)
    resident = trainer.put_batch(batches[0])

    if args.stage != "components":
        # ---- e2e streamed (one variant per process: fresh relay state) ----
        # Manual chunked loop instead of Trainer.fit so a mid-run relay
        # failure (sustained streamed put+step at b8192 can kill the axon
        # relay after ~100 transfers — INVALID_ARGUMENT at an arbitrary
        # later dispatch; r4's b4096 500-step CLI drive was fine) still
        # yields a measured rate over the completed chunks.
        from recommender_tpu.data.pipeline import prefetch_to_device

        if args.stage == "e2e_w1":
            train_iter = prefetch_to_device(
                shard_batches(paths, bs, seed=1, epochs=None), size=2)
        elif args.stage == "e2e_w2":
            train_iter = interleave_ordered(
                [shard_batches(paths[w::2], bs, seed=2 + w, epochs=None)
                 for w in range(2)], size=2)
        else:  # e2e_nopf: serialized host+put+step — the sum of the terms
            train_iter = shard_batches(paths, bs, seed=4, epochs=None)
        chunk, chunks = 10, []
        try:
            for _ in range(5):  # warmup/compile
                state, m = trainer._train_step(
                    state, trainer.put_batch(next(train_iter)), rng)
            float(m["loss"])
            for _ in range(steps // chunk):
                t0 = time.perf_counter()
                for _ in range(chunk):
                    state, m = trainer._train_step(
                        state, trainer.put_batch(next(train_iter)), rng)
                float(m["loss"])  # sync each chunk
                chunks.append(time.perf_counter() - t0)
        except Exception as e:
            log(stage=f"e2e_stream_{args.stage[4:]}_error",
                after_chunks=len(chunks), error=f"{type(e).__name__}: {e}"[:160])
        if chunks:
            per = np.array(chunks) / chunk
            log(stage=f"e2e_stream_{args.stage[4:]}", batch=bs,
                ms_per_step=round(float(np.median(per)) * 1e3, 2),
                ex_per_s=round(bs / float(np.median(per))),
                chunks=len(chunks),
                ms_spread=[round(float(c / chunk * 1e3), 1) for c in chunks])
        return

    # ---- 4. device step (resident batch) ----------------------------------
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

    # ---- 5. h2d put microbenchmark (LAST in this process: ~40 rapid-fire
    # synced puts can leave the relay's dispatch path failing
    # INVALID_ARGUMENT for the rest of the process — observed r5) ----------
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
