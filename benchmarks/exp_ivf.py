"""IVF clustered retrieval vs brute force on the real chip (retrieval/ivf.py).

The brute-force int8+approx path streams the WHOLE corpus per query batch
— optimal at large Q (the stream is shared across queries; RESULTS.md r4
serving section), but latency-bound serving runs SMALL Q where each
request still pays the full stream. IVF reads only probes × cap rows per
query. This measures both paths on-chip at V=4M, D=128 across small query
batches, plus the IVF recall vs the brute int8 ranking, to map the
crossover.

Run: python -u benchmarks/exp_ivf.py [--quick]
(kmeans build pushes the f32 corpus through the relay once — a few
minutes of setup; measurement loops are float()-synced throughput mode.
The corpus is deliberately HOST-generated despite the CLAUDE.md
device-generation rule: build_ivf's bucket packing is host-side numpy,
so the rows must exist on the host either way — the relay crossing is
inherent to the build path, paid once, and outside the timed loops.)
"""
import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

print = functools.partial(print, flush=True)

import numpy as np


def log(**kw):
    print(json.dumps(kw))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from recommender_tpu.retrieval.ivf import IVFIndex, build_ivf, search_ivf
    from recommender_tpu.retrieval.quantize import quantize_reprs

    V = 1 << 20 if args.quick else 4 << 20
    D, C, K = 128, 1024 if args.quick else 4096, 10
    TRUE_C = 512  # planted clusters (≠ C so kmeans does real work)
    iters = 20 if args.quick else 30

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    centers = (rng.normal(size=(TRUE_C, D)) * 2.0).astype(np.float32)
    assign = rng.integers(0, TRUE_C, V)
    reprs = centers[assign] + rng.normal(size=(V, D)).astype(np.float32) * 0.5
    reprs = reprs.astype(np.float32)
    log(stage="gen", s=round(time.perf_counter() - t0, 1), V=V, D=D, C=C)

    t0 = time.perf_counter()
    index = build_ivf(reprs, num_clusters=C, capacity_factor=1.5, iters=8,
                      seed=1)
    spilled = int((index.spill_ids >= 0).sum())
    log(stage="build", s=round(time.perf_counter() - t0, 1),
        cap=index.cap, spilled=spilled, spill_frac=round(spilled / V, 4),
        index_mb=round(index.nbytes() / 2**20, 1))

    # device-resident index + flat corpus (upload once; per-call numpy
    # would re-cross the relay every search)
    dev = IVFIndex(**{
        f.name: jnp.asarray(getattr(index, f.name))
        for f in dataclasses.fields(IVFIndex)
    })
    q8, scale = quantize_reprs(reprs)
    q8d, scaled = jnp.asarray(q8), jnp.asarray(scale)
    float(jnp.sum(scaled))
    log(stage="uploaded", corpus_mb=round(q8.nbytes / 2**20, 1))

    # corpus rides as ARGUMENTS — a closed-over device array embeds as a
    # jaxpr constant and ships with the relay compile request (HTTP 413)
    @functools.partial(jax.jit, static_argnames=("k",))
    def brute_(queries, q8d, scaled, *, k):
        qmax = jnp.max(jnp.abs(queries), axis=1, keepdims=True)
        qq = jnp.clip(jnp.round(queries / jnp.maximum(qmax / 127.0, 1e-30)),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qq, q8d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * scaled[None, :]
        _, idx = jax.lax.approx_max_k(acc, k, recall_target=0.95)
        return idx

    def brute(queries, *, k):
        return brute_(queries, q8d, scaled, k=k)

    def bench(fn, *a, iters=iters, **kw):
        out = fn(*a, **kw)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a, **kw)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return (time.perf_counter() - t0) / iters * 1e3, out

    for Q in (8, 32, 128, 512):
        queries = jnp.asarray(
            reprs[rng.integers(0, V, Q)]
            + rng.normal(size=(Q, D)).astype(np.float32) * 0.1
        )
        ms_b, out_b = bench(brute, queries, k=K)
        brute_ids = np.asarray(out_b)
        for P in (8, 16, 32):
            # the [Q, P, cap, D] candidate gather materializes; skip grid
            # points past ~1.5 GB (Q=512 P=32 OOM'd the 16 GB chip)
            if Q * P * index.cap * D > (1536 << 20):
                log(stage="compare", Q=Q, probes=P, skipped="gather>1.5GB")
                continue
            ms_i, out_i = bench(search_ivf, dev, queries, k=K, probes=P)
            ivf_ids = np.asarray(out_i[0])
            recall = float(np.mean([
                len(set(a_.tolist()) & set(b_.tolist())) / K
                for a_, b_ in zip(ivf_ids, brute_ids)
            ]))
            log(stage="compare", Q=Q, probes=P,
                brute_ms=round(ms_b, 3), ivf_ms=round(ms_i, 3),
                speedup=round(ms_b / ms_i, 2),
                recall_vs_brute=round(recall, 4),
                candidates=P * index.cap + len(index.spill_ids))


if __name__ == "__main__":
    main()
