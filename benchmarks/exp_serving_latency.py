"""Serving-path LATENCY percentiles (p50/p90/p99) — the production metric
the throughput rows don't show.

A serving request is: host query ids → device put → int8 corpus scoring +
approx top-k (`retrieval/quantize._topk_int8`, the `cli/serve` path) →
fetch [Q, k] id matrix back to host. This measures that full round trip
per request at V=2M, D=128 for query batch sizes 1/16/256/1024, 200
requests each, and reports percentiles — plus a null-RTT baseline (same
loop through a trivial jitted identity) so the on-chip compute share can
be separated from this host's ~30 ms relay round trip (CLAUDE.md; a
production host's PCIe RTT is ~0.1 ms, so its request latency is the
on-chip column plus noise).

Run: python -u benchmarks/exp_serving_latency.py [V] [D]
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

from recommender_tpu.retrieval.quantize import _topk_int8

V = int(sys.argv[1]) if len(sys.argv) > 1 else 2 * 1024 * 1024
D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
K = 10
REQUESTS = 200


def pcts(ms):
    a = np.sort(np.asarray(ms))
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 2),
        "p90_ms": round(float(np.percentile(a, 90)), 2),
        "p99_ms": round(float(np.percentile(a, 99)), 2),
        "mean_ms": round(float(a.mean()), 2),
    }


def main():
    key = jax.random.PRNGKey(0)

    # corpus built and quantized ON DEVICE (a 1 GB host array would crawl
    # through the relay — CLAUDE.md)
    @jax.jit
    def make_corpus(k):
        r = jax.random.normal(k, (V, D), jnp.float32)
        amax = jnp.max(jnp.abs(r), axis=1)
        scale = amax / 127.0
        q = jnp.clip(jnp.round(r / scale[:, None]), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    qi, sc = make_corpus(key)
    float(jnp.sum(sc))
    print(json.dumps({"config": {"V": V, "D": D, "k": K, "requests": REQUESTS}}))

    @jax.jit
    def null(x):  # the RTT floor: put 1 id + fetch 1 id, no real compute
        return x + 1

    rng = np.random.default_rng(0)
    for Q in (1, 16, 256, 1024):
        ids_pool = [rng.integers(0, V, Q).astype(np.int32) for _ in range(8)]
        # warm / compile
        for i in range(3):
            np.asarray(_topk_int8(qi, sc, jnp.asarray(ids_pool[i % 8]), k=K,
                                  exact=False, recall_target=0.95,
                                  mask_self=True))
        lat = []
        for i in range(REQUESTS):
            ids = ids_pool[i % 8]
            t0 = time.perf_counter()
            out = np.asarray(_topk_int8(qi, sc, jnp.asarray(ids), k=K,
                                        exact=False, recall_target=0.95,
                                        mask_self=True))
            lat.append((time.perf_counter() - t0) * 1e3)
        assert out.shape == (Q, K)
        # null-RTT with the same request cadence and payload-in size
        nul = []
        for i in range(REQUESTS // 2):
            ids = ids_pool[i % 8]
            t0 = time.perf_counter()
            np.asarray(null(jnp.asarray(ids)))
            nul.append((time.perf_counter() - t0) * 1e3)
        p, pn = pcts(lat), pcts(nul)
        print(json.dumps({
            "Q": Q, **p, "null_rtt": pn,
            "onchip_est_ms": round(p["p50_ms"] - pn["p50_ms"], 2),
            "qps_at_p50": round(Q / (p["p50_ms"] / 1e3)),
        }))


if __name__ == "__main__":
    main()
