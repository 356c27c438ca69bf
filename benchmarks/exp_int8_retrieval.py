"""Int8 corpus scoring vs f32/bf16 on the real chip (retrieval/quantize.py).

Production-shape retrieval: [Q, D] queries against a [V, D] corpus +
top-k, the serving hot loop (`retrieval/eval.py::_topk_scores`,
`export.serve_topk`). v5e peaks: 197 bf16 TFLOP/s, 394 int8 TOPS, and an
int8 corpus is 4× smaller in HBM (the real constraint on corpus-per-chip).

Measures, per dtype: scoring+top-k ms per query batch and queries/s, plus
the int8-vs-f32 top-k overlap on clustered reprs (ranking fidelity at
scale). Throughput mode, float() sync (axon-safe).

Run: python -u benchmarks/exp_int8_retrieval.py [V] [D] [Q]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

from recommender_tpu.retrieval.quantize import _scores_int8


def bench(fn, *args, iters=30):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def big():
    """Single-chip serving at 16M items (int8-only: the f32 corpus would
    be 8.6 GB resident — int8+scales is 2.2 GB, why the quantized bundle
    is the production format). Corpus built and quantized block-by-block
    on device so peak extra f32 is one 1 GB block."""
    V, D, Q, k = 16 * 1024 * 1024, 128, 1024, 10
    B = 2 * 1024 * 1024
    key = jax.random.PRNGKey(0)
    C = 4096

    @jax.jit
    def make_block(key):
        kc, kn, ka = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (C, D)) * 3
        assign = jax.random.randint(ka, (B,), 0, C)
        r = centers[assign] + jax.random.normal(kn, (B, D))
        amax = jnp.max(jnp.abs(r), axis=1)
        scale = amax / 127.0
        q = jnp.clip(jnp.rint(r / jnp.where(scale > 0, scale, 1.0)[:, None]),
                     -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    blocks = [make_block(jax.random.fold_in(key, i)) for i in range(V // B)]
    q_corpus = jnp.concatenate([b[0] for b in blocks])
    scale = jnp.concatenate([b[1] for b in blocks])
    del blocks
    qids = jnp.asarray(np.random.default_rng(0).integers(0, V, Q))
    print(f"int8 corpus resident: {(q_corpus.nbytes + scale.nbytes) / 1e9:.2f} GB"
          f" ({V / 1e6:.0f}M items x {D})")

    fn = jax.jit(lambda qc, s, i: jnp.sum(jax.lax.approx_max_k(
        _scores_int8(qc[i], qc, s), k, recall_target=0.95)[1]))
    t = bench(fn, q_corpus, scale, qids, iters=10)
    print(f"int8 approx_max_k @16M: {t * 1e3:7.2f} ms/batch "
          f"{Q / t:10,.0f} queries/s")


def main():
    if "--big" in sys.argv:
        return big()
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    Q = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    k = 10
    print(f"corpus V={V} D={D}, query batch Q={Q}, top-{k}")

    # clustered corpus generated ON DEVICE (relay transfer is slow), then
    # quantized on host from a small fetch? No — quantize needs the full
    # corpus; compute scales on device instead.
    key = jax.random.PRNGKey(0)
    C = 4096  # clusters

    @jax.jit
    def make_corpus(key):
        kc, kn, ka = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (C, D)) * 3
        assign = jax.random.randint(ka, (V,), 0, C)
        return centers[assign] + jax.random.normal(kn, (V, D))

    corpus = make_corpus(key)

    @jax.jit
    def quantize_dev(r):
        amax = jnp.max(jnp.abs(r), axis=1)
        scale = amax / 127.0
        safe = jnp.where(scale > 0, scale, 1.0)
        q = jnp.clip(jnp.rint(r / safe[:, None]), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    q_corpus, scale = quantize_dev(corpus)
    qids = jnp.asarray(np.random.default_rng(0).integers(0, V, Q))

    def run_f32(corpus, qids):
        sim = corpus[qids] @ corpus.T
        _, idx = jax.lax.top_k(sim, k)
        return idx

    def run_bf16(corpus, qids):
        c = corpus.astype(jnp.bfloat16)
        sim = (c[qids] @ c.T).astype(jnp.float32)
        _, idx = jax.lax.top_k(sim, k)
        return idx

    def run_int8(q_corpus, scale, qids):
        sim = _scores_int8(q_corpus[qids], q_corpus, scale)
        _, idx = jax.lax.top_k(sim, k)
        return idx

    def approx(sim, rt=0.95):
        return jax.lax.approx_max_k(sim, k, recall_target=rt)[1]

    def run_f32_approx(corpus, qids):
        return approx(corpus[qids] @ corpus.T)

    def run_int8_approx(q_corpus, scale, qids):
        return approx(_scores_int8(q_corpus[qids], q_corpus, scale))

    # NOTE bf16 here re-casts the corpus per call (realistic only if the
    # resident corpus is f32); int8 scores from the RESIDENT quantized
    # corpus — the deployment comparison is resident-f32 vs resident-int8.
    variants = {
        "f32  exact sort ": jax.jit(lambda c, i: jnp.sum(run_f32(c, i))),
        "bf16 exact sort ": jax.jit(lambda c, i: jnp.sum(run_bf16(c, i))),
        "f32  approx_max_k": jax.jit(lambda c, i: jnp.sum(run_f32_approx(c, i))),
    }
    times = {}
    for name, fn in variants.items():
        t = bench(fn, corpus, qids)
        times[name] = t
        print(f"{name}: {t * 1e3:7.2f} ms/batch  {Q / t:10,.0f} queries/s")
    for name, fn in (
        ("int8 exact sort ", jax.jit(lambda qc, s, i: jnp.sum(run_int8(qc, s, i)))),
        ("int8 approx_max_k", jax.jit(lambda qc, s, i: jnp.sum(run_int8_approx(qc, s, i)))),
    ):
        t = bench(fn, q_corpus, scale, qids)
        times[name] = t
        print(f"{name}: {t * 1e3:7.2f} ms/batch  {Q / t:10,.0f} queries/s")
    print(f"serving headline (int8+approx vs f32+exact): "
          f"{times['f32  exact sort '] / times['int8 approx_max_k']:.1f}x")
    print(f"corpus residency: f32 {V * D * 4 / 1e9:.2f} GB vs int8+scales "
          f"{(V * D + 4 * V) / 1e9:.2f} GB")

    # ranking fidelity at this scale vs the exact-f32 reduction
    idx_f = jax.jit(run_f32)(corpus, qids)
    for name, idx in (
        ("int8 exact", jax.jit(run_int8)(q_corpus, scale, qids)),
        ("f32 approx", jax.jit(run_f32_approx)(corpus, qids)),
        ("int8 approx", jax.jit(run_int8_approx)(q_corpus, scale, qids)),
    ):
        a, b = np.asarray(idx_f), np.asarray(idx)
        overlap = np.mean([len(set(x) & set(y)) / k for x, y in zip(a, b)])
        top1 = float(np.mean(a[:, 0] == b[:, 0]))
        print(f"top-{k} recall {name} vs exact-f32: {overlap:.3f};"
              f" top-1 agreement {top1:.3f}")


if __name__ == "__main__":
    main()
