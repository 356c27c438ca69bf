"""Microbenchmarks for the embedding-gradient hot path (one TPU chip).

Compares every scatter-add strategy on the DLRM shape (213k update rows,
D=16, into a 1M x 16 table) — the numbers cited in
``ops/embedding_kernels.py`` and ``docs/DESIGN.md``:

  xla_direct     zeros.at[ids].add(upd)                (slow narrow-row path)
  xla_padded     pad rows to 64 lanes, scatter, slice  (fast-path trick)
  pallas_sorted  sorted-stream scatter-as-matmul kernel (sort already done)
  argsort        device id sort (the cost the host can absorb for free)
  reorder        jnp.take of the cotangent by the sort permutation
  pallas_e2e     argsort + reorder + kernel            (device-sorted total)
  presorted_e2e  reorder + kernel                      (host-sorted total)

Run: ``python benchmarks/bench_kernels.py [batch] [n_features] [dim]``
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from recommender_tpu.ops.embedding_kernels import (
    padded_scatter_add,
    sorted_scatter_add,
)

VOCAB = 1_000_000
STEPS = 50


def bench(fn, *args, steps=STEPS):
    out = fn(*args)
    float(jnp.sum(out[:1, :1]))  # axon-safe sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(out[:1, :1]))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nfeat = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n = batch * nfeat
    rng = np.random.default_rng(0)
    # Zipf-ish ids like Criteo's frequency-ordered vocab
    ids_h = np.minimum(
        (VOCAB * rng.random(n) ** 4).astype(np.int32), VOCAB - 1
    )
    ids = jnp.asarray(ids_h)
    upd = jnp.asarray(rng.normal(size=(n, dim)), jnp.float32)
    order_h = np.argsort(ids_h, kind="stable")
    sids = jnp.asarray(ids_h[order_h])
    order = jnp.asarray(order_h.astype(np.int32))

    print(f"updates={n} rows, D={dim}, table {VOCAB}x{dim}")

    direct = jax.jit(
        lambda i, u: jnp.zeros((VOCAB, dim), jnp.float32).at[i].add(u)
    )
    print(f"xla_direct     : {bench(direct, ids, upd):7.2f} ms")

    padded = jax.jit(lambda i, u: padded_scatter_add(i, u, VOCAB))
    print(f"xla_padded     : {bench(padded, ids, upd):7.2f} ms")

    pallas = jax.jit(lambda s, u: sorted_scatter_add(s, u, VOCAB))
    upd_sorted = jnp.take(upd, order, axis=0)
    print(f"pallas_sorted  : {bench(pallas, sids, upd_sorted):7.2f} ms")

    asort = jax.jit(lambda i: jnp.argsort(i).astype(jnp.int32))
    t = bench(lambda i: jnp.take(i, asort(i), axis=0)[:, None], ids)
    print(f"argsort(+take1): {t:7.2f} ms")

    reorder = jax.jit(lambda u, o: jnp.take(u, o, axis=0))
    print(f"reorder take   : {bench(reorder, upd, order):7.2f} ms")

    e2e = jax.jit(
        lambda i, u: sorted_scatter_add(
            jnp.sort(i), u, VOCAB, order=jnp.argsort(i).astype(jnp.int32)
        )
    )
    print(f"pallas_e2e     : {bench(e2e, ids, upd):7.2f} ms")

    pre = jax.jit(lambda s, u, o: sorted_scatter_add(s, u, VOCAB, order=o))
    print(f"presorted_e2e  : {bench(pre, sids, upd, order):7.2f} ms")

    pre16 = jax.jit(
        lambda s, u, o: sorted_scatter_add(
            s, u, VOCAB, order=o, kernel_dtype=jnp.bfloat16
        )
    )
    print(f"presorted_bf16 : {bench(pre16, sids, upd, order):7.2f} ms")


if __name__ == "__main__":
    main()
