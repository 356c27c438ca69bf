"""Hardware roofline anchors for the step budgets (VERDICT r3 #6).

The DLRM/DIEN/MMOE budgets (RESULTS.md) argue each term is "at its
measured floor for this access pattern" — credible but self-referential.
This experiment measures the ABSOLUTE ceilings once, on-chip, so every
budget term can state "X% of roofline":

* streaming read bandwidth (two-array reduce — no write traffic),
* streaming copy bandwidth (read+write through HBM),
* MXU bf16 matmul TFLOP/s,
* achievable random-row GATHER rate (rows/s, D=16, several id volumes),
* achievable padded-SCATTER rate (the production backward),
* achievable native narrow-scatter rate (the MMOE regime).

v5e spec sheet for reference: 819 GB/s HBM, 197 bf16 TFLOP/s.

Timing: throughput mode, scalar float() sync (axon-safe), 30+ iters.
Run on the real chip: python -u benchmarks/exp_roofline.py
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

SPEC_HBM = 819e9
SPEC_BF16 = 197e12


def bench_scalar(fn, *args, iters=30):
    """Time a jitted scalar-returning fn in throughput mode."""
    float(fn(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc = fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def bench_chain(fn, x, sync, iters=30):
    """Time x -> fn(x) chained (forces materialization of each output)."""
    x = fn(x)
    float(sync(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    float(sync(x))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")

    # ---------------- streaming bandwidth
    n = 128 * 1024 * 1024  # 512 MB per array (amortize dispatch/ramp);
    # generated ON DEVICE — a host transfer of this size crawls through
    # the axon relay (CLAUDE.md: ~117 ms sync put + low relay throughput)
    key = jax.random.PRNGKey(0)
    a = jax.jit(lambda k: jax.random.normal(k, (n,)))(key)
    b = jax.jit(lambda k: jax.random.normal(k, (n,)))(jax.random.fold_in(key, 1))

    read2 = jax.jit(lambda x, y: jnp.sum(x + y))
    t = bench_scalar(read2, a, b, iters=10)
    read_bw = 2 * n * 4 / t
    print(f"read (2-array reduce): {t * 1e3:7.3f} ms  -> {read_bw / 1e9:6.1f} GB/s"
          f"  ({read_bw / SPEC_HBM:.0%} of 819 spec)")

    scale = jax.jit(lambda x: x * 1.0000001)
    sumx = jax.jit(jnp.sum)
    t = bench_chain(scale, a, sumx, iters=10)
    copy_bw = 2 * n * 4 / t
    print(f"copy (read+write)    : {t * 1e3:7.3f} ms  -> {copy_bw / 1e9:6.1f} GB/s"
          f"  ({copy_bw / SPEC_HBM:.0%} of 819 spec)")

    # adam-like multi-stream (read grad+param+m+v, write param+m+v — the
    # table-Adam access pattern, 7 streams of one table):
    nt = 16 * 1024 * 1024  # 64 MB per stream, 448 MB moved
    g, p_, m_, v_ = (jax.jit(lambda k: jax.random.normal(k, (nt,)))(
        jax.random.fold_in(key, 10 + i)) for i in range(4))

    @jax.jit
    def adamish(g, p_, m_, v_):
        m2 = 0.9 * m_ + 0.1 * g
        v2 = 0.999 * v_ + 0.001 * g * g
        p2 = p_ - 1e-3 * m2 / (jnp.sqrt(v2) + 1e-8)
        return p2, m2, v2

    def chain(iters=30):
        nonlocal p_, m_, v_
        for _ in range(iters):
            p_, m_, v_ = adamish(g, p_, m_, v_)
        return p_

    float(jnp.sum(chain(1)[:1]))
    t0 = time.perf_counter()
    out = chain()
    float(jnp.sum(out[:1]))
    t = (time.perf_counter() - t0) / 30
    adam_bw = 7 * nt * 4 / t
    print(f"adam-like 7-stream   : {t * 1e3:7.3f} ms  -> {adam_bw / 1e9:6.1f} GB/s"
          f"  ({adam_bw / SPEC_HBM:.0%} of 819 spec)")
    copy_bw = max(copy_bw, read_bw, adam_bw)  # best measured streaming anchor

    # ---------------- MXU
    k = 8192
    w = jnp.asarray(rng.standard_normal((k, k)) / np.sqrt(k), jnp.bfloat16)
    mm = jax.jit(lambda x: (x @ w).astype(jnp.bfloat16))
    z = jnp.asarray(rng.standard_normal((k, k)), jnp.bfloat16)
    t = bench_chain(mm, z, lambda x: jnp.sum(x.astype(jnp.float32)))
    flops = 2 * k**3 / t
    print(f"bf16 matmul {k}x{k}  : {t * 1e3:7.3f} ms  -> {flops / 1e12:6.1f} TFLOP/s"
          f"  ({flops / SPEC_BF16:.0%} of 197 spec)")

    # int8 requantizing chain — the serving-path MXU ceiling (v5e spec 394)
    w8 = jax.jit(lambda k_: jax.random.randint(
        k_, (k, k), -127, 128, dtype=jnp.int32).astype(jnp.int8))(key)
    z8 = jax.jit(lambda k_: jax.random.randint(
        k_, (k, k), -127, 128, dtype=jnp.int32).astype(jnp.int8))(
        jax.random.fold_in(key, 30))
    mm8 = jax.jit(lambda x: jnp.clip(jax.lax.dot_general(
        x, w8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32) >> 8, -127, 127).astype(jnp.int8))
    t = bench_chain(mm8, z8, lambda x: jnp.sum(x.astype(jnp.float32)))
    tops = 2 * k**3 / t
    print(f"int8 matmul {k}x{k}  : {t * 1e3:7.3f} ms  -> {tops / 1e12:6.1f} TOPS"
          f"  ({tops / 394e12:.0%} of 394 spec)")

    # ---------------- random-row gather (D=16, 1M-row table)
    V, D = 1_000_000, 16
    table = jax.jit(lambda k: jax.random.normal(k, (V, D)))(jax.random.fold_in(key, 20))
    print(f"gather rows from {V}x{D} f32 (uniform random ids):")
    best_gather = 0.0
    for n_ids in (213_000, 1_000_000, 4_000_000):
        ids = jnp.asarray(rng.integers(0, V, n_ids), jnp.int32)
        g = jax.jit(lambda t_, i: jnp.sum(jnp.take(t_, i, axis=0)[:, :1]))
        t = bench_scalar(g, table, ids)
        rate = n_ids / t
        best_gather = max(best_gather, rate)
        print(f"  n={n_ids:9,d}: {t * 1e3:7.3f} ms -> {rate / 1e6:7.1f} M rows/s"
              f"  ({rate * D * 4 / 1e9:6.1f} GB/s of row payload)")
    print(f"  best-case gather anchor: {best_gather / 1e6:.1f} M rows/s")

    # ---------------- padded scatter-add (the production backward)
    from recommender_tpu.ops.embedding_kernels import padded_scatter_add

    print(f"padded scatter-add into {V}x{D} (64-lane dest):")
    best_scatter = 0.0
    for n_ids in (213_000, 1_000_000):
        ids = jnp.asarray(rng.integers(0, V, n_ids), jnp.int32)
        upd = jax.jit(lambda k: jax.random.normal(k, (n_ids, D)))(
            jax.random.fold_in(key, 21))
        s = jax.jit(lambda i, u: jnp.sum(padded_scatter_add(i, u, V)[:1, :1]))
        t = bench_scalar(s, ids, upd)
        rate = n_ids / t
        best_scatter = max(best_scatter, rate)
        print(f"  n={n_ids:9,d}: {t * 1e3:7.3f} ms -> {rate / 1e6:7.1f} M rows/s")
    print(f"  best-case padded-scatter anchor: {best_scatter / 1e6:.1f} M rows/s")

    # ---------------- native narrow scatter (MMOE regime: 8192 ids, 100k x 18)
    Vm, Dm = 100_000, 18
    idsm = jnp.asarray(rng.integers(0, Vm, 8192), jnp.int32)
    updm = jax.jit(lambda k: jax.random.normal(k, (8192, Dm)))(
        jax.random.fold_in(key, 22))
    sn = jax.jit(
        lambda i, u: jnp.sum(jnp.zeros((Vm, Dm), jnp.float32).at[i].add(u)[:1, :1])
    )
    t = bench_scalar(sn, idsm, updm)
    print(f"native narrow scatter 8192 ids into {Vm}x{Dm}: {t * 1e3:7.3f} ms"
          f" -> {8192 / t / 1e6:6.1f} M rows/s")

    # ---------------- roofline table for the recorded budget terms
    print("\nroofline readings for the budget terms (terms from RESULTS.md):")
    terms = [
        # name, measured ms, kind, volume
        ("DLRM gather 213k x16", 1.47, "rows", 213_000),
        ("DLRM padded scatter 213k (in-step 3.5-4)", 3.75, "rows", 213_000),
        ("DLRM table Adam 1Mx16 (448 MB)", 1.34, "bytes", 448e6),
        ("DIEN embed f+b 6 lookups (2x102k+2x1k rows)", 6.49, "rows", 2 * 103_000),
        ("MMOE 18 native scatters (~0.42 each)", 7.65, "rows", 18 * 8192),
    ]
    for name, ms, kind, vol in terms:
        if kind == "bytes":
            ach = vol / (ms * 1e-3)
            print(f"  {name:46s} {ms:5.2f} ms = {ach / 1e9:6.1f} GB/s"
                  f" = {ach / copy_bw:5.1%} of measured copy BW,"
                  f" {ach / SPEC_HBM:5.1%} of spec")
        else:
            ach = vol / (ms * 1e-3)
            print(f"  {name:46s} {ms:5.2f} ms = {ach / 1e6:6.1f} M rows/s"
                  f" = {ach / best_gather:5.1%} of best gather rate,"
                  f" {ach / best_scatter:5.1%} of best padded-scatter rate")


if __name__ == "__main__":
    main()
