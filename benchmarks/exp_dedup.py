"""Experiment: host-precomputed ID-dedup for the embedding backward.

Zipf-distributed CTR traffic makes lookup ids highly repetitive: the DLRM
batch (8192 x 26 ids into 1M x 16) carries ~213k rows but only ~36k unique
ids (synthetic zipf_a=1.2; real Criteo is comparably skewed). The padded
XLA scatter pays per *row*, so collapsing to unique rows first should win
if the collapse itself is cheap.

Device-side sort-dedup was ruled out earlier (argsort 213k ~3 ms eats the
win — CLAUDE.md perf notes). This experiment instead assumes the HOST ships
a dedup plan with the batch (cheap in the C++ input pipeline):

  perm        [N]      positions sorted by id
  slot_sorted [N]      unique-slot index per sorted position (nondecreasing)
  uniq_ids    [U_cap]  ascending unique ids, padded with 2^30 (dropped)

and the device backward becomes

  cot_sorted = cot[perm]                          (the known 1.3 ms reorder)
  d_uniq = sorted_scatter_add(slot_sorted, cot_sorted, U_cap)   (small dest)
  grad   = sorted_scatter_add(uniq_ids, d_uniq, V)              (U rows only)

`sorted_scatter_add`'s cost is dominated by writing its destination and
reading its update stream, so the segment-sum (dest 2.6 MB) and the final
scatter (36k update rows) should each be well under the 213k-row padded
scatter.

Run: python benchmarks/exp_dedup.py [batch] [zipf_a]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

from recommender_tpu.ops.embedding_kernels import (
    padded_scatter_add,
    sorted_scatter_add,
)

VOCAB = 1_000_000
DIM = 16
NFEAT = 26
STEPS = 50
PAD_ID = np.int32(2**30)


def bench(fn, *args, steps=STEPS):
    out = fn(*args)
    float(jnp.sum(out[:1, :1]))  # axon-safe sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(out[:1, :1]))
    return (time.perf_counter() - t0) / steps * 1e3


def dedup_plan(ids: np.ndarray, u_cap: int):
    """The plan the host pipeline would ship (np.unique stands in here)."""
    uniq, inv = np.unique(ids, return_inverse=True)
    assert uniq.size <= u_cap, (uniq.size, u_cap)
    perm = np.argsort(inv, kind="stable").astype(np.int32)
    slot_sorted = inv[perm].astype(np.int32)
    uniq_p = np.full((u_cap,), PAD_ID, np.int32)
    uniq_p[: uniq.size] = uniq
    return perm, slot_sorted, uniq_p, uniq.size


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    zipf_a = float(sys.argv[2]) if len(sys.argv) > 2 else 1.2
    n = batch * NFEAT
    rng = np.random.default_rng(1)
    ids = (rng.zipf(zipf_a, size=n) % VOCAB).astype(np.int32)
    cot = rng.normal(size=(n, DIM)).astype(np.float32)
    u_cap = ((int(np.unique(ids).size * 1.25) + 8191) // 8192) * 8192

    t0 = time.perf_counter()
    perm, slot_sorted, uniq_p, n_uniq = dedup_plan(ids, u_cap)
    host_ms = (time.perf_counter() - t0) * 1e3
    print(f"n={n} unique={n_uniq} ({n / n_uniq:.1f}x) u_cap={u_cap} "
          f"host np.unique plan: {host_ms:.1f} ms")

    d_ids = jnp.asarray(ids)
    d_cot = jnp.asarray(cot)
    d_perm = jnp.asarray(perm)
    d_slot = jnp.asarray(slot_sorted)
    d_uniq = jnp.asarray(uniq_p)

    t = bench(lambda i, c: padded_scatter_add(i, c, VOCAB), d_ids, d_cot)
    print(f"padded_scatter_add 213k->1M (current bwd): {t:.2f} ms")

    reorder = jax.jit(lambda c, p: jnp.take(c, p, axis=0))
    t = bench(reorder, d_cot, d_perm)
    print(f"reorder cot[perm]:                         {t:.2f} ms")

    segsum = jax.jit(
        lambda s, c, p: sorted_scatter_add(s, c, u_cap, order=p)
    )
    t = bench(segsum, d_slot, d_cot, d_perm)
    print(f"segment-sum (reorder+pallas into {u_cap}): {t:.2f} ms")

    du = segsum(d_slot, d_cot, d_perm)
    final = jax.jit(lambda u, d: sorted_scatter_add(u, d, VOCAB))
    t = bench(final, d_uniq, du)
    print(f"final pallas scatter {n_uniq} rows -> 1M:  {t:.2f} ms")

    final_padded = jax.jit(lambda u, d: padded_scatter_add(u, d, VOCAB))
    t = bench(final_padded, d_uniq % VOCAB, du)  # padded path can't drop pads
    print(f"(alt) padded XLA scatter u_cap rows -> 1M: {t:.2f} ms  [pads hit row 0: bench only]")

    chain = jax.jit(
        lambda c, p, s, u: sorted_scatter_add(
            u, sorted_scatter_add(s, c, u_cap, order=p), VOCAB
        )
    )
    t = bench(chain, d_cot, d_perm, d_slot, d_uniq)
    print(f"FULL dedup chain (bf16-pass DEFAULT):      {t:.2f} ms")

    hi = jax.lax.Precision.HIGHEST
    chain_hi = jax.jit(
        lambda c, p, s, u: sorted_scatter_add(
            u,
            sorted_scatter_add(s, c, u_cap, order=p, precision=hi),
            VOCAB,
            precision=hi,
        )
    )
    t = bench(chain_hi, d_cot, d_perm, d_slot, d_uniq)
    print(f"FULL dedup chain (exact f32 HIGHEST):      {t:.2f} ms")

    # correctness
    want = np.asarray(padded_scatter_add(d_ids, d_cot, VOCAB))
    for name, fn in (("default", chain), ("highest", chain_hi)):
        got = np.asarray(fn(d_cot, d_perm, d_slot, d_uniq))
        err = np.abs(got - want).max()
        rel = err / max(np.abs(want).max(), 1e-9)
        print(f"max |dedup[{name}] - direct| = {err:.2e} (rel {rel:.2e})")


if __name__ == "__main__":
    main()
