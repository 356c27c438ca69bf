"""H2D transfer cost through the axon relay: many small arrays vs one packed.

PinSage e2e at b1024 runs 26.7 ms/step against a 2.7 ms device step; host
sampling is ~2.5 ms amortized — the rest is suspected per-MESSAGE H2D
overhead (a block batch is ~12 small arrays, ~0.5 MB total, multiplexed
over the relay's TCP stream). This measures device_put of the real block
shapes vs one packed buffer of the same bytes.

Run: python -u benchmarks/exp_h2d.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

REPS = 30


def block_arrays(B=1024):
    n = 3 * B
    rng = np.random.default_rng(0)
    a = {
        "nodes": rng.integers(0, 3706, n).astype(np.int32),
        "nbr1": rng.integers(0, 3706, (n, 3)).astype(np.int32),
        "w1": rng.random((n, 3)).astype(np.float32),
        "flat1": rng.integers(0, 3706, 4 * n).astype(np.int32),
        "nbr2": rng.integers(0, 3706, (4 * n, 3)).astype(np.int32),
        "w2": rng.random((4 * n, 3)).astype(np.float32),
        "flat2": rng.integers(0, 3706, 16 * n).astype(np.int32),
        "year": rng.integers(0, 81, n).astype(np.int32),
        "genre": rng.random((n, 18)).astype(np.float32),
        "heads": rng.integers(0, n, B).astype(np.int32),
        "pos": rng.integers(0, n, B).astype(np.int32),
        "neg": rng.integers(0, n, B).astype(np.int32),
    }
    return a


@jax.jit
def _touch(tree):
    # sync must go through a jitted computation + scalar fetch: EAGER ops on
    # the axon platform can hang (measured: device_put + .ravel()[0] sync
    # never returned), and block_until_ready returns early. Summing one
    # element of EVERY leaf forces the whole tree resident.
    return sum(
        l.reshape(-1)[0].astype(jnp.float32)
        for l in jax.tree_util.tree_leaves(tree)
    )


def sync(tree):
    _ = float(_touch(tree))


def main():
    batch = block_arrays()
    total = sum(v.nbytes for v in batch.values())
    print(f"{len(batch)} arrays, {total/1e6:.2f} MB total")

    # warmup
    sync(jax.device_put(batch))

    t0 = time.perf_counter()
    for _ in range(REPS):
        d = jax.device_put(batch)
        sync(d)
    t_many = (time.perf_counter() - t0) / REPS
    print(f"dict of {len(batch)} arrays : {t_many*1e3:.2f} ms/put")

    packed = np.concatenate([v.reshape(-1).view(np.int32) for v in batch.values()])
    sync(jax.device_put(packed))
    t0 = time.perf_counter()
    for _ in range(REPS):
        d = jax.device_put(packed)
        sync(d)
    t_one = (time.perf_counter() - t0) / REPS
    print(f"one packed {packed.nbytes/1e6:.2f} MB array: {t_one*1e3:.2f} ms/put")
    print(f"per-extra-message overhead ~ {(t_many-t_one)/(len(batch)-1)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
