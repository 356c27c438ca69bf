"""Measure the marginal cost of an EXTRA jit dispatch per train step.

docs/DESIGN.md once claimed ~50 µs (async-queue amortized) while
RESULTS.md/CLAUDE.md said ~2.5 ms through the axon relay — this experiment
settles it (VERDICT r1 item 10). Method: a tiny device computation (so the
step is dispatch-bound) issued N times back-to-back with ONE scalar sync at
the end — throughput mode, the same way the train loop runs. The marginal
per-dispatch cost is (t_two_jits − t_one_jit) / N.

Run: python benchmarks/exp_dispatch_cost.py   (real TPU)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)

N = 300


@jax.jit
def f(x):
    return x + 1.0


@jax.jit
def g(x):
    return x * 1.0000001


def run(chain: int) -> float:
    x = jnp.zeros((8, 128), jnp.float32)
    # warmup/compile
    for _ in range(3):
        y = f(x)
        if chain == 2:
            y = g(y)
    float(y.sum())
    t0 = time.perf_counter()
    y = x
    for _ in range(N):
        y = f(y)
        if chain == 2:
            y = g(y)
    float(y.sum())
    return (time.perf_counter() - t0) / N


def run_pytree(chain: int, n_leaves: int = 64) -> float:
    """Same measurement with a realistic train-step argument: a state pytree
    of ``n_leaves`` arrays chained through the jit(s). Dispatch cost scales
    with argument marshaling, so the trivial single-array number understates
    what a split train step actually pays."""

    @jax.jit
    def fs(state):
        return {k: v + 1.0 for k, v in state.items()}

    @jax.jit
    def gs(state):
        return {k: v * 1.0000001 for k, v in state.items()}

    state = {f"p{i}": jnp.zeros((8, 128), jnp.float32) for i in range(n_leaves)}
    for _ in range(3):
        state2 = fs(state)
        if chain == 2:
            state2 = gs(state2)
    float(state2["p0"].sum())
    t0 = time.perf_counter()
    s = state
    for _ in range(N):
        s = fs(s)
        if chain == 2:
            s = gs(s)
    float(s["p0"].sum())
    return (time.perf_counter() - t0) / N


def main():
    for tag, fn in (("1-array", run), ("64-leaf pytree", run_pytree)):
        t1 = fn(1)
        t2 = fn(2)
        # interleave once more to cancel drift
        t1b = fn(1)
        t2b = fn(2)
        one = min(t1, t1b)
        two = min(t2, t2b)
        print(f"[{tag}] 1 jit/step : {one * 1e3:.3f} ms")
        print(f"[{tag}] 2 jits/step: {two * 1e3:.3f} ms")
        print(f"[{tag}] marginal extra-dispatch cost: {(two - one) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
