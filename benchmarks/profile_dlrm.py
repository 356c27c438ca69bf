"""Breakdown of the DLRM train-step time on TPU (where do 14.5 ms go?).

Times jitted variants in throughput mode (sync once per N steps, axon-safe):
  full        — the real train step (fwd+bwd+adam)
  fwd         — loss forward only
  grads       — fwd+bwd, no optimizer
  no_embed    — full step with vocab=8 (embedding cost removed)
  gather_only — 213k-row gather from the 1M x 16 table
  scatter_only— 213k-row scatter-add into 1M x 16 (as in-step bwd would)
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
import optax

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings

BATCH = 8192
VOCAB = 1_000_000
STEPS = 50


def bench(fn, *args, steps=STEPS, sync):
    out = fn(*args)
    _ = sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    mesh = make_mesh(MeshSpec(data=len(jax.devices()), model=1))
    gen = SyntheticCTR(vocab_size=VOCAB, seed=0)
    host = gen.sample(BATCH, seed=1)

    def build(vocab):
        model = DLRM(vocab_size=vocab, embed_dim=16)
        loss_fn, eval_fn = make_ctr_task(model)
        cfg = TrainConfig(learning_rate=1e-3, log_every=10**9, eval_every=0)
        example = {k: v[:8] for k, v in host.items()}
        var_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), example))
        pshard = param_shardings(var_shapes["params"], mesh)
        trainer = Trainer(loss_fn, cfg, mesh=mesh, param_shardings=pshard, eval_fn=eval_fn)
        state = trainer.init_state(lambda: init_model(model, example))
        return model, loss_fn, trainer, state

    model, loss_fn, trainer, state = build(VOCAB)
    b = trainer.put_batch(host)
    rng = jax.random.PRNGKey(0)

    # full step: chain state through to keep the dependency real
    def run_full(steps):
        nonlocal state
        s = state
        for _ in range(steps):
            s, m = trainer._train_step(s, b, rng)
        state = s
        return m["loss"]

    run_full(1)
    float(run_full(1))
    t0 = time.perf_counter()
    loss = run_full(STEPS)
    float(loss)
    full_ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"full step        : {full_ms:8.2f} ms")

    @jax.jit
    def fwd(params, batch):
        per_ex, aux, _ = loss_fn(params, {}, batch, rng, True)
        return jnp.mean(per_ex)

    print(f"fwd only         : {bench(fwd, state.params, b, sync=float):8.2f} ms")

    @jax.jit
    def grads(params, batch):
        g = jax.grad(lambda p: jnp.mean(loss_fn(p, {}, batch, rng, True)[0]))(params)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x[:1] if x.ndim else x), g, 0.0
        )

    print(f"fwd+bwd          : {bench(grads, state.params, b, sync=float):8.2f} ms")

    # embedding-free variant
    host_small = dict(host, cat_features=(host["cat_features"] % 8))
    model2, loss2, trainer2, state2 = build(8)
    b2 = trainer2.put_batch(host_small)

    def run_small(steps):
        nonlocal state2
        s = state2
        for _ in range(steps):
            s, m = trainer2._train_step(s, b2, rng)
        state2 = s
        return m["loss"]

    float(run_small(1))
    t0 = time.perf_counter()
    float(run_small(STEPS))
    print(f"full, vocab=8    : {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms")

    table = jnp.asarray(np.random.default_rng(0).normal(size=(VOCAB, 16)), jnp.float32)
    ids = jnp.asarray(host["cat_features"].reshape(-1), jnp.int32)
    upd = jnp.asarray(
        np.random.default_rng(1).normal(size=(ids.shape[0], 16)), jnp.float32
    )

    @jax.jit
    def gather_only(t, i):
        return jnp.sum(jnp.take(t, i, axis=0)[:, :1])

    print(f"gather 213k      : {bench(gather_only, table, ids, sync=float):8.2f} ms")

    @jax.jit
    def scatter_only(i, u):
        return jnp.sum(
            jnp.zeros((VOCAB, 16), jnp.float32).at[i].add(u)[:1, :1]
        )

    print(f"scatter 213k     : {bench(scatter_only, ids, upd, sync=float):8.2f} ms")

    # adam over the table alone
    opt = optax.adam(1e-3)
    ostate = opt.init(table)

    @jax.jit
    def adam_step(t, os, g):
        up, os2 = opt.update(g, os, t)
        t2 = optax.apply_updates(t, up)
        return t2[0, 0]

    g_dense = jnp.zeros((VOCAB, 16), jnp.float32)
    print(f"adam 1Mx16       : {bench(adam_step, table, ostate, g_dense, sync=float):8.2f} ms")


if __name__ == "__main__":
    main()
