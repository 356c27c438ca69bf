"""EXPERIMENT: can jax.experimental.layout pin the big narrow table row-major
inside ONE fused train jit, recovering the split-step win without the second
dispatch?  (See docs/DESIGN.md "narrow-table layout trap".)

Times three DLRM b8192 variants on the real chip:
  split     — current production path (grads jit | apply jit)
  fused     — one jit, XLA free layout (the 14.3 ms baseline)
  fused+pin — one jit, table + Adam moments pinned row-major via Format
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout
from jax.sharding import NamedSharding, PartitionSpec as P

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.ops.embedding_kernels import is_big_narrow_table

BATCH = 8192
VOCAB = 1_000_000
STEPS = 50


def bench(step, state, batch, rng, steps=STEPS):
    state, m = step(state, batch, rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch, rng)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / steps * 1e3, state


def main():
    mesh = make_mesh(MeshSpec(data=len(jax.devices()), model=1))
    gen = SyntheticCTR(vocab_size=VOCAB, seed=0)
    host = gen.sample(BATCH, seed=1)
    model = DLRM(vocab_size=VOCAB, embed_dim=16)
    loss_fn, eval_fn = make_ctr_task(model)

    def make(split):
        cfg = TrainConfig(learning_rate=1e-3, log_every=10**9, eval_every=0,
                          split_step=split)
        tr = Trainer(loss_fn, cfg, mesh=mesh, eval_fn=eval_fn)
        state = tr.init_state(lambda: init_model(model, host))
        return tr, state

    rng = jax.random.PRNGKey(0)

    tr, state = make(True)
    batch = tr.put_batch(host)
    ms, _ = bench(tr._train_step, state, batch, rng)
    print(f"split        : {ms:8.2f} ms")

    tr, state = make(False)
    ms, _ = bench(tr._train_step, state, batch, rng)
    print(f"fused (auto) : {ms:8.2f} ms")

    # fused + pinned layouts: row-major Format on every big narrow leaf of
    # the donated state (params + adam moments), AUTO elsewhere.
    tr, state = make(False)
    rep = NamedSharding(mesh, P())
    row_major = Layout(major_to_minor=(0, 1))

    def fmt_of(x):
        if hasattr(x, "shape") and is_big_narrow_table(x.shape):
            return Format(row_major, rep)
        return rep

    state_fmt = jax.tree.map(fmt_of, state)
    batch_fmt = jax.tree.map(lambda x: tr._batch_sharding, batch)

    step = jax.jit(
        tr._fused_step.__wrapped__,
        donate_argnums=(0,),
        in_shardings=(state_fmt, batch_fmt, rep),
        out_shardings=(state_fmt, None),
    )
    state = jax.device_put(state, state_fmt)
    ms, _ = bench(step, state, batch, rng)
    print(f"fused pinned : {ms:8.2f} ms")


if __name__ == "__main__":
    main()
