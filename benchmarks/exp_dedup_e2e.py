"""End-to-end: DLRM b8192 train step with vs without the host dedup plan.

Same harness as bench.py (split grads|optimizer step, padded-scatter
custom-VJP lookup); the dedup variant attaches the per-batch plan
(data/pipeline.with_dedup_plans) so the table backward runs
ops.embedding_kernels.embedding_lookup_dedup. Kernel-level numbers:
benchmarks/exp_dedup.py.

Run: python benchmarks/exp_dedup_e2e.py [batch] [steps] [bf16]

The optional ``bf16`` arg re-runs the comparison with the bf16-stored
table + auto-SR (the bench.py headline config): at bf16 the step is a
single fused jit and the padded scatter halves its bytes, so the dedup
plan's segment-sum overhead competes against a smaller baseline term —
measured to check whether the r2 f32 verdict (0.92x, dedup off) flips.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.pipeline import with_dedup_plans
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings

print = functools.partial(print, flush=True)

VOCAB = 1_000_000


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    bf16 = "bf16" in sys.argv[3:]
    import jax.numpy as jnp

    mesh = make_mesh(MeshSpec(data=1, model=1))
    model = DLRM(vocab_size=VOCAB, embed_dim=16,
                 embed_param_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    print(f"table dtype: {'bf16+SR' if bf16 else 'f32'}")
    gen = SyntheticCTR(vocab_size=VOCAB, seed=0)
    host = gen.sample(batch_size, seed=1)

    loss_fn, eval_fn = make_ctr_task(model)
    cfg = TrainConfig(learning_rate=1e-3, log_every=10**9, eval_every=0)
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), {k: v[:8] for k, v in host.items()})
    )
    pshard = param_shardings(var_shapes["params"], mesh)
    trainer = Trainer(loss_fn, cfg, mesh=mesh, param_shardings=pshard, eval_fn=eval_fn)
    state = trainer.init_state(
        lambda: init_model(model, {k: v[:8] for k, v in host.items()})
    )
    rng = jax.random.PRNGKey(0)

    def run(tag, host_batch):
        nonlocal state
        batch = trainer.put_batch(host_batch)
        state, m = trainer._train_step(state, batch, rng)  # compile
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = trainer._train_step(state, batch, rng)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / steps
        print(f"{tag}: {dt * 1e3:.2f} ms/step, {batch_size / dt:,.0f} ex/s")
        return dt

    t_plain = run("baseline (padded-scatter bwd)", host)

    t0 = time.perf_counter()
    (planned,) = list(with_dedup_plans(iter([host])))
    print(f"host plan: {(time.perf_counter() - t0) * 1e3:.1f} ms "
          f"(u_cap {planned['cat_dedup']['uniq'].size})")
    t_dedup = run("dedup    (plan-driven bwd)   ", planned)
    print(f"speedup: {t_plain / t_dedup:.2f}x")


if __name__ == "__main__":
    main()
