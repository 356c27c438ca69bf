"""bf16-stored embedding table + stochastic rounding: quality and step time.

VERDICT r2 #1: the bf16-stored table measures 7.66 ms / 1.07M ex/s (+17%)
but costs early-training AUC (0.736 -> 0.700 at the 300-step synthetic
fingerprint) from deterministic round-to-nearest on sub-ulp Adam updates.
This experiment measures whether stochastic rounding (core/optim.py)
closes the quality gap while keeping the step-time win.

Variants (same seeds/data as .claude/skills/verify — the 300-step f32
fingerprint is the known 0.736):

  f32        — baseline (param f32, optax.adam)
  bf16_rtn   — bf16 table, plain optax.adam + RTN writes (the r2 regression)
  bf16_sr    — bf16 table, adam_sr + SR param/moment writes (bf16 moments)
  bf16_sr_m32— bf16 table, adam_sr with f32 moment storage (isolates the
               moment-staleness contribution from the param-write rounding)

Each prints a JSON line with the 300-step fingerprint AUC, a longer-horizon
(3k-step, DLRM-scale vocab) AUC, and the b8192 step time on the real chip.

Run: timeout 1800 python -u benchmarks/exp_bf16_sr.py [variant ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.pipeline import batch_iterator
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings

VARIANTS = {
    # (embed_param_dtype, stochastic_round, moment_dtype)
    "f32": (jnp.float32, False, None),
    "bf16_rtn": (jnp.bfloat16, False, None),
    "bf16_sr": (jnp.bfloat16, True, None),
    "bf16_sr_m32": (jnp.bfloat16, True, "float32"),
}


def make_trainer(vocab, dtype, sr, mdt, lr=1e-3):
    model = DLRM(vocab_size=vocab, embed_dim=16, embed_param_dtype=dtype)
    loss_fn, eval_fn = make_ctr_task(model)
    mesh = make_mesh(MeshSpec(1, 1))
    cfg = TrainConfig(learning_rate=lr, log_every=10**9, eval_every=0,
                      stochastic_round=sr, moment_dtype=mdt)
    gen_ex = SyntheticCTR(vocab_size=vocab, seed=0).sample(8, seed=9)
    pshard = param_shardings(
        model.init(jax.random.PRNGKey(0), gen_ex)["params"], mesh
    )
    tr = Trainer(loss_fn, cfg, mesh=mesh, param_shardings=pshard, eval_fn=eval_fn)
    state = tr.init_state(lambda: init_model(model, gen_ex))
    return model, tr, state


def fingerprint_300(dtype, sr, mdt):
    """The verify-skill 300-step fingerprint (vocab 50k, b4096)."""
    gen = SyntheticCTR(vocab_size=50_000, seed=0)
    train, test = gen.sample(100_000, 1), gen.sample(20_000, 2)
    _, tr, state = make_trainer(50_000, dtype, sr, mdt)
    state, _ = tr.fit(state, batch_iterator(train, 4096, epochs=None), steps=300)
    ev = tr.evaluate(state, batch_iterator(test, 4096, shuffle=False), exact=True)
    return ev


def quality_3k(dtype, sr, mdt):
    """DLRM-scale 3k-step run (vocab 200k, b4096 — quality_runs.run_dlrm)."""
    gen = SyntheticCTR(vocab_size=200_000, seed=0)
    train = gen.sample(2_000_000, seed=1)
    test = gen.sample(100_000, seed=2)
    _, tr, state = make_trainer(200_000, dtype, sr, mdt)
    state, _ = tr.fit(state, batch_iterator(train, 4096, epochs=None), steps=3000)
    return tr.evaluate(state, batch_iterator(test, 8192, shuffle=False), exact=True)


def step_time(dtype, sr, mdt, batch=8192, vocab=1_000_000, steps=100):
    """Headline-shape step time (bench.py: b8192, 1M x 16 table)."""
    _, tr, state = make_trainer(vocab, dtype, sr, mdt)
    host = SyntheticCTR(vocab_size=vocab, seed=0).sample(batch, seed=1)
    dev = tr.put_batch(host)
    rng = jax.random.PRNGKey(0)
    step = tr._train_step
    for _ in range(10):
        state, m = step(state, dev, rng)
    float(m["loss"])  # axon-safe sync
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, dev, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    return dt


def main():
    which = sys.argv[1:] or list(VARIANTS)
    for name in which:
        dtype, sr, mdt = VARIANTS[name]
        ev300 = fingerprint_300(dtype, sr, mdt)
        dt = step_time(dtype, sr, mdt)
        ev3k = quality_3k(dtype, sr, mdt)
        print(json.dumps({
            "variant": name,
            "auc_300": round(ev300["eval_auc_exact"], 4),
            "auc_3k": round(ev3k["eval_auc_exact"], 4),
            "loss_3k": round(ev3k["eval_loss"], 4),
            "step_ms_b8192": round(dt * 1e3, 3),
            "ex_per_s": round(8192 / dt, 0),
        }), flush=True)


if __name__ == "__main__":
    main()
