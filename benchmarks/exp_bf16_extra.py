"""bf16+SR follow-up probes referenced in RESULTS.md (r3):

  batches  — b16384/b32768 step time (fixed-cost amortization on top of bf16)
  vocab10m — 10M x 16 table single-chip reference point (the row-gated
             native backward; padded would be ~+20 ms at this dest size)
  horizon  — 10k-step f32 vs bf16+SR exact AUC (the overfitting-regime
             check; both variants degrade together)

Run: timeout 3000 python -u benchmarks/exp_bf16_extra.py [batches|vocab10m|horizon]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from exp_bf16_sr import VARIANTS, make_trainer, step_time


def batches():
    for b in (16384, 32768):
        dt = step_time(jnp.bfloat16, True, None, batch=b)
        print(json.dumps({"variant": f"bf16_sr_b{b}", "step_ms": round(dt * 1e3, 3),
                          "ex_per_s": round(b / dt, 0)}), flush=True)


def vocab10m():
    for name, dtype, sr in (("f32_10m", jnp.float32, False),
                            ("bf16_sr_10m", jnp.bfloat16, True)):
        dt = step_time(dtype, sr, None, batch=8192, vocab=10_000_000)
        print(json.dumps({"variant": name, "step_ms": round(dt * 1e3, 3),
                          "ex_per_s": round(8192 / dt, 0)}), flush=True)


def horizon(steps=10_000):
    from recommender_tpu.data.pipeline import batch_iterator
    from recommender_tpu.data.synthetic import SyntheticCTR

    for name in ("f32", "bf16_sr"):
        dtype, sr, mdt = VARIANTS[name]
        gen = SyntheticCTR(vocab_size=200_000, seed=0)
        train = gen.sample(2_000_000, seed=1)
        test = gen.sample(100_000, seed=2)
        _, tr, state = make_trainer(200_000, dtype, sr, mdt)
        state, _ = tr.fit(state, batch_iterator(train, 4096, epochs=None), steps=steps)
        ev = tr.evaluate(state, batch_iterator(test, 8192, shuffle=False), exact=True)
        print(json.dumps({"variant": name,
                          "auc_exact": round(ev["eval_auc_exact"], 4),
                          "loss": round(ev["eval_loss"], 4),
                          "steps": steps}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["batches", "vocab10m", "horizon"]
    for name in which:
        {"batches": batches, "vocab10m": vocab10m, "horizon": horizon}[name]()
