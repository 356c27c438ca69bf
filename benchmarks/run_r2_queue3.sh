#!/bin/bash
# Round-2 TPU queue #3: verify-drive (300-step DLRM, expect eval_auc ~0.736)
# and the bench.py headline refresh.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout "$TIMEOUT" "$@" > "benchmarks/logs/$name.log" 2>&1
  echo "--- $name exit=$? ($(date -u +%H:%M:%S))"
}

TIMEOUT=550 run verify_drive python -u - <<'EOF'
import jax
from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.pipeline import batch_iterator
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings
gen = SyntheticCTR(vocab_size=50_000, seed=0)
train, test = gen.sample(100_000, 1), gen.sample(20_000, 2)
model = DLRM(vocab_size=50_000, embed_dim=16)
loss_fn, eval_fn = make_ctr_task(model)
mesh = make_mesh(MeshSpec(1, 1))
ex = {k: v[:8] for k, v in train.items()}
pshard = param_shardings(model.init(jax.random.PRNGKey(0), ex)["params"], mesh)
tr = Trainer(loss_fn, TrainConfig(log_every=100), mesh=mesh,
             param_shardings=pshard, eval_fn=eval_fn)
state = tr.init_state(lambda: init_model(model, ex))
state, _ = tr.fit(state, batch_iterator(train, 4096, epochs=None), steps=300,
                  log_fn=print)
print("EVAL:", tr.evaluate(state, batch_iterator(test, 4096, shuffle=False)))
EOF
TIMEOUT=400 run bench python -u bench.py
echo "ALL DONE $(date -u +%H:%M:%S)"
TIMEOUT=1500 run pinsage3 python -u benchmarks/bench_models.py pinsage_large
echo "ALL DONE2 $(date -u +%H:%M:%S)"
