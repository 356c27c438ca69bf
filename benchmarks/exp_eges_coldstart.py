"""Cold-start link prediction: the regime where the reference's
EGES > GES > BGE ordering actually comes from.

The standard synthetic quality graph is SATURATED by the id embedding
alone (all variants ~0.992 exact AUC — RESULTS.md r3 quality section), so
it cannot reproduce the reference's ordering (side info helping on sparse
Amazon data, /root/reference/eges/README.md:9-13). This experiment builds
the sparse regime deliberately:

* 19k WARM nodes with ~8 intra-community edges each (as before);
* 1k COLD nodes with ZERO edges — they never appear in any walk, so
  their id embeddings stay at init (the true new-item cold start; a
  first design with one edge per cold node FAILED to isolate the regime:
  walks STARTING at a 1-edge node already generate enough skip-gram
  pairs to train its id embedding — BGE scored 0.9933 on those "cold"
  queries, logs/eges_coldstart_run1.log);
* side info: cat = community (predictive), brand = uniform noise (a
  distractor EGES's learned per-node attention can down-weight but GES's
  fixed mean cannot — though for never-seen nodes the attention row is
  also at init, so EGES ≈ GES is the expected cold ceiling).

Eval: exact link-pred AUC on (a) warm queries, (b) cold queries against
same-community positives. Expected: BGE collapses on cold (nothing to
generalize from), GES recovers via cat, EGES ≥ GES by attending away
from the noise brand. All runs use the damped shared-table regime
(--shared_lr_scale 0.5 — the r2-measured stable configuration).

Run: timeout 3600 python -u benchmarks/exp_eges_coldstart.py [steps]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.graph.store import WeightedGraph
from recommender_tpu.graph.walks import skipgram_batches
from recommender_tpu.models.eges import EGES, GES, DeepWalk
from recommender_tpu.models.tasks import (
    init_model,
    link_prediction_auc,
    make_skipgram_task,
)


def build(seed=0, V=20_000, C=64, n_cold=1000):
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, C, V)
    cold = rng.choice(np.arange(1, V), size=n_cold, replace=False)
    is_cold = np.zeros(V, bool)
    is_cold[cold] = True
    src, dst = [], []
    for v in range(1, V):
        if is_cold[v]:
            continue  # zero edges: never enters a walk
        pool = np.where((comm == comm[v]) & ~is_cold)[0]
        pool = pool[pool > 0]
        picks = rng.choice(pool, size=8)
        for u in picks:
            if u != v:
                src += [v, int(u)]
                dst += [int(u), v]
    g = WeightedGraph.from_edges(src, dst, num_nodes=V)
    side = {
        "cat": (comm + 1).astype(np.int32),  # predictive
        "brand": rng.integers(1, 100, V).astype(np.int32),  # pure noise
    }
    side["cat"][0] = 0

    def triples(queries, n=10_000):
        qs = rng.choice(queries, size=n)
        ps, ns = [], []
        for q in qs:
            pool = np.where((comm == comm[q]) & ~is_cold)[0]
            pool = pool[pool > 0]
            ps.append(int(rng.choice(pool)))
            ns.append(int(rng.integers(1, V)))
        t = {"query": qs.astype(np.int32), "pos": np.array(ps, np.int32),
             "neg": np.array(ns, np.int32)}
        for role in ("query", "pos", "neg"):
            for nm, arr in side.items():
                t[f"{role}_{nm}"] = arr[t[role]]
        return t

    warm_nodes = np.where(~is_cold)[0]
    warm_nodes = warm_nodes[warm_nodes > 0]
    return g, side, triples(warm_nodes), triples(cold)


def main(steps=16_000):
    g, side, warm_t, cold_t = build()
    V, C = 20_000, 64
    damped = {"cat_embedding": 0.5, "brand_embedding": 0.5}
    variants = [
        ("bge", DeepWalk(vocab_size=V, embed_dim=64), False, None),
        ("ges", GES(vocab_size=V, cat_vocab=C + 1, brand_vocab=100, embed_dim=64),
         True, damped),
        ("eges", EGES(vocab_size=V, cat_vocab=C + 1, brand_vocab=100, embed_dim=64),
         True, damped),
    ]
    mesh = make_mesh(MeshSpec(len(jax.devices()), 1))
    for name, model, use_side, scales in variants:
        loss_fn, eval_fn = make_skipgram_task(model)
        it = skipgram_batches(g, batch_size=2048, walks_per_round=256,
                              side_info=side if use_side else None, seed=0)
        tr = Trainer(loss_fn, TrainConfig(learning_rate=3e-3, log_every=10**9,
                                          lr_scales=scales),
                     mesh=mesh, eval_fn=eval_fn)
        state = tr.init_state(lambda: init_model(model, next(it)))
        state, _ = tr.fit(state, it, steps=steps)
        def strip(t):
            if use_side:
                return t
            return {k: t[k] for k in ("query", "pos", "neg")}
        warm = link_prediction_auc(model, state.params, strip(warm_t))
        cold = link_prediction_auc(model, state.params, strip(cold_t))
        print(json.dumps({"variant": name, "steps": steps,
                          "auc_warm": round(warm, 4),
                          "auc_cold": round(cold, 4)}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16_000)
