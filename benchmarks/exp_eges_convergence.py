"""GES/EGES convergence tax vs BGE, and the per-table-LR fix (VERDICT r1 #9).

Diagnosis: GES/EGES form hidden = mean(id, cat, brand) embeddings
(/root/reference/eges/model.py:58-102 semantics), so a single Adam step
moves each table ~lr but the hidden only ~lr/3 of item-specific signal —
measured as ~4x BGE's steps to the AUC floor (benchmarks/RESULTS.md).
Fix under test: TrainConfig.lr_scales multiplies the three input tables'
post-Adam updates by 3 (gradient scaling alone is a no-op under Adam —
tests/test_lr_scales.py). Reference semantics stay the default (scale 1).

Run: python benchmarks/exp_eges_convergence.py [total_steps] [chunk] [set]
``set``: ``up`` (default — the lr>1 sweep) or ``down``. Prints an
AUC-vs-steps curve per variant and steps-to-0.98.

MEASURED (16k steps, v5e, 2026-08-20): the r1-VERDICT hypothesis
(up-scale the averaged tables) is REFUTED — GES is not slow to start
(0.953 AUC at 2k steps vs BGE 0.972); it COLLAPSES mid-training (0.72 at
4k) and re-converges. Scaling updates up deepens the collapse
(lr1.5: 0.59 at 4k, no 0.98 by 16k; lr2: worse). The ``down`` set tests
the opposite: damping the *shared* cat/brand tables, whose early aligned
gradients are the suspected destabilizer.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.graph.store import WeightedGraph
from recommender_tpu.graph.walks import skipgram_batches
from recommender_tpu.models.eges import EGES, GES, DeepWalk
from recommender_tpu.models.tasks import init_model, link_prediction_auc, make_skipgram_task

print = functools.partial(print, flush=True)

def side_scales(s: float) -> dict:
    return {"id_embedding": s, "cat_embedding": s, "brand_embedding": s}


def build_graph(seed=0):
    rng = np.random.default_rng(seed)
    V, C = 20_000, 64
    comm = rng.integers(0, C, V)
    src, dst = [], []
    for v in range(1, V):
        pool = np.where(comm == comm[v])[0]
        pool = pool[pool > 0]
        for u in rng.choice(pool, size=8):
            if u != v:
                src += [v, int(u)]
                dst += [int(u), v]
    g = WeightedGraph.from_edges(src, dst, num_nodes=V)
    side = {"cat": (comm + 1).astype(np.int32),
            "brand": rng.integers(1, 100, V).astype(np.int32)}
    side["cat"][0] = 0
    qs = rng.integers(1, V, 20000)
    ps, ns = [], []
    for q in qs:
        pool = np.where(comm == comm[q])[0]
        pool = pool[pool > 0]
        ps.append(int(rng.choice(pool)))
        ns.append(int(rng.integers(1, V)))
    triples = {"query": qs.astype(np.int32), "pos": np.array(ps, np.int32),
               "neg": np.array(ns, np.int32)}
    triples_side = dict(triples)
    for role in ("query", "pos", "neg"):
        for nm, arr in side.items():
            triples_side[f"{role}_{nm}"] = arr[triples[role]]
    return g, side, triples, triples_side


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    V, C = 20_000, 64
    g, side, triples, triples_side = build_graph()
    mesh = make_mesh(MeshSpec(1, 1))

    # A 4000-node CPU pilot showed scale 3.0 can DIVERGE (AUC → 0.5 after
    # 1k steps: effective lr 9e-3 blows up the sampled-softmax logits), so
    # the sweep brackets the stable region instead of betting on 3.
    def ges_(): return GES(vocab_size=V, cat_vocab=C + 1, brand_vocab=100, embed_dim=64)
    def eges_(): return EGES(vocab_size=V, cat_vocab=C + 1, brand_vocab=100, embed_dim=64)
    def shared_scales(s: float) -> dict:
        return {"cat_embedding": s, "brand_embedding": s}

    which = sys.argv[3] if len(sys.argv) > 3 else "up"
    if which == "up":
        variants = [
            ("bge", DeepWalk(vocab_size=V, embed_dim=64), False, None),
            ("ges", ges_(), True, None),
            ("ges+lr1.5", ges_(), True, side_scales(1.5)),
            ("ges+lr2", ges_(), True, side_scales(2.0)),
            ("ges+lr3", ges_(), True, side_scales(3.0)),
            ("eges", eges_(), True, None),
            ("eges+lr2", eges_(), True, side_scales(2.0)),
        ]
    else:
        variants = [
            ("ges+sh0.5", ges_(), True, shared_scales(0.5)),
            ("ges+sh0.25", ges_(), True, shared_scales(0.25)),
            ("ges+sh0.1", ges_(), True, shared_scales(0.1)),
            ("eges+sh0.25", eges_(), True, shared_scales(0.25)),
        ]
    for name, model, use_side, scales in variants:
        loss_fn, eval_fn = make_skipgram_task(model)
        it = skipgram_batches(g, batch_size=2048, walks_per_round=256,
                              side_info=side if use_side else None, seed=0)
        cfg = TrainConfig(learning_rate=3e-3, log_every=10**9, lr_scales=scales)
        tr = Trainer(loss_fn, cfg, mesh=mesh, eval_fn=eval_fn)
        state = tr.init_state(lambda: init_model(model, next(it)))
        curve = []
        hit = None
        t0 = time.perf_counter()
        for s in range(chunk, total + 1, chunk):
            state, _ = tr.fit(state, it, steps=chunk)
            auc = float(link_prediction_auc(
                model, state.params, triples_side if use_side else triples))
            curve.append((s, auc))
            if hit is None and auc >= 0.98:
                hit = s
        dt = time.perf_counter() - t0
        pts = " ".join(f"{s}:{a:.4f}" for s, a in curve)
        print(f"{name:9s} steps-to-0.98: {hit}  ({dt:.0f}s)  curve: {pts}")


if __name__ == "__main__":
    main()
