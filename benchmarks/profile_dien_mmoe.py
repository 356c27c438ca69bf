"""Step-time budgets for DIEN b1024/T100 and MMOE b8192 (VERDICT r2 #6 —
the DLRM-style term-by-term attribution the other two flagship steps
lacked). Times jitted variants in throughput mode (axon-safe float sync).

DIEN terms: full / fwd / fwd+bwd / full with tiny vocab (embedding cost
removed) / recurrence-only fwd+bwd (GRU->attention->AUGRU on random
inputs) / embedding-only fwd+bwd (the 3 embed() call pairs).

MMOE terms: full / fwd / fwd+bwd / full with tiny vocab / embedder-only
fwd+bwd (18 per-table gather+scatter chains) / adam-over-tables-only.

Run: timeout 1800 python -u benchmarks/profile_dien_mmoe.py [dien|mmoe]
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
from recommender_tpu.models.tasks import init_model

STEPS = 30


def bench(fn, *args, steps=STEPS):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / steps * 1e3


def bench_full(trainer, state, batch, rng, steps=STEPS):
    # the step donates `state`, so the caller's buffers are dead after
    # this — return the live final state alongside the timing
    s = state
    s, m = trainer._train_step(s, batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        s, m = trainer._train_step(s, batch, rng)
    float(m["loss"])
    return (time.perf_counter() - t0) / steps * 1e3, s


def profile_dien(B=1024, T=100):
    from recommender_tpu.data.synthetic import SyntheticSequence
    from recommender_tpu.models.dien import DIEN
    from recommender_tpu.models.tasks import make_aux_loss_task

    mesh = make_mesh(MeshSpec(len(jax.devices()), 1))
    rng = jax.random.PRNGKey(0)

    def build(num_items, num_cats, shared_gather=False):
        gen = SyntheticSequence(num_items=num_items, num_cats=num_cats,
                                max_len=T, seed=0)
        host = gen.sample(B, seed=1)
        model = DIEN(item_vocab=num_items, cat_vocab=num_cats,
                     shared_gather=shared_gather)
        loss_fn, eval_fn = make_aux_loss_task(model)
        tr = Trainer(loss_fn, TrainConfig(), mesh=mesh, eval_fn=eval_fn)
        state = tr.init_state(
            lambda: init_model(model, {k: v[:8] for k, v in host.items()}))
        return model, loss_fn, tr, state, tr.put_batch(host)

    model, loss_fn, tr, state, b = build(400_000, 1500)
    t_full, state = bench_full(tr, state, b, rng)
    print(f"dien full (3-gather default): {t_full:8.2f} ms")

    _, _, trs, states, bs = build(400_000, 1500, shared_gather=True)
    t_sh, _ = bench_full(trs, states, bs, rng)
    print(f"dien full shared-gather     : {t_sh:8.2f} ms")

    ms0 = state.model_state

    @jax.jit
    def fwd(params, batch):
        per_ex, _, _ = loss_fn(params, ms0, batch, rng, True)
        return jnp.mean(per_ex)

    print(f"dien fwd          : {bench(fwd, state.params, b):8.2f} ms")

    @jax.jit
    def grads(params, batch):
        g = jax.grad(lambda p: jnp.mean(loss_fn(p, ms0, batch, rng, True)[0]))(params)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x[:1] if x.ndim else x), g, 0.0)

    print(f"dien fwd+bwd      : {bench(grads, state.params, b):8.2f} ms")

    _, _, tr2, state2, b2 = build(64, 16)
    t2, _ = bench_full(tr2, state2, b2, rng)
    print(f"dien full vocab64 : {t2:8.2f} ms")

    # recurrence chain alone (GRU -> attention -> AUGRU) fwd+bwd
    from recommender_tpu.nn.recurrent import AUGRU, GRU
    from recommender_tpu.nn.sequence import DIENAttention

    import flax.linen as nn

    class Recur(nn.Module):
        @nn.compact
        def __call__(self, his, target, mask):
            hidden = GRU(hidden=36)(his, mask)
            score = DIENAttention()(target, hidden, mask)
            return AUGRU(hidden=36)(hidden, score, mask)

    rmod = Recur()
    nprng = np.random.default_rng(0)
    his = jnp.asarray(nprng.normal(size=(B, T, 36)), jnp.float32)
    tgt = jnp.asarray(nprng.normal(size=(B, 36)), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    rparams = rmod.init(rng, his, tgt, mask)["params"]

    @jax.jit
    def recur_gb(p, h, t, m):
        g = jax.grad(lambda pp: jnp.sum(rmod.apply({"params": pp}, h, t, m)))(p)
        return jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(x[:1]), g, 0.0)

    print(f"dien recur f+b    : {bench(recur_gb, rparams, his, tgt, mask):8.2f} ms")

    # embedding-only: the exact 3 embed() pairs fwd+bwd
    from recommender_tpu.embedding.table import Embedding

    class Embeds(nn.Module):
        @nn.compact
        def __call__(self, batch):
            it = Embedding(400_000, 18, name="item")
            ct = Embedding(1500, 18, name="cat")
            s = 0.0
            for i_key, c_key in (("target_item", "target_cat"),
                                 ("pos_his_item", "pos_his_cat"),
                                 ("neg_his_item", "neg_his_cat")):
                s = s + jnp.sum(it(batch[i_key])) + jnp.sum(ct(batch[c_key]))
            return s

    emod = Embeds()
    eparams = emod.init(rng, b)["params"]

    @jax.jit
    def embeds_gb(p, batch):
        g = jax.grad(lambda pp: emod.apply({"params": pp}, batch))(p)
        return jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(x[:1]), g, 0.0)

    print(f"dien embeds f+b   : {bench(embeds_gb, eparams, b):8.2f} ms")


def profile_mmoe(B=8192):
    from recommender_tpu.data.synthetic import SyntheticMultiTask
    from recommender_tpu.models.esmm import MMOE
    from recommender_tpu.models.tasks import make_multitask_task

    mesh = make_mesh(MeshSpec(len(jax.devices()), 1))
    rng = jax.random.PRNGKey(0)

    def build(vocab):
        gen = SyntheticMultiTask(vocab_sizes=tuple([vocab] * 18), seed=0)
        host = gen.sample(B, seed=1)
        model = MMOE(vocab_sizes=list(gen.vocab_sizes))
        loss_fn, eval_fn = make_multitask_task(model)
        tr = Trainer(loss_fn, TrainConfig(), mesh=mesh, eval_fn=eval_fn)
        state = tr.init_state(
            lambda: init_model(model, {k: v[:8] for k, v in host.items()}))
        return model, loss_fn, tr, state, tr.put_batch(host)

    model, loss_fn, tr, state, b = build(100_000)
    t_full, state = bench_full(tr, state, b, rng)
    print(f"mmoe full         : {t_full:8.2f} ms")

    ms0 = state.model_state

    @jax.jit
    def fwd(params, batch):
        per_ex, _, _ = loss_fn(params, ms0, batch, rng, True)
        return jnp.mean(per_ex)

    print(f"mmoe fwd          : {bench(fwd, state.params, b):8.2f} ms")

    @jax.jit
    def grads(params, batch):
        g = jax.grad(lambda p: jnp.mean(loss_fn(p, ms0, batch, rng, True)[0]))(params)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x[:1] if x.ndim else x), g, 0.0)

    print(f"mmoe fwd+bwd      : {bench(grads, state.params, b):8.2f} ms")

    _, _, tr2, state2, b2 = build(8)
    t2, _ = bench_full(tr2, state2, b2, rng)
    print(f"mmoe full vocab8  : {t2:8.2f} ms")

    # embedder alone: 18 per-table gather+scatter chains fwd+bwd
    import flax.linen as nn

    from recommender_tpu.models.esmm import FeatureEmbedder

    emod = FeatureEmbedder([100_000] * 18, 18)
    eparams = emod.init(rng, b["features"])["params"]

    @jax.jit
    def embed_gb(p, feats):
        g = jax.grad(lambda pp: jnp.sum(emod.apply({"params": pp}, feats)))(p)
        return jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(x[:1]), g, 0.0)

    print(f"mmoe embedder f+b : {bench(embed_gb, eparams, b['features']):8.2f} ms")

    # adam over the 18 tables alone (dense zero grads — pure optimizer cost)
    tables = {f"t{j}": jnp.zeros((100_000, 18), jnp.float32) for j in range(18)}
    opt = optax.adam(1e-3)
    ost = opt.init(tables)
    zg = jax.tree_util.tree_map(jnp.zeros_like, tables)

    @jax.jit
    def adam_step(t, os, g):
        up, os2 = opt.update(g, os, t)
        t2 = optax.apply_updates(t, up)
        return t2["t0"][0, 0]

    print(f"mmoe adam tables  : {bench(adam_step, tables, ost, zg):8.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1:] or ["dien", "mmoe"]
    for name in which:
        {"dien": profile_dien, "mmoe": profile_mmoe}[name]()
