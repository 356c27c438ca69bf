"""Every model family's FULL train step compiled and run on a (2×4) mesh
with row-sharded embedding tables — the multi-chip contract for the zoo."""
import jax
import numpy as np
import pytest

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.models.tasks import (
    init_model,
    make_aux_loss_task,
    make_ctr_task,
    make_multitask_task,
    make_skipgram_task,
)
from recommender_tpu.parallel.partitioning import param_shardings


def _run_one_step(model, batch, task_fn, devices8):
    mesh = make_mesh(MeshSpec(2, 4))
    out = task_fn(model)
    loss_fn = out[0] if isinstance(out, tuple) else out
    variables = model.init(jax.random.PRNGKey(0), batch)
    pshard = param_shardings(variables["params"], mesh)
    trainer = Trainer(loss_fn, TrainConfig(learning_rate=1e-3), mesh=mesh,
                      param_shardings=pshard)
    state = trainer.init_state(lambda: init_model(model, batch))
    dev_batch = trainer.put_batch(batch)
    state, metrics = trainer._train_step(state, dev_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # the table really is row-sharded over the model axis
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        name = jax.tree_util.keystr(path)
        if "embedding" in name and leaf.ndim == 2 and leaf.shape[0] >= 64:
            spec = leaf.sharding.spec
            if spec and spec[0] == "model":
                return  # found at least one sharded table
    raise AssertionError("no row-sharded table found in params")


def test_dlrm_multichip(devices8):
    from recommender_tpu.data.synthetic import SyntheticCTR
    from recommender_tpu.models.dlrm import DLRM

    gen = SyntheticCTR(vocab_size=128, seed=0)
    batch = gen.sample(16, seed=1)
    model = DLRM(vocab_size=128, embed_dim=8, bottom_units=(16, 8),
                 top_units=(16, 1), partition="model")
    _run_one_step(model, batch, make_ctr_task, devices8)


def test_dien_multichip(devices8):
    from recommender_tpu.data.synthetic import SyntheticSequence
    from recommender_tpu.models.dien import DIEN

    gen = SyntheticSequence(num_items=128, num_cats=16, max_len=8, seed=0)
    batch = gen.sample(16, seed=1)
    model = DIEN(item_vocab=128, cat_vocab=16, item_dim=8, cat_dim=8,
                 mlp_units=(16, 1), extract_hidden=8, evolve_hidden=8,
                 partition="model")
    _run_one_step(model, batch, make_aux_loss_task, devices8)


def test_mmoe_multichip(devices8):
    from recommender_tpu.data.synthetic import SyntheticMultiTask
    from recommender_tpu.models.esmm import MMOE

    gen = SyntheticMultiTask(num_feats=4, vocab_sizes=(64, 64, 64, 64), seed=0)
    batch = gen.sample(16, seed=1)
    model = MMOE(vocab_sizes=[64] * 4, embed_dim=8, num_experts=2,
                 expert_units=(8, 4), tower_units=(4, 1), partition="model")
    _run_one_step(model, batch, make_multitask_task, devices8)


def test_eges_multichip(devices8):
    from recommender_tpu.models.eges import EGES

    rng = np.random.default_rng(0)
    batch = {
        "target": rng.integers(1, 128, 16).astype(np.int32),
        "target_cat": rng.integers(1, 8, 16).astype(np.int32),
        "target_brand": rng.integers(1, 8, 16).astype(np.int32),
        "context": rng.integers(0, 128, (16, 4)).astype(np.int32),
        "label": np.concatenate(
            [np.ones((16, 1), np.float32), np.zeros((16, 3), np.float32)], axis=1
        ),
    }
    model = EGES(vocab_size=128, cat_vocab=8, brand_vocab=8, embed_dim=8,
                 partition="model")
    _run_one_step(model, batch, make_skipgram_task, devices8)


def test_pinsage_multichip(devices8):
    """Full jitted PinSage step on the (2,4) mesh with the item id table
    row-sharded over 'model' (VERDICT r2 #4: PinSage was the only family
    without multi-chip coverage)."""
    from recommender_tpu.graph.bipartite import BipartiteGraph
    from recommender_tpu.models.pinsage import ItemFeatures, PinSage
    from recommender_tpu.models.pinsage_task import (
        make_pinsage_task,
        pinsage_train_batches,
    )

    rng = np.random.default_rng(0)
    U, V = 48, 64  # V divisible by the 4 model shards
    us = np.repeat(np.arange(U), 4)
    its = rng.integers(0, V, len(us))
    g = BipartiteGraph(us, its, U, V)
    feats = ItemFeatures(
        year=rng.integers(0, 5, V).astype(np.int32),
        genre=(rng.random((V, 6)) < 0.3).astype(np.float32),
    )
    model = PinSage(features=feats, embed_dim=8, conv_hidden=16, conv_out=8,
                    partition="model")
    batch = next(pinsage_train_batches(g, 16, seed=0))

    mesh = make_mesh(MeshSpec(2, 4))
    loss_fn = make_pinsage_task(model)
    variables = model.init(jax.random.PRNGKey(0), batch)
    pshard = param_shardings(variables["params"], mesh)
    trainer = Trainer(loss_fn, TrainConfig(learning_rate=1e-3), mesh=mesh,
                      param_shardings=pshard)
    state = trainer.init_state(lambda: init_model(model, batch))
    state, metrics = trainer._train_step(
        state, trainer.put_batch(batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    emb = state.params["projector"]["id"]["embedding"]
    leaf = emb.value if hasattr(emb, "value") else emb
    assert leaf.sharding.spec[0] == "model"


def test_dlrm_multichip_split_step(devices8):
    """The split grads|optimizer step AND the padded-scatter custom-VJP
    lookup (both gated on is_big_narrow_table — vocab 512k x 16 crosses the
    threshold) compose with GSPMD row-sharded tables on a (2x4) mesh."""
    from recommender_tpu.data.synthetic import SyntheticCTR
    from recommender_tpu.models.dlrm import DLRM

    gen = SyntheticCTR(vocab_size=512_000, seed=0)
    batch = gen.sample(16, seed=1)
    model = DLRM(vocab_size=512_000, embed_dim=16, bottom_units=(16, 16),
                 top_units=(16, 1), partition="model")
    mesh = make_mesh(MeshSpec(2, 4))
    loss_fn, _ = make_ctr_task(model)
    variables = model.init(jax.random.PRNGKey(0), batch)
    pshard = param_shardings(variables["params"], mesh)
    trainer = Trainer(
        loss_fn,
        TrainConfig(learning_rate=1e-3, split_step=True),
        mesh=mesh,
        param_shardings=pshard,
    )
    state = trainer.init_state(lambda: init_model(model, batch))
    dev_batch = trainer.put_batch(batch)
    for _ in range(2):
        state, metrics = trainer._train_step(state, dev_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    emb = state.params["embedding"]["embedding"]
    leaf = emb.value if hasattr(emb, "value") else emb
    assert leaf.sharding.spec[0] == "model"


def test_dlrm_a2a_lookup_matches_gspmd(devices8):
    """Training with the explicit all-to-all exchange reproduces the GSPMD
    masked-gather+psum path: same losses over several steps on a (2,4) mesh."""
    from recommender_tpu.data.synthetic import SyntheticCTR
    from recommender_tpu.models.dlrm import DLRM

    mesh = make_mesh(MeshSpec(2, 4))
    gen = SyntheticCTR(vocab_size=128, seed=0)
    train = gen.sample(512, seed=1)

    # SyntheticCTR ids are skewed: at the default capacity_factor the hot
    # shard overflows and a2a serves documented 0-vectors. capacity_factor =
    # num model shards (4) is the lossless upper bound; assert the
    # diagnostic agrees.
    from recommender_tpu.embedding.sharded import a2a_overflow_fraction

    assert a2a_overflow_fraction(train["cat_features"], 4, 128, 2.0) > 0
    assert a2a_overflow_fraction(train["cat_features"], 4, 128, 4.0) == 0.0

    def losses(lookup_mode):
        model = DLRM(vocab_size=128, embed_dim=8, bottom_units=(16, 8),
                     top_units=(16, 1), partition="model",
                     lookup_mode=lookup_mode, mesh=mesh, capacity_factor=4.0)
        loss_fn, _ = make_ctr_task(model)
        variables = model.init(jax.random.PRNGKey(0), {k: v[:8] for k, v in train.items()})
        pshard = param_shardings(variables["params"], mesh)
        trainer = Trainer(loss_fn, TrainConfig(learning_rate=1e-3, log_every=1),
                          mesh=mesh, param_shardings=pshard)
        state = trainer.init_state(
            lambda: init_model(model, {k: v[:8] for k, v in train.items()})
        )
        from recommender_tpu.data.pipeline import batch_iterator

        state, hist = trainer.fit(
            state, batch_iterator(train, 64, seed=3, epochs=None), steps=4,
            prefetch=0,
        )
        return [h["loss"] for h in hist if "loss" in h]

    np.testing.assert_allclose(losses("a2a"), losses("gspmd"), rtol=1e-4, atol=1e-5)

    # the explicit shard_map psum exchange (shard-local backward) is the
    # same math again — all three routes interchangeable per table
    np.testing.assert_allclose(losses("psum"), losses("gspmd"), rtol=1e-4, atol=1e-5)


def test_dien_psum_lookup_matches_gspmd(devices8):
    """The sequence family's sharded tables through the explicit shard_map
    psum exchange (SequenceBase.lookup_mode='psum'): same one-step loss as
    the GSPMD route on the (2,4) mesh — the exchange knobs added r4 are
    semantics-preserving for history-shaped [B, T] lookups too."""
    import numpy as np

    from recommender_tpu.data.synthetic import SyntheticSequence
    from recommender_tpu.models.dien import DIEN

    mesh = make_mesh(MeshSpec(2, 4))
    gen = SyntheticSequence(num_items=128, num_cats=16, max_len=8, seed=0)
    batch = gen.sample(16, seed=1)

    def one_step_loss(lookup_mode):
        model = DIEN(item_vocab=128, cat_vocab=16, item_dim=8, cat_dim=8,
                     mlp_units=(16, 1), extract_hidden=8, evolve_hidden=8,
                     partition="model", lookup_mode=lookup_mode,
                     mesh=mesh if lookup_mode != "gspmd" else None)
        loss_fn = make_aux_loss_task(model)[0]
        variables = model.init(jax.random.PRNGKey(0), batch)
        pshard = param_shardings(variables["params"], mesh)
        tr = Trainer(loss_fn, TrainConfig(learning_rate=1e-3), mesh=mesh,
                     param_shardings=pshard)
        state = tr.init_state(lambda: init_model(model, batch))
        _, metrics = tr._train_step(state, tr.put_batch(batch), jax.random.PRNGKey(0))
        return float(metrics["loss"])

    np.testing.assert_allclose(one_step_loss("psum"), one_step_loss("gspmd"),
                               rtol=1e-5)


def test_dcn_fold_matches_flat_mesh(devices8):
    """MeshSpec(2, 2, dcn_data=2) (multi-slice growth path) computes the
    SAME training trajectory as the flat (4, 2) mesh — the slice axis only
    reorders devices, never the math."""
    from recommender_tpu.data.synthetic import SyntheticCTR
    from recommender_tpu.models.dlrm import DLRM

    gen = SyntheticCTR(vocab_size=256, seed=0)
    batch = gen.sample(32, seed=1)

    losses = []
    for spec in [MeshSpec(4, 2), MeshSpec(2, 2, dcn_data=2)]:
        mesh = make_mesh(spec)
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "data": 4, "model": 2}
        model = DLRM(vocab_size=256, embed_dim=8, bottom_units=(16, 8),
                     top_units=(16, 1), partition="model")
        loss_fn, _ = make_ctr_task(model)
        variables = model.init(jax.random.PRNGKey(0), batch)
        pshard = param_shardings(variables["params"], mesh)
        trainer = Trainer(loss_fn, TrainConfig(learning_rate=1e-2), mesh=mesh,
                          param_shardings=pshard)
        state = trainer.init_state(lambda: init_model(model, batch))
        dev_batch = trainer.put_batch(batch)
        run = []
        for _ in range(3):
            state, metrics = trainer._train_step(
                state, dev_batch, jax.random.PRNGKey(0))
            run.append(float(metrics["loss"]))
        losses.append(run)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_mesh_dcn_validation():
    import argparse
    import pytest as _pytest
    from recommender_tpu.cli.common import build_mesh

    args = argparse.Namespace(mesh_data=0, mesh_model=1, mesh_dcn=0)
    with _pytest.raises(SystemExit):
        build_mesh(args)


def test_dlrm_bf16_sr_multichip(devices8):
    """bf16 table + stochastic rounding composes with GSPMD row-sharding
    on the (2,4) mesh: adam_sr state shards like the param, the SR hash
    noise (iota-based) partitions under jit, and training stays finite
    with the table still bf16 + sharded."""
    import jax.numpy as jnp

    from recommender_tpu.data.synthetic import SyntheticCTR
    from recommender_tpu.models.dlrm import DLRM

    gen = SyntheticCTR(vocab_size=256, seed=0)
    batch = gen.sample(32, seed=1)
    model = DLRM(vocab_size=256, embed_dim=8, bottom_units=(16, 8),
                 top_units=(16, 1), partition="model",
                 embed_param_dtype=jnp.bfloat16)
    mesh = make_mesh(MeshSpec(2, 4))
    loss_fn, _ = make_ctr_task(model)
    variables = model.init(jax.random.PRNGKey(0), batch)
    pshard = param_shardings(variables["params"], mesh)
    trainer = Trainer(loss_fn, TrainConfig(learning_rate=1e-2), mesh=mesh,
                      param_shardings=pshard)
    state = trainer.init_state(lambda: init_model(model, batch))
    assert trainer._sr_apply
    dev_batch = trainer.put_batch(batch)
    losses = []
    for _ in range(5):
        state, metrics = trainer._train_step(state, dev_batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # actually learning
    emb = state.params["embedding"]["embedding"]
    leaf = emb.value if hasattr(emb, "value") else emb
    assert leaf.dtype == jnp.bfloat16
    assert leaf.sharding.spec[0] == "model"
    # adam_sr moments shard with the param and stay bf16
    mu = state.opt_state[0].mu["embedding"]["embedding"]
    mu_leaf = mu.value if hasattr(mu, "value") else mu
    assert mu_leaf.dtype == jnp.bfloat16


def test_dlrm_bf16_sr_psum_lookup_multichip(devices8):
    """bf16+SR ALSO composes with the explicit shard_map psum exchange
    (the r4 production route for big sharded tables): the bf16 shard
    gathers/scatters inside shard_map, SR writes land on the sharded
    param, training stays finite and learns."""
    import jax.numpy as jnp

    from recommender_tpu.data.synthetic import SyntheticCTR
    from recommender_tpu.models.dlrm import DLRM

    gen = SyntheticCTR(vocab_size=256, seed=0)
    batch = gen.sample(32, seed=1)
    mesh = make_mesh(MeshSpec(2, 4))
    model = DLRM(vocab_size=256, embed_dim=8, bottom_units=(16, 8),
                 top_units=(16, 1), partition="model",
                 lookup_mode="psum", mesh=mesh,
                 embed_param_dtype=jnp.bfloat16)
    loss_fn, _ = make_ctr_task(model)
    variables = model.init(jax.random.PRNGKey(0), batch)
    pshard = param_shardings(variables["params"], mesh)
    trainer = Trainer(loss_fn, TrainConfig(learning_rate=1e-2), mesh=mesh,
                      param_shardings=pshard)
    state = trainer.init_state(lambda: init_model(model, batch))
    assert trainer._sr_apply
    dev_batch = trainer.put_batch(batch)
    losses = []
    for _ in range(5):
        state, metrics = trainer._train_step(state, dev_batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    emb = state.params["embedding"]["embedding"]
    leaf = emb.value if hasattr(emb, "value") else emb
    assert leaf.dtype == jnp.bfloat16
    assert leaf.sharding.spec[0] == "model"
