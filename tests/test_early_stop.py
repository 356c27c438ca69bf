"""Early stopping + best-only checkpointing (ctr/train.py:88-96 parity)."""
import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.pipeline import batch_iterator
from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task


def test_early_stop_fires(tmp_path, devices8):
    gen = SyntheticCTR(vocab_size=128, seed=0)
    train = gen.sample(1024, seed=1)
    test = gen.sample(512, seed=2)
    model = DLRM(vocab_size=128, embed_dim=4, bottom_units=(8, 4), top_units=(8, 1))
    loss_fn, eval_fn = make_ctr_task(model)
    mesh = make_mesh(MeshSpec(8, 1))
    cfg = TrainConfig(
        learning_rate=0.0,  # frozen model → eval metric never improves
        log_every=10**9,
        eval_every=2,
        early_stop_patience=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(loss_fn, cfg, mesh=mesh, eval_fn=eval_fn)
    example = {k: v[:8] for k, v in train.items()}
    state = trainer.init_state(lambda: init_model(model, example))
    it = batch_iterator(train, 128, seed=0, epochs=None)
    state, hist = trainer.fit(
        state, it, steps=100,
        eval_iter_fn=lambda: batch_iterator(test, 256, shuffle=False),
    )
    assert any(h.get("early_stopped") for h in hist)
    # with lr=0 and patience 2: first eval = best (+ckpt), then 2 stale → stop at eval 3
    stop_step = [h["step"] for h in hist if h.get("early_stopped")][0]
    assert stop_step == 6, hist
    # best checkpoint exists (saved at the first eval)
    assert trainer._ckpt_mgr.latest_step() is not None


def test_nan_guard_raises_training_diverged():
    import jax
    import jax.numpy as jnp
    import pytest

    from recommender_tpu.core.mesh import MeshSpec, make_mesh
    from recommender_tpu.core.train import (
        TrainConfig,
        Trainer,
        TrainingDiverged,
        TrainState,
    )

    def loss_fn(params, model_state, batch, rng, train):
        # diverges immediately: 0/0 per-example loss
        per_ex = batch["x"] * jnp.float32(0) / jnp.float32(0)
        return per_ex, {}, model_state

    mesh = make_mesh(MeshSpec(len(jax.devices()), 1))
    tr = Trainer(loss_fn, TrainConfig(log_every=1, eval_every=0), mesh=mesh)
    state = tr.init_state(
        lambda: ({"w": jnp.zeros((2,))}, {})
    )
    batches = iter([{"x": jnp.ones((16,))}] * 10)
    with pytest.raises(TrainingDiverged):
        tr.fit(state, batches, steps=10)
