"""Data-parallel invariance: the same global batch gives the same loss curve
on 1 device and on an 8-way data mesh (the reference needed explicit
per-replica loss scaling for this — dien/distribute_train.py:31-44; here it
falls out of mean-loss + GSPMD)."""
import jax
import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.data.pipeline import batch_iterator
from recommender_tpu.data.synthetic import SyntheticSequence
from recommender_tpu.models.dien import DIN
from recommender_tpu.models.tasks import init_model, make_ctr_task


def _losses(devices, steps=4):
    gen = SyntheticSequence(num_items=64, num_cats=8, max_len=6, seed=0)
    train = gen.sample(512, seed=1)
    model = DIN(item_vocab=64, cat_vocab=8, item_dim=4, cat_dim=4, mlp_units=(8, 1))
    loss_fn, eval_fn = make_ctr_task(model)
    mesh = make_mesh(MeshSpec(len(devices), 1), devices=devices)
    trainer = Trainer(loss_fn, TrainConfig(learning_rate=1e-3, log_every=1),
                      mesh=mesh, eval_fn=eval_fn)
    example = {k: v[:8] for k, v in train.items()}
    state = trainer.init_state(lambda: init_model(model, example))
    it = batch_iterator(train, 64, seed=3, epochs=None)
    state, hist = trainer.fit(state, it, steps=steps, prefetch=0)
    return [h["loss"] for h in hist if "loss" in h]


def test_dp8_matches_single_device(devices8):
    single = _losses(jax.devices()[:1])
    dp8 = _losses(jax.devices())
    np.testing.assert_allclose(single, dp8, rtol=1e-4, atol=1e-5)
