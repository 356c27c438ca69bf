"""Sharded-embedding subsystem: lookup parity and gradient correctness."""
import jax
import jax.numpy as jnp
import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.embedding.sharded import (
    shard_table,
    sharded_lookup,
    sort_coalesced_lookup,
)


def _table(v=64, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(v, d)).astype(np.float32)


def test_sharded_lookup_matches_take(devices8):
    mesh = make_mesh(MeshSpec(data=2, model=4))
    t = _table()
    ids = np.array([[0, 5, 63], [17, 17, 32]], np.int32)
    tbl = shard_table(jnp.asarray(t), mesh)
    out = jax.jit(lambda tb, i: sharded_lookup(tb, i, mesh))(tbl, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), t[ids], rtol=1e-6)


def test_sharded_lookup_grad_is_scatter_add(devices8):
    mesh = make_mesh(MeshSpec(data=1, model=8))
    t = _table(v=40, d=4)
    ids = np.array([3, 3, 39, 0], np.int32)

    def loss(tb):
        e = sharded_lookup(tb, jnp.asarray(ids), mesh)
        return jnp.sum(e * jnp.arange(1.0, 5.0)[:, None])

    tbl = shard_table(jnp.asarray(t), mesh)
    g = np.asarray(jax.jit(jax.grad(loss))(tbl))
    want = np.zeros_like(t)
    for k, i in enumerate(ids):
        want[i] += k + 1.0
    np.testing.assert_allclose(g, want, rtol=1e-6)


def test_dedup_lookup_matches_take(devices8):
    mesh = make_mesh(MeshSpec(data=2, model=4))
    t = _table(v=32, d=8)
    ids = np.array([[1, 1, 1, 2], [31, 0, 31, 7]], np.int32)
    out = jax.jit(lambda tb, i: sort_coalesced_lookup(tb, i, mesh))(
        shard_table(jnp.asarray(t), mesh), jnp.asarray(ids)
    )
    np.testing.assert_allclose(np.asarray(out), t[ids], rtol=1e-6)

    # grad parity with plain take
    def loss_dedup(tb):
        return jnp.sum(sort_coalesced_lookup(tb, jnp.asarray(ids)) ** 2)

    def loss_take(tb):
        return jnp.sum(jnp.take(tb, jnp.asarray(ids), axis=0) ** 2)

    g1 = np.asarray(jax.grad(loss_dedup)(jnp.asarray(t)))
    g2 = np.asarray(jax.grad(loss_take)(jnp.asarray(t)))
    np.testing.assert_allclose(g1, g2, rtol=1e-6)
