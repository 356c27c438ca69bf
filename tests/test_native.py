"""Native C++ sampler vs numpy reference implementations."""
import numpy as np
import pytest

from recommender_tpu.graph import native
from recommender_tpu.graph.bipartite import BipartiteGraph
from recommender_tpu.graph.store import WeightedGraph, _build_alias_tables
from recommender_tpu.graph.walks import random_walk

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native library not built"
)


def test_alias_tables_exact_parity():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 500, 5000)
    dst = rng.integers(0, 500, 5000)
    w = rng.random(5000).astype(np.float32) + 0.05
    g = WeightedGraph.from_edges(src, dst, w, num_nodes=500)
    prob_py, alias_py = _build_alias_tables(g.indptr, g.weights.astype(np.float64))
    prob_n, alias_n = native.build_alias_tables(g.indptr, g.weights)
    np.testing.assert_allclose(prob_n, prob_py, atol=1e-5)
    np.testing.assert_array_equal(alias_n, alias_py)


def test_native_walks_weighted_distribution():
    # node 0 → 1 (w=1) / 2 (w=3); walks should pick 2 ~75% of the time
    g = WeightedGraph.from_edges([0, 0], [1, 2], [1.0, 3.0], num_nodes=3)
    assert g.native
    rng = np.random.default_rng(0)
    walks = random_walk(g, np.zeros(20000, np.int32), 1, rng)
    frac = (walks[:, 1] == 2).mean()
    assert abs(frac - 0.75) < 0.02, frac


def test_native_walk_deadend():
    g = WeightedGraph.from_edges([0], [1], num_nodes=2)
    rng = np.random.default_rng(0)
    walks = random_walk(g, np.array([0], np.int32), 3, rng)
    assert walks[0].tolist() == [0, 1, -1, -1]


def test_native_importance_matches_python_statistics():
    """On a graph with strong structure (each item pair shares dedicated
    users), both samplers must surface the dominant co-interaction partner."""
    us, its = [], []
    num_pairs = 20
    for p in range(num_pairs):  # items 2p and 2p+1 share 10 users
        for u in range(10):
            uid = p * 12 + u
            us += [uid, uid]
            its += [2 * p, 2 * p + 1]
    # sprinkle a little noise
    rng = np.random.default_rng(0)
    for _ in range(40):
        us.append(int(rng.integers(0, num_pairs * 12)))
        its.append(int(rng.integers(0, 2 * num_pairs)))
    U, V = num_pairs * 12, 2 * num_pairs
    gn = BipartiteGraph(us, its, U, V)
    gp = BipartiteGraph(us, its, U, V, use_native=False)
    assert gn.native and not gp.native
    items = np.arange(V)
    nb_n, w_n = gn.importance_neighbors(
        items, rng=np.random.default_rng(1), num_walks=32, walk_length=2
    )
    nb_p, w_p = gp.importance_neighbors(
        items, rng=np.random.default_rng(1), num_walks=32, walk_length=2
    )
    assert nb_n.shape == nb_p.shape == (V, 3)
    for nb, w in ((nb_n, w_n), (nb_p, w_p)):
        pad = w == 0
        assert (nb[pad] == np.repeat(items[:, None], 3, axis=1)[pad]).all()
        assert (w >= 0).all()
    # both samplers must rank the paired item as the top neighbor almost always
    partner = items ^ 1
    hit_n = (nb_n[:, 0] == partner).mean()
    hit_p = (nb_p[:, 0] == partner).mean()
    assert hit_n > 0.9, hit_n
    assert hit_p > 0.9, hit_p


def test_native_importance_exclusion():
    rng = np.random.default_rng(0)
    us = rng.integers(0, 50, 2000)
    its = rng.integers(0, 30, 2000)
    g = BipartiteGraph(us, its, 50, 30)
    items = np.arange(10)
    nb, w = g.importance_neighbors(items, rng=np.random.default_rng(1), num_walks=32)
    excl = nb[:, 0:1].copy()
    nb2, w2 = g.importance_neighbors(
        items, rng=np.random.default_rng(1), num_walks=32, exclude=excl
    )
    for i in range(10):
        assert excl[i, 0] not in nb2[i][w2[i] > 0]
