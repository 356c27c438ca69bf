"""Graph store, alias-method walks, skip-gram, Zipf sampler."""
import numpy as np

from recommender_tpu.graph.store import WeightedGraph
from recommender_tpu.graph.walks import (
    LogUniformSampler,
    random_walk,
    skipgram_batches,
    skipgram_pairs,
)


def test_csr_construction():
    g = WeightedGraph.from_edges([0, 0, 1, 2], [1, 2, 2, 0], [1.0, 3.0, 1.0, 1.0])
    assert g.num_nodes == 3
    nbrs, w = g.neighbors(0)
    assert set(nbrs.tolist()) == {1, 2}
    assert g.degrees.tolist() == [2, 1, 1]


def test_alias_sampling_matches_weights():
    # node 0 has neighbors 1 (w=1) and 2 (w=3): expect 25/75 split
    g = WeightedGraph.from_edges([0, 0], [1, 2], [1.0, 3.0], num_nodes=3)
    rng = np.random.default_rng(0)
    draws = g.sample_neighbors(np.zeros(20000, np.int64), rng)
    frac2 = (draws == 2).mean()
    assert abs(frac2 - 0.75) < 0.02, frac2


def test_walk_deadend_padding():
    # 0 -> 1 -> (dead end)
    g = WeightedGraph.from_edges([0], [1], num_nodes=2)
    rng = np.random.default_rng(0)
    walks = random_walk(g, np.array([0]), 4, rng)
    assert walks[0].tolist() == [0, 1, -1, -1, -1]


def test_skipgram_pairs_window():
    walks = np.array([[1, 2, 3, 4]])
    t, c = skipgram_pairs(walks, window=1)
    pairs = set(zip(t.tolist(), c.tolist()))
    assert pairs == {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)}
    # -1 and 0 are dropped
    t2, c2 = skipgram_pairs(np.array([[1, 0, -1, 2]]), window=3)
    assert 0 not in t2.tolist() + c2.tolist()
    assert -1 not in t2.tolist() + c2.tolist()


def test_log_uniform_sampler_distribution():
    V = 1000
    s = LogUniformSampler(V)
    rng = np.random.default_rng(0)
    draws = s.sample(200_000, rng)
    assert draws.min() >= 0 and draws.max() < V
    # empirical frequency of id 0 should match P(0)=log(2)/log(V+1)
    want = np.log(2.0) / np.log(V + 1.0)
    got = (draws == 0).mean()
    assert abs(got - want) / want < 0.05, (got, want)
    # monotone decreasing popularity
    f0 = (draws < 10).mean()
    f1 = ((draws >= 100) & (draws < 110)).mean()
    assert f0 > 5 * f1


def test_skipgram_batches_shapes_and_sideinfo():
    rng = np.random.default_rng(0)
    src = rng.integers(1, 50, 400)
    dst = rng.integers(1, 50, 400)
    g = WeightedGraph.from_edges(src, dst, num_nodes=50)
    side = {"cat": np.arange(50, dtype=np.int32) % 7}
    it = skipgram_batches(
        g, walk_length=5, window=2, num_negatives=3, batch_size=64,
        walks_per_round=16, side_info=side, seed=0,
    )
    b = next(it)
    assert b["target"].shape == (64,)
    assert b["context"].shape == (64, 4)
    assert b["label"].shape == (64, 4)
    assert (b["label"][:, 0] == 1).all() and (b["label"][:, 1:] == 0).all()
    assert (b["target_cat"] == side["cat"][b["target"]]).all()
    # batches keep coming (endless stream)
    b2 = next(it)
    assert b2["target"].shape == (64,)
