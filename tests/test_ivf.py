"""IVF clustered retrieval (retrieval/ivf.py): build/search correctness,
recall vs brute force, capacity spill, k-means repair."""
import numpy as np
import pytest

from recommender_tpu.retrieval.ivf import build_ivf, kmeans, search_ivf


def _clustered(V=2000, D=32, C=20, spread=0.3, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(C, D)) * 3
    assign = rng.integers(0, C, V)
    return (centers[assign] + rng.normal(size=(V, D)) * spread).astype(
        np.float32
    )


def _brute_topk(reprs, queries, k):
    sim = queries @ reprs.T
    return np.argsort(-sim, axis=1)[:, :k]


def test_ivf_every_item_indexed_once():
    reprs = _clustered()
    idx = build_ivf(reprs, num_clusters=16, capacity_factor=1.25, seed=1)
    ids = np.concatenate(
        [idx.bucket_ids.reshape(-1), idx.spill_ids])
    real = ids[ids >= 0]
    assert len(real) == len(reprs)
    assert len(np.unique(real)) == len(reprs)  # once each, no dupes


def test_ivf_recall_vs_brute():
    """On separable clusters, probing a few buckets recovers brute-force
    top-k almost exactly; probing ALL buckets recovers it exactly."""
    reprs = _clustered(V=3000, C=24)
    idx = build_ivf(reprs, num_clusters=24, seed=2)
    rng = np.random.default_rng(3)
    queries = reprs[rng.integers(0, len(reprs), 64)]
    want = _brute_topk(reprs, queries, 10)

    got, scores = search_ivf(idx, queries, k=10, probes=6)
    got = np.asarray(got)
    recall = np.mean([
        len(set(g.tolist()) & set(w.tolist())) / 10 for g, w in zip(got, want)
    ])
    assert recall >= 0.9, recall
    # int8 rounding can swap near-ties; the top-1 must land in the right
    # CLUSTER and almost always be the exact brute-force item
    assert np.mean(got[:, 0] == want[:, 0]) >= 0.9

    got_all, _ = search_ivf(idx, queries, k=10, probes=24)
    recall_all = np.mean([
        len(set(g.tolist()) & set(w.tolist())) / 10
        for g, w in zip(np.asarray(got_all), want)
    ])
    assert recall_all >= 0.95, recall_all  # residual = int8 rounding only


def test_ivf_matches_brute_int8_with_full_probes():
    """probes == C must equal the brute-force ranking over the SAME int8
    representation (the index adds no error beyond quantization)."""
    from recommender_tpu.retrieval.quantize import quantize_reprs

    reprs = _clustered(V=800, C=8, D=16)
    idx = build_ivf(reprs, num_clusters=8, capacity_factor=2.0, seed=4)
    queries = reprs[:16]
    got, _ = search_ivf(idx, queries, k=5, probes=8)

    q, s = quantize_reprs(reprs)
    qf = np.asarray(queries, np.float32)
    qmax = np.abs(qf).max(axis=1, keepdims=True)
    qq = np.clip(np.rint(qf / np.maximum(qmax / 127.0, 1e-30)), -127, 127)
    sim = (qq @ q.T.astype(np.float64)) * s[None, :]
    want = np.argsort(-sim, kind="stable", axis=1)[:, :5]
    # allow order swaps among exactly-tied int8 scores
    for g, w, row in zip(np.asarray(got), want, sim):
        assert set(g.tolist()) == set(w.tolist()) or np.allclose(
            row[g], row[w]
        )


def test_ivf_spill_items_still_found():
    """A tiny capacity forces most rows into the spill block; recall must
    not degrade (spill is scanned by every query)."""
    from recommender_tpu.retrieval.quantize import quantize_reprs

    reprs = _clustered(V=1000, C=4, D=16, seed=5)
    idx = build_ivf(reprs, num_clusters=4, capacity_factor=0.2, seed=5)
    assert (idx.spill_ids >= 0).sum() > 500  # most rows spilled
    queries = reprs[:32]
    # reference = brute force over the SAME int8 representation, so the
    # assertion isolates the spill/index mechanics from quantization noise
    q, s = quantize_reprs(reprs)
    qf = np.asarray(queries, np.float32)
    qmax = np.abs(qf).max(axis=1, keepdims=True)
    qq = np.clip(np.rint(qf / np.maximum(qmax / 127.0, 1e-30)), -127, 127)
    sim = (qq @ q.T.astype(np.float64)) * s[None, :]
    want = np.argsort(-sim, kind="stable", axis=1)[:, :5]
    got, _ = search_ivf(idx, queries, k=5, probes=4)
    recall = np.mean([
        len(set(g.tolist()) & set(w.tolist())) / 5
        for g, w in zip(np.asarray(got), want)
    ])
    assert recall >= 0.99, recall


def test_kmeans_empty_cluster_repair():
    """More clusters than distinct points: empty clusters reseed instead
    of collapsing to NaN/zero centroids."""
    pts = np.repeat(np.eye(3, 8, dtype=np.float32) * 5, 30, axis=0)
    cent, assign = kmeans(pts, num_clusters=6, iters=5, seed=0)
    assert np.isfinite(cent).all()
    assert len(np.unique(assign)) <= 6
    # every point still lands with its own group
    for g in range(3):
        grp = assign[g * 30:(g + 1) * 30]
        assert len(np.unique(grp)) == 1


def test_ivf_probes_dial_monotone():
    """More probes → recall does not decrease (the dial the docstring
    promises)."""
    reprs = _clustered(V=2000, C=32, spread=1.0, seed=7)  # overlapping
    idx = build_ivf(reprs, num_clusters=32, seed=7)
    rng = np.random.default_rng(8)
    queries = rng.normal(size=(48, reprs.shape[1])).astype(np.float32) * 3
    want = _brute_topk(reprs, queries, 10)

    def recall(p):
        got, _ = search_ivf(idx, queries, k=10, probes=p)
        return np.mean([
            len(set(g.tolist()) & set(w.tolist())) / 10
            for g, w in zip(np.asarray(got), want)
        ])

    r = [recall(p) for p in (1, 4, 16, 32)]
    assert all(b >= a - 0.02 for a, b in zip(r, r[1:])), r
    assert r[-1] >= 0.95, r


def test_kmeans_chunked_pad_rows_are_inert():
    """V not divisible by chunk_rows: pad rows must not pollute centroids
    or assignments — every returned assignment is the true nearest
    centroid of its row."""
    from recommender_tpu.retrieval.ivf import assign_clusters

    reprs = _clustered(V=1003, D=16, C=7, seed=11)
    cent, assign = kmeans(reprs, num_clusters=7, iters=6, seed=1,
                          chunk_rows=64)
    assert assign.shape == (1003,)
    sim = reprs @ cent.T - 0.5 * (cent * cent).sum(1)[None, :]
    np.testing.assert_array_equal(assign, sim.argmax(1))
    np.testing.assert_array_equal(
        assign_clusters(cent, reprs, chunk_rows=128), sim.argmax(1)
    )


def test_search_pads_with_sentinel_when_candidates_short():
    """Fewer real candidates than k: rows fill with the -1 no-candidate
    sentinel (repo pad convention) instead of fabricating items."""
    reprs = _clustered(V=40, D=8, C=2, seed=13)
    idx = build_ivf(reprs, num_clusters=2, capacity_factor=2.0, seed=13)
    got, scores = search_ivf(idx, reprs[:4], k=60, probes=2)
    got = np.asarray(got)
    assert got.shape == (4, 60)
    for row in got:
        real = row[row >= 0]
        assert len(np.unique(real)) == len(real)  # real ids unique
        assert (row[len(real):] == -1).all()  # sentinel tail


def test_probes_clamped_to_cluster_count():
    """probes > C clamps instead of failing inside lax.top_k."""
    reprs = _clustered(V=200, D=8, C=4, seed=14)
    idx = build_ivf(reprs, num_clusters=4, seed=14)
    got, _ = search_ivf(idx, reprs[:3], k=5, probes=99)
    got2, _ = search_ivf(idx, reprs[:3], k=5, probes=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))
