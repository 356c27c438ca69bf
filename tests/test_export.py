"""Serving bundle export/load/top-k + profiling utilities."""
import numpy as np

from recommender_tpu.core.profiling import StepTimer
from recommender_tpu.retrieval.export import (
    export_serving_bundle,
    load_serving_bundle,
    serve_topk,
)


def test_serving_bundle_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    reprs = rng.normal(size=(50, 8)).astype(np.float32)
    nbr = rng.integers(0, 50, size=(50, 3)).astype(np.int32)
    w = rng.random((50, 3)).astype(np.float32)
    p = tmp_path / "bundle.npz"
    export_serving_bundle(str(p), reprs, nbr, w, metadata={"model": "pinsage", "k": 3})
    b = load_serving_bundle(str(p))
    np.testing.assert_array_equal(b["item_reprs"], reprs)
    np.testing.assert_array_equal(b["neighbor_ids"], nbr)
    assert b["metadata"]["model"] == "pinsage"

    recs = serve_topk(b, np.array([0, 1, 2]), k=5)
    assert recs.shape == (3, 5)
    for i in range(3):
        assert i not in recs[i]  # self-retrieval masked
    # top-1 is the true nearest neighbor by dot product
    sims = reprs @ reprs.T
    np.fill_diagonal(sims, -np.inf)
    np.testing.assert_array_equal(recs[:, 0], sims[:3].argmax(axis=1))


def test_quantized_bundle_roundtrip_and_recall(tmp_path):
    """Int8 export (retrieval/quantize.py): 4× smaller corpus payload,
    scores through the int8 MXU path, and on clustered reprs the top-k
    agrees with f32 scoring (quantization error ≪ cluster separation)."""
    rng = np.random.default_rng(1)
    C, per, D = 20, 40, 32
    centers = rng.normal(size=(C, D)) * 3
    reprs = (centers.repeat(per, axis=0)
             + rng.normal(size=(C * per, D))).astype(np.float32)
    p = tmp_path / "q.npz"
    export_serving_bundle(str(p), reprs, metadata={"model": "pinsage"},
                          quantize=True)
    b = load_serving_bundle(str(p))
    assert "item_reprs" not in b
    assert b["item_reprs_int8"].dtype == np.int8
    assert b["item_scale"].dtype == np.float32
    # the quantized corpus really is ~4x smaller than the f32 one
    assert b["item_reprs_int8"].nbytes == reprs.nbytes // 4

    # dequantized reconstruction is within one quantization step per coord
    deq = b["item_reprs_int8"].astype(np.float32) * b["item_scale"][:, None]
    assert np.max(np.abs(deq - reprs)) <= np.max(np.abs(reprs)) / 127 + 1e-6

    q_ids = np.arange(0, C * per, 7)
    recs_q = serve_topk(b, q_ids, k=10)
    pf = tmp_path / "f.npz"
    export_serving_bundle(str(pf), reprs)
    recs_f = serve_topk(load_serving_bundle(str(pf)), q_ids, k=10)
    # top-10 overlap >= 90% on average; top-1 identical
    overlap = np.mean([
        len(set(a.tolist()) & set(b_.tolist())) / 10
        for a, b_ in zip(recs_q, recs_f)
    ])
    assert overlap >= 0.9, overlap
    # top-1 may flip between near-ties; it must agree for most queries and
    # ALWAYS land in the query's own cluster (the planted structure)
    top1_agree = np.mean(recs_q[:, 0] == recs_f[:, 0])
    assert top1_agree >= 0.9, top1_agree
    np.testing.assert_array_equal(recs_q[:, 0] // per, q_ids // per)


def test_int8_recommend_idlist_matches_dense():
    """Int8 recommend path: padded seen-id lists (over-fetch exclusion)
    give the same output as the dense bool mask."""
    import numpy as np

    from recommender_tpu.retrieval.quantize import (
        quantize_reprs,
        recommend_topk_quantized,
    )

    rng = np.random.default_rng(5)
    U, V, D, S = 40, 150, 16, 9
    reprs = rng.normal(size=(V, D)).astype(np.float32)
    q, sc = quantize_reprs(reprs)
    latest = rng.integers(0, V, U)
    dense = np.zeros((U, V), bool)
    lists = np.full((U, S), -1, np.int32)
    for u in range(U):
        ids = rng.choice(V, size=rng.integers(1, S), replace=False)
        dense[u, ids] = True
        lists[u, : len(ids)] = ids
    recs_d = recommend_topk_quantized(q, sc, latest, dense, k=5, batch_size=16)
    recs_l = recommend_topk_quantized(q, sc, latest, lists, k=5, batch_size=16)
    np.testing.assert_array_equal(recs_d, recs_l)


def test_quantize_zero_rows():
    from recommender_tpu.retrieval.quantize import quantize_reprs

    r = np.zeros((4, 8), np.float32)
    r[1] = 1.0
    q, s = quantize_reprs(r)
    assert (q[0] == 0).all() and s[0] == 0
    assert q[1].max() == 127


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] >= 0
