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


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] >= 0
