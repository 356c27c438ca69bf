"""AUC histogram metric vs sklearn-style exact AUC (numpy reference)."""
import numpy as np

from recommender_tpu.core.metrics import (
    AUCState,
    StreamingAUC,
    auc_from_state,
    auc_update,
)


def exact_auc(labels, scores):
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    pos = labels == 1
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def test_auc_matches_exact():
    rng = np.random.default_rng(0)
    scores = rng.random(20000).astype(np.float32)
    labels = (rng.random(20000) < scores * 0.7 + 0.1).astype(np.float32)
    state = AUCState.init()
    # streaming in chunks
    for s in range(0, len(scores), 4096):
        state = auc_update(state, scores[s : s + 4096], labels[s : s + 4096])
    got = float(auc_from_state(state))
    want = exact_auc(labels, scores)
    assert abs(got - want) < 2e-3, (got, want)


def test_auc_perfect_and_random():
    labels = np.array([0, 0, 1, 1], np.float32)
    state = auc_update(AUCState.init(), np.array([0.1, 0.2, 0.8, 0.9], np.float32), labels)
    assert abs(float(auc_from_state(state)) - 1.0) < 1e-6
    state = auc_update(AUCState.init(), np.array([0.5, 0.5, 0.5, 0.5], np.float32), labels)
    assert abs(float(auc_from_state(state)) - 0.5) < 1e-6


def test_streaming_wrapper_reset():
    m = StreamingAUC(bins=1024)
    rng = np.random.default_rng(1)
    s = rng.random(1000).astype(np.float32)
    l = (rng.random(1000) < s).astype(np.float32)
    m.update_state(l, s)
    r1 = m.result()
    assert 0.5 < r1 <= 1.0
    m.reset_state()
    m.update_state(l, s)
    assert abs(m.result() - r1) < 1e-9
