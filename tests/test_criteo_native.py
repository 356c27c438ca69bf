"""Native Criteo parser parity + prepare CLI end-to-end."""
import numpy as np
import pytest

from recommender_tpu.data.criteo import (
    NUM_CAT,
    NUM_INT,
    build_vocab,
    encode_file_native,
    encode_lines,
    load_shards,
    load_vocab,
)


def _make_raw(tmp_path, n=500, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        ints = [
            "" if rng.random() < 0.1 else str(int(rng.integers(-3, 100)))
            for _ in range(NUM_INT)
        ]
        cats = [
            "" if rng.random() < 0.05 else f"c{j}_{int(rng.integers(10))}"
            for j in range(NUM_CAT)
        ]
        rows.append(
            str(int(rng.random() < 0.3)) + "\t" + "\t".join(ints) + "\t" + "\t".join(cats)
        )
    p = tmp_path / "raw.tsv"
    p.write_text("\n".join(rows) + "\n")
    return p, rows


def test_native_parser_parity(tmp_path):
    p, rows = _make_raw(tmp_path)
    vocab = build_vocab(rows, min_count=2)
    nat = encode_file_native(str(p), vocab)
    if nat is None:
        pytest.skip("native parser unavailable")
    py = encode_lines(rows, vocab)
    np.testing.assert_allclose(nat["int_features"], py["int_features"], atol=1e-5)
    np.testing.assert_array_equal(nat["cat_features"], py["cat_features"])
    np.testing.assert_array_equal(nat["label"], py["label"])


def test_prepare_cli(tmp_path):
    p, rows = _make_raw(tmp_path, n=300)
    out = tmp_path / "out"
    from recommender_tpu.cli.prepare_criteo import main

    main(["--train", str(p), "--test", str(p), "--out_dir", str(out),
          "--min_count", "2", "--shard_rows", "100"])
    vocab = load_vocab(str(out / "vocab.pkl"))
    assert len(vocab) > 0
    import glob

    train_shards = sorted(glob.glob(str(out / "train" / "*.npz")))
    assert len(train_shards) == 3
    arrays = load_shards(train_shards)
    assert arrays["label"].shape == (300,)
    assert arrays["cat_features"].shape == (300, NUM_CAT)
