"""End-to-end CLI runs over reference-format RAW files (not --synthetic):
Amazon Books TSV through train_dien, meta_Electronics JSON-lines through
train_eges, Criteo TSV through prepare_criteo + train_ctr, Ali-CCP
skeleton/common-feature CSVs through prepare_aliccp + train_esmm."""
import json

import numpy as np
import pytest

from recommender_tpu.cli import (
    prepare_aliccp,
    prepare_criteo,
    train_ctr,
    train_dien,
    train_eges,
    train_esmm,
)

COMMON = ["--steps", "8", "--log_every", "4", "--eval_every", "0"]


def _amazon_tsv(path, n=400, items=40, cats=6, seed=0):
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n):
        hist_len = rng.integers(2, 6)
        his = [f"item{rng.integers(items)}" for _ in range(hist_len)]
        cats_ = [f"cat{int(h[4:]) % cats}" for h in his]
        tgt = f"item{rng.integers(items)}"
        lines.append(
            f"{i % 2}\tu{i}\t{tgt}\tcat{int(tgt[4:]) % cats}\t"
            + "\x02".join(his) + "\t" + "\x02".join(cats_)
        )
    path.write_text("\n".join(lines) + "\n")


def test_train_dien_raw_tsv(tmp_path, capsys):
    train_f = tmp_path / "train.tsv"
    test_f = tmp_path / "test.tsv"
    _amazon_tsv(train_f, seed=0)
    _amazon_tsv(test_f, n=200, seed=1)
    train_dien.main(COMMON + [
        "--model_type", "DIEN", "--train_file", str(train_f),
        "--test_file", str(test_f), "--history_max_length", "8",
        "--embedding_size", "8", "--train_batch_size", "64",
        "--test_batch_size", "64", "--eval_batches", "2",
    ])
    out = capsys.readouterr().out
    assert '"final"' in out and '"eval_auc"' in out


def test_train_eges_raw_meta(tmp_path, capsys):
    rng = np.random.default_rng(0)
    lines = []
    for i in range(60):
        also = [f"A{int(x)}" for x in rng.integers(0, 60, 4)]
        lines.append(json.dumps({
            "asin": f"A{i}", "main_cat": f"cat{i % 5}",
            "brand": f"b{i % 7}", "also_buy": also,
        }))
    meta = tmp_path / "meta.json"
    meta.write_text("\n".join(lines) + "\n")
    train_eges.main(COMMON + [
        "--model_type", "GES", "--meta_file", str(meta),
        "--embedding_size", "8", "--train_batch_size", "128",
    ])
    out = capsys.readouterr().out
    assert '"link_prediction_auc"' in out


def _aliccp_raw(tmp_path, split, n, seed):
    """Tiny reference-format pair: common_features CSV (key,feat_num,kv) and
    sample_skeleton CSV (sample_id,click,buy,common_key,feat_num,kv) with
    \\x01\\x02\\x03-separated k/v/weight triples."""
    from recommender_tpu.data.aliccp import USE_COLUMNS

    rng = np.random.default_rng(seed)
    common_cols, sample_cols = USE_COLUMNS[:6], USE_COLUMNS[6:]

    def kv_field(cols, tag):
        return "\x01".join(
            f"{c}\x02{tag}{c}_{int(rng.integers(4))}\x031.0" for c in cols
        )

    common_lines = [f"ck{g},{len(common_cols)},{kv_field(common_cols, 'u')}"
                    for g in range(8)]
    skel_lines = []
    for i in range(n):
        click = int(rng.random() < 0.4)
        buy = int(click and rng.random() < 0.3)
        skel_lines.append(
            f"{i},{click},{buy},ck{int(rng.integers(8))},"
            f"{len(sample_cols)},{kv_field(sample_cols, 'i')}"
        )
    common_f = tmp_path / f"common_{split}.csv"
    skel_f = tmp_path / f"skeleton_{split}.csv"
    common_f.write_text("\n".join(common_lines) + "\n")
    skel_f.write_text("\n".join(skel_lines) + "\n")
    return skel_f, common_f


def test_prepare_then_train_esmm(tmp_path, capsys):
    train_skel, train_common = _aliccp_raw(tmp_path, "train", 400, seed=0)
    test_skel, test_common = _aliccp_raw(tmp_path, "test", 200, seed=1)
    out_dir = tmp_path / "aliccp"
    prepare_aliccp.main([
        "--train_skeleton", str(train_skel), "--train_common", str(train_common),
        "--test_skeleton", str(test_skel), "--test_common", str(test_common),
        "--out_dir", str(out_dir), "--min_count", "2",
    ])
    for f in ("train_impressions.npz", "train_subsampled.npz",
              "train_clicks.npz", "test.npz", "vocab.json"):
        assert (out_dir / f).exists()
    sub = dict(np.load(out_dir / "train_subsampled.npz"))
    assert not ((sub["click"] == 0) & (sub["purchase"] == 1)).any()
    train_esmm.main(COMMON + [
        "--model_type", "ESMM",
        "--train_npz", str(out_dir / "train_subsampled.npz"),
        "--test_npz", str(out_dir / "test.npz"),
        "--embedding_size", "8", "--train_batch_size", "64",
        "--test_batch_size", "64",
    ])
    out = capsys.readouterr().out
    assert '"cvr_auc"' in out and '"ctcvr_auc"' in out


def test_train_pinsage_raw_movielens(tmp_path, capsys):
    """PinSage over reference ::-format ratings.dat/movies.dat
    (pinsage/train/process_movielens.py input format)."""
    from recommender_tpu.cli import train_pinsage

    rng = np.random.default_rng(0)
    num_users, num_items, num_comm = 60, 30, 3
    movies = [
        f"{m + 1}::Movie {m} ({1980 + m % 20})::"
        + "|".join(sorted({f"G{m % 5}", f"G{(m // 5) % 5}"}))
        for m in range(num_items)
    ]
    blocks = np.array_split(np.arange(num_items), num_comm)
    ratings = []
    for u in range(num_users):
        pool = blocks[u % num_comm]
        seen_items = rng.choice(pool, size=min(6, len(pool)), replace=False)
        for t, it in enumerate(seen_items):
            ratings.append(f"{u + 1}::{int(it) + 1}::{int(rng.integers(1, 6))}::{1000 + t}")
    (tmp_path / "movies.dat").write_text("\n".join(movies) + "\n", encoding="latin-1")
    (tmp_path / "ratings.dat").write_text("\n".join(ratings) + "\n", encoding="latin-1")

    train_pinsage.main(COMMON + [
        "--data_dir", str(tmp_path), "--embedding_size", "8",
        "--conv_hidden_size", "16", "--conv_output_size", "8",
        "--train_batch_size", "16",
    ])
    out = capsys.readouterr().out
    assert '"hit_rate"' in out and '"final"' in out


def test_prepare_then_train_ctr(tmp_path, capsys):
    from recommender_tpu.data.criteo import NUM_CAT, NUM_INT

    rng = np.random.default_rng(0)
    rows = []
    for _ in range(600):
        ints = ["" if rng.random() < 0.1 else str(int(rng.integers(0, 50)))
                for _ in range(NUM_INT)]
        cats = [f"c{j}_{int(rng.integers(5))}" for j in range(NUM_CAT)]
        rows.append(str(int(rng.random() < 0.3)) + "\t" + "\t".join(ints)
                    + "\t" + "\t".join(cats))
    raw = tmp_path / "raw.tsv"
    raw.write_text("\n".join(rows) + "\n")
    out_dir = tmp_path / "data"
    prepare_criteo.main([
        "--train", str(raw), "--test", str(raw), "--out_dir", str(out_dir),
        "--min_count", "2", "--shard_rows", "300",
    ])
    train_ctr.main(COMMON + [
        "--model_type", "DLRM", "--data_dir", str(out_dir),
        "--vocab", str(out_dir / "vocab.pkl"), "--vocab_size", "2000",
        "--train_batch_size", "64", "--test_batch_size", "128",
        "--eval_batches", "2",
    ])
    out = capsys.readouterr().out
    assert '"final"' in out
