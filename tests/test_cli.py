"""Smoke-run every CLI entry point on synthetic data (tiny steps)."""
import numpy as np
import pytest

from recommender_tpu.cli import train_ctr, train_dien, train_eges, train_esmm, train_pinsage

COMMON = ["--synthetic", "--steps", "10", "--log_every", "5", "--eval_every", "0"]


def test_cli_ctr(capsys):
    train_ctr.main(COMMON + [
        "--model_type", "DLRM", "--vocab_size", "2000",
        "--train_batch_size", "128", "--test_batch_size", "256", "--eval_batches", "2",
    ])
    out = capsys.readouterr().out
    assert '"loss"' in out and '"final"' in out


def test_cli_ctr_model_parallel(capsys):
    train_ctr.main(COMMON + [
        "--model_type", "DeepFM", "--vocab_size", "2048",
        "--mesh_model", "2", "--train_batch_size", "64", "--test_batch_size", "128",
        "--eval_batches", "1",
    ])
    assert '"final"' in capsys.readouterr().out


def test_cli_dien(capsys):
    train_dien.main(COMMON + [
        "--model_type", "DIEN", "--history_max_length", "10",
        "--embedding_size", "8", "--train_batch_size", "64",
        "--test_batch_size", "128", "--eval_batches", "2",
    ])
    assert '"final"' in capsys.readouterr().out


def test_cli_esmm(capsys):
    train_esmm.main(COMMON + [
        "--model_type", "MMOE", "--embedding_size", "8",
        "--train_batch_size", "128", "--test_batch_size", "256",
    ])
    out = capsys.readouterr().out
    assert '"cvr_auc"' in out and '"ctcvr_auc"' in out


def test_cli_eges(capsys, tmp_path):
    export = str(tmp_path / "eges_bundle.npz")
    train_eges.main(COMMON + [
        "--model_type", "EGES", "--embedding_size", "16",
        "--train_batch_size", "256", "--export", export,
    ])
    assert '"loss"' in capsys.readouterr().out
    from recommender_tpu.retrieval.export import load_serving_bundle

    b = load_serving_bundle(export)
    assert b["item_reprs"].shape[1] == 16
    assert b["metadata"]["model"] == "EGES"


def test_cli_pinsage(capsys, tmp_path):
    export = str(tmp_path / "pinsage_bundle.npz")
    train_pinsage.main(COMMON + [
        "--train_batch_size", "16", "--top_k", "5", "--export", export,
    ])
    out = capsys.readouterr().out
    assert '"hit_rate"' in out
    from recommender_tpu.retrieval.export import load_serving_bundle, serve_topk

    b = load_serving_bundle(export)
    assert "neighbor_ids" in b
    recs = serve_topk(b, np.array([0, 1]), k=3)
    assert recs.shape == (2, 3)

    # serve CLI over the same bundle
    from recommender_tpu.cli import serve

    out = serve.main(["--bundle", export, "--items", "0,1", "--top_k", "3"])
    np.testing.assert_array_equal(out, recs)
    all_out = str(tmp_path / "recs.npz")
    serve.main(["--bundle", export, "--all", "--top_k", "2", "--out", all_out])
    assert np.load(all_out)["recommendations"].shape[1] == 2


def test_cli_pinsage_int8_export(capsys, tmp_path):
    """--export_int8: trained corpus quantized at export, served through
    the int8 dispatch (bundle carries int8 reprs + scales, no f32)."""
    export = str(tmp_path / "pinsage_q.npz")
    train_pinsage.main(COMMON + [
        "--train_batch_size", "16", "--top_k", "5",
        "--export", export, "--export_int8",
    ])
    capsys.readouterr()
    from recommender_tpu.cli import serve
    from recommender_tpu.retrieval.export import load_serving_bundle

    b = load_serving_bundle(export)
    assert "item_reprs" not in b and b["item_reprs_int8"].dtype == np.int8
    out = serve.main(["--bundle", export, "--items", "0,1", "--top_k", "3"])
    assert out.shape == (2, 3)
    assert (out[0] != 0).all() and (out[1] != 1).all()  # self masked


def test_cli_predict_from_checkpoint(capsys, tmp_path):
    """Train -> checkpoint -> offline batch prediction (cli/predict.py)."""
    from recommender_tpu.cli import predict

    ckpt = str(tmp_path / "ckpt")
    train_ctr.main(COMMON + [
        "--model_type", "DLRM", "--vocab_size", "2000",
        "--train_batch_size", "128", "--test_batch_size", "256",
        "--eval_batches", "1", "--checkpoint_dir", ckpt,
    ])
    capsys.readouterr()
    out_npz = str(tmp_path / "scores.npz")
    predict.main([
        "--family", "ctr", "--model_type", "DLRM", "--synthetic",
        "--checkpoint_dir", ckpt, "--vocab_size", "2000",
        "--batch_size", "100", "--output", out_npz,
    ])
    assert '"predicted"' in capsys.readouterr().out
    scores = np.load(out_npz)["score"]
    assert scores.shape == (400,)
    assert np.all((scores >= 0) & (scores <= 1)) and np.std(scores) > 0


def test_cli_predict_multitask_heads(capsys, tmp_path):
    from recommender_tpu.cli import predict

    ckpt = str(tmp_path / "ckpt")
    train_esmm.main(COMMON + [
        "--model_type", "MMOE", "--embedding_size", "8",
        "--train_batch_size", "128", "--test_batch_size", "256",
        "--checkpoint_dir", ckpt,
    ])
    capsys.readouterr()
    out_npz = str(tmp_path / "heads.npz")
    predict.main([
        "--family", "esmm", "--model_type", "MMOE", "--synthetic",
        "--checkpoint_dir", ckpt, "--vocab_size", "50",
        "--embedding_size", "8", "--batch_size", "128", "--output", out_npz,
    ])
    out = np.load(out_npz)
    assert {"ctr", "ctcvr"} <= set(out.files)
    assert len(out["ctr"]) == 512


def test_cli_predict_dien(capsys, tmp_path):
    from recommender_tpu.cli import predict

    ckpt = str(tmp_path / "ckpt")
    train_dien.main(COMMON + [
        "--model_type", "DIEN", "--history_max_length", "10",
        "--embedding_size", "8", "--train_batch_size", "64",
        "--test_batch_size", "128", "--eval_batches", "1",
        "--checkpoint_dir", ckpt,
    ])
    capsys.readouterr()
    out_npz = str(tmp_path / "dien_scores.npz")
    predict.main([
        "--family", "dien", "--model_type", "DIEN", "--synthetic",
        "--checkpoint_dir", ckpt, "--item_vocab", "1000", "--cat_vocab", "50",
        "--embedding_size", "8", "--batch_size", "64", "--output", out_npz,
    ])
    scores = np.load(out_npz)["score"]
    assert len(scores) == 256 and np.all((scores >= 0) & (scores <= 1))


def test_cli_ctr_a2a_lookup(capsys):
    train_ctr.main(COMMON + [
        "--model_type", "DLRM", "--vocab_size", "2048",
        "--mesh_model", "2", "--lookup_mode", "a2a",
        "--a2a_capacity_factor", "2.0",
        "--train_batch_size", "64", "--test_batch_size", "128",
        "--eval_batches", "1",
    ])
    assert '"final"' in capsys.readouterr().out


def test_cli_dien_bf16(capsys):
    train_dien.main(COMMON + [
        "--model_type", "DIEN", "--history_max_length", "10",
        "--embedding_size", "8", "--embed_dtype", "bf16",
        "--train_batch_size", "64", "--test_batch_size", "128",
        "--eval_batches", "2",
    ])
    assert '"final"' in capsys.readouterr().out
