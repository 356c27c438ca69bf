"""TensorBoard event-file writer (core/tensorboard.py).

Validates the CRC32C implementation against the published test vector and
round-trips scalars through the TFRecord/proto encoding, so files written
here are readable by stock TensorBoard.
"""
import math

from recommender_tpu.core.tensorboard import SummaryWriter, crc32c, read_scalars


def test_crc32c_standard_vector():
    # RFC 3720 / public CRC-32C test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_round_trip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalar("train/loss", 0.693, step=10)
    w.scalar("train/auc", 0.75, step=10)
    w.scalar("train/loss", 0.5, step=200)
    w.close()
    got = read_scalars(w.path)
    assert [(s, t) for s, t, _ in got] == [
        (10, "train/loss"), (10, "train/auc"), (200, "train/loss")]
    assert abs(got[0][2] - 0.693) < 1e-6
    assert abs(got[2][2] - 0.5) < 1e-7


def test_scalars_dict_filters_non_numeric(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalars({"step": 5, "loss": 1.25, "note": "hi", "flag": True, "n": 3}, step=5)
    w.close()
    got = read_scalars(w.path)
    assert sorted(t for _, t, _ in got) == ["loss", "n"]
    assert all(s == 5 for s, _, _ in got)


def test_cli_writes_events(tmp_path):
    from recommender_tpu.cli.train_ctr import main

    tb = tmp_path / "tb"
    main([
        "--synthetic", "--steps", "4", "--train_batch_size", "32",
        "--test_batch_size", "64", "--vocab_size", "128",
        "--embedding_size", "8", "--eval_every", "0", "--log_every", "2",
        "--tensorboard_dir", str(tb),
    ])
    files = list(tb.glob("events.out.tfevents.*"))
    assert len(files) == 1
    got = read_scalars(str(files[0]))
    assert any(t == "loss" for _, t, _ in got)
    assert all(math.isfinite(v) for _, _, v in got)


def test_nonfinite_values_skipped(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalars({"loss": float("nan"), "auc": float("inf"), "ok": 1.0}, step=1)
    w.close()
    got = read_scalars(w.path)
    assert [(s, t) for s, t, _ in got] == [(1, "ok")]


def test_two_writers_same_second_distinct_files(tmp_path):
    a = SummaryWriter(str(tmp_path))
    b = SummaryWriter(str(tmp_path))
    a.scalar("x", 1.0, 1)
    b.scalar("x", 2.0, 1)
    a.close(); b.close()
    assert a.path != b.path
    assert read_scalars(a.path) == [(1, "x", 1.0)]
    assert read_scalars(b.path) == [(1, "x", 2.0)]


def test_role_prefix_logger(tmp_path, capsys):
    import argparse
    from recommender_tpu.cli.common import make_logger

    args = argparse.Namespace(tensorboard_dir=str(tmp_path))
    log = make_logger(args, prefix="ctr/")
    log({"loss": 0.5, "step": 3})
    out = capsys.readouterr().out
    assert '"role": "ctr"' in out
    import glob
    got = read_scalars(glob.glob(str(tmp_path / "events.*"))[0])
    assert got == [(3, "ctr/loss", 0.5)]
