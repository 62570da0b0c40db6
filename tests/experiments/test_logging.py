"""Logger sinks: local CSV + the S3-compatible remote sink
(reference ``config/logger/{local,s3}.yaml`` via upcycle's
DataFrameLogger/S3Logger)."""

import csv
import os

import pytest

from online_gp_tpu.logging import (
    CSVLogger,
    LocalBucketTransport,
    S3Logger,
    make_logger,
)


def test_s3_logger_syncs_run_directory(tmp_path):
    transport = LocalBucketTransport(str(tmp_path / "buckets"))
    logger = S3Logger(str(tmp_path / "logs"), "runA", bucket_name="bkt",
                      prefix="projects/online_gp", transport=transport)
    logger.add_table("online_metrics")
    logger.log(dict(test_rmse=0.5, noise=0.1), step=1, table_name="online_metrics")
    logger.log(dict(test_rmse=0.4, noise=0.1), step=2, table_name="online_metrics")
    logger.write_config({"model": {"name": "wiski"}})
    logger.write_csv()

    # local staging intact (S3Logger IS a CSVLogger)
    local = tmp_path / "logs" / "runA" / "online_metrics.csv"
    assert local.exists()

    # every artifact mirrored under <root>/<bucket>/<prefix>/<run>/
    remote_dir = tmp_path / "buckets" / "bkt" / "projects/online_gp" / "runA"
    assert (remote_dir / "online_metrics.csv").exists()
    assert (remote_dir / "config.json").exists()
    with open(remote_dir / "online_metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2 and float(rows[-1]["test_rmse"]) == 0.4
    assert len(logger.synced) >= 2


def test_make_logger_dispatch(tmp_path):
    cfg = dict(log_dir=str(tmp_path), logger=dict(name="local"))
    assert type(make_logger(cfg, "r")) is CSVLogger

    cfg_s3 = dict(log_dir=str(tmp_path), logger=dict(
        name="s3", bucket_name="b", prefix="p",
        bucket_root=str(tmp_path / "root")))
    lg = make_logger(cfg_s3, "r")
    assert isinstance(lg, S3Logger)
    assert isinstance(lg.transport, LocalBucketTransport)

    with pytest.raises(ValueError, match="unknown logger"):
        make_logger(dict(log_dir=".", logger=dict(name="wandb")), "r")


def test_driver_with_s3_logger(tmp_path):
    """End-to-end: the regression driver with logger.name=s3 mirrors its
    CSVs into the (filesystem-emulated) bucket."""
    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.regression import regression_trial

    root = str(tmp_path / "bucket_root")
    cfg = parse_config([
        "model=wiski_gp_regression", "dataset=friedman", "stem=eye",
        "dataset.input_dim=2", "stem.input_dim=2",
        "num_batch_epochs=3", "logging_freq=10", "max_stream=20",
        f"log_dir={tmp_path}", "logger.name=s3", "logger.bucket_name=bkt",
        f"logger.bucket_root={root}",
    ])
    out = regression_trial(cfg)
    run = os.path.basename(out["log_dir"].rstrip(os.sep))
    remote = os.path.join(root, "bkt", run, "online_metrics.csv")
    assert os.path.exists(remote), remote
