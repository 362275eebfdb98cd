"""Session-factory S3A wiring (SURVEY §2 S8): the reference's
``configure_s3`` surface (spark_session_factory.py:44-51,74-81) must be
reproducible through ``get_spark_session`` kwargs — asserted on the pure
conf builder, no JVM required."""

from __future__ import annotations

from deg04_local_data_lake_spark.session import s3a_conf


def test_s3a_conf_mirrors_reference_configure_s3():
    conf = s3a_conf(
        endpoint="http://minio:9000",
        access_key="minioadmin",
        secret_key="miniosecret",
    )
    # one assertion per hadoopConfiguration().set line in the reference
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "minioadmin"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "miniosecret"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    assert (
        conf["spark.hadoop.fs.s3a.impl"]
        == "org.apache.hadoop.fs.s3a.S3AFileSystem"
    )


def test_s3a_conf_ssl_and_virtual_host_toggles():
    conf = s3a_conf(
        endpoint="https://s3.us-east-1.amazonaws.com",
        path_style=False,
        ssl=True,
    )
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "false"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "true"
    # no credentials supplied: provider-chain auth, no key entries
    assert "spark.hadoop.fs.s3a.access.key" not in conf
    assert "spark.hadoop.fs.s3a.secret.key" not in conf


def test_s3a_conf_empty_without_s3_params():
    assert s3a_conf() == {}
