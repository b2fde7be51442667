"""Shared pytest fixtures (analogue of /root/reference/tests/conftest.py:41-69:
session fixtures with rollback isolation + reduced batch sizes — here: one
shared local SparkSession and per-test temp table roots)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from etl_spark.session import get_spark

    s = get_spark(app_name="etl_spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="etl_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
