"""Shared fixtures: one SparkSession per test session (local mode)."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ocr_hardsubx_spark.plans.session import get_spark

    s = get_spark(app_name="ocr-hardsubx-spark-tests", cores=4)
    yield s
    s.stop()


def drain_stream(q):
    """Shared streaming-test shutdown: drain everything available, stop,
    and wait — availableNow never self-terminates with
    applyInPandasWithState (verify-skill learning), so every streaming
    test uses this exact protocol."""
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
