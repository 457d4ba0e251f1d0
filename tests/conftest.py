from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from nlp_entity_linking_spark.conf import get_spark

    # local[8] measured faster than local[4] on the CPU-bound tests (e2e
    # pipelines, streaming, brute-force ANN) with no small-test penalty —
    # override with SPARK_GRAFT_TEST_MASTER to reproduce the comparison.
    s = get_spark(
        app_name="tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"),
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()
