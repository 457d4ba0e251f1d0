from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from nlp_entity_linking_spark.conf import get_spark

    s = get_spark(
        app_name="tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()
