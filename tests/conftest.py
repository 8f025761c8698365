from __future__ import annotations

import pytest

from posik_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="posik-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
