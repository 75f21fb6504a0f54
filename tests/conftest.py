from __future__ import annotations

import pytest

from indigent_defense_stats_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ids-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
