from __future__ import annotations

import pytest

from big_data_data_lake_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
