from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from dup_ocropy_spark.session import get_spark

    s = get_spark("local[4]", app_name="dup_ocropy_spark_tests",
                  shuffle_partitions=8)
    yield s
    s.stop()
