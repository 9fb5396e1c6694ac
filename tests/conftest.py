import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from orion_spark.session import get_spark

    s = get_spark(app_name="orion-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
