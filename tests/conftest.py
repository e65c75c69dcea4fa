import pytest


@pytest.fixture(scope="session")
def spark():
    from gos2_spark.spark.session import get_spark

    s = get_spark(app_name="gos2_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
