import pytest


@pytest.fixture(scope="session")
def spark():
    from geo_spark.session import get_spark

    s = get_spark(app="geo_spark_tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
