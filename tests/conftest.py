import pytest


@pytest.fixture(scope="session")
def spark():
    from parquet_playground_rs_spark.session import get_spark

    s = get_spark(app="tests", cores=4, shuffle_partitions=4, driver_mem="8g")
    yield s
    s.stop()
