import pytest

from tsdat_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tsdat_spark_tests", cores=4, shuffle_partitions=4)
    yield spark
