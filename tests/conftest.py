import pytest

from identity_matching_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="idmatch-tests", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
