import pytest

from docling_parse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="docling_parse_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
