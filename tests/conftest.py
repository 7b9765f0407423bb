import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_extract_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
