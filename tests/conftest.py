import pytest


@pytest.fixture(scope="session")
def spark():
    from bano_spark.session import get_session

    s = get_session("tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
