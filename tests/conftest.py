import pytest

from gclog_parser_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test"
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
