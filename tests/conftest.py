import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

REFERENCE = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def fixture_path(*parts):
    return os.path.join(REFERENCE, *parts)


def read_fixture(*parts) -> bytes:
    with open(fixture_path(*parts), "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def spark():
    from html_parser_spark.spark.session import get_spark

    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
