import sys

import pytest

sys.path.insert(0, "/root/repo")

from datastream_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def store_root(tmp_path):
    return str(tmp_path / "store")
