import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from olap_storage_engine_spark import get_spark

    s = get_spark(app_name="olap-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")
