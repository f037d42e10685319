import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from whitebox_tools_spark.session import get_spark

    s = get_spark(app_name="wts-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def geodocs_path(tmp_path_factory):
    from whitebox_tools_spark.datagen import write_geodocs

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    path = os.path.join(root, "geodocs_micro")
    write_geodocs(path, 2000, seed=42)
    return path
