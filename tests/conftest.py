import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

REF_DATA = "/root/reference/solaris/data"


def ref(path: str) -> str:
    return os.path.join(REF_DATA, path)


@pytest.fixture(scope="session")
def ref_data_dir():
    return REF_DATA


@pytest.fixture(scope="session")
def spark():
    """Session-wide local SparkSession (local[4] keeps test startup light)."""
    from solaris_spark.session import get_spark

    s = get_spark(app_name="solaris-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
