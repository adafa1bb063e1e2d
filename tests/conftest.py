import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("MIGBQ_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    from migbq_spark.session import get_spark

    s = get_spark(app_name="migbq-tests", cpus=os.environ.get("MIGBQ_TEST_CPUS", "8"),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from migbq_spark.testing import duckdb_conn

    con = duckdb_conn(SF_DIR)
    yield con
    con.close()
