import os
import sys

import pytest

from pgsync_spark import get_spark

# make test modules importable on Spark python workers (plugin classes
# defined in tests are pickled by reference)
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = (
    _TESTS_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
)
if _TESTS_DIR not in sys.path:
    sys.path.insert(0, _TESTS_DIR)

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pgsync_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def catalog(spark):
    from pgsync_spark import Catalog

    return Catalog(spark, SF_DIR)
