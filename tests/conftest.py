import pytest

from pgsync_spark import get_spark

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
