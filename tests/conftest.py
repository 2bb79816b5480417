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


def pytest_addoption(parser):
    # flake-hunting knob (ref tests/conftest.py:134-152 re-parametrizes
    # every test N times the same way): --repeat 3 runs each collected
    # test three times, surfacing nondeterminism in the streaming and
    # property suites without editing any test
    parser.addoption(
        "--repeat",
        action="store",
        type=int,
        default=1,
        help="run each test N times (flake hunting)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (deselect with -m 'not slow')"
    )


def pytest_generate_tests(metafunc):
    n = metafunc.config.getoption("--repeat")
    if n > 1:
        metafunc.fixturenames.append("__repeat")
        metafunc.parametrize(
            "__repeat", range(n), ids=[f"rep{i}" for i in range(n)]
        )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pgsync_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def catalog(spark):
    from pgsync_spark import Catalog

    return Catalog(spark, SF_DIR)
