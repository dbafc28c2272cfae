import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def pytest_collection_modifyitems(session, config, items):
    """Run the oracle gate FIRST (r12 verdict item 1b): the all-169
    exact-value comparison is the artifact the driver's window must
    protect, so if a capture/timeout truncates the run mid-suite the
    value check has already completed. Within each group the original
    file order is kept (stable sort)."""
    def key(item):
        return 0 if "test_entry_oracle" in item.nodeid else 1

    items.sort(key=key)


@pytest.fixture(scope="session")
def spark():
    # local[8] (was local[4]): the suite's shuffles run at
    # spark.sql.shuffle.partitions=8, so 4 cores ran every reduce
    # stage in two waves on a 32-core box — measured 1103-test suite
    # wall time 86 min at local[4]; the bump plus the oracle-first
    # ordering exists to keep the driver's pytest gate inside its
    # capture window (r12 verdict item 1b). Plan shapes are
    # core-count-independent (shuffle.partitions unchanged), but
    # createDataFrame slicing follows defaultParallelism and several
    # fits are partitioning-sensitive (k-means|| sampling draws) — pin
    # default.parallelism to the old core count so every test computes
    # on EXACTLY the r12-suite partitioning while 8 cores execute it
    # (verified: ivf_sq residual test draws different-but-valid coarse
    # centers at 8 slices and trips its 3x margin; identical at 4).
    s = (
        SparkSession.builder.master("local[8]")
        .appName("gkmeans-tests")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias usable inside hypothesis @given bodies (session-scoped, so
    the function-scoped-fixture health check stays quiet)."""
    return spark


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
