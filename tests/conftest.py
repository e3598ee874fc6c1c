from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lintdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # local[8] measured FASTER than local[32] for this suite (round-16
    # A/B on a 32-core box: 101s vs 125s over the heaviest store
    # tests) — the test corpora are KB-scale, so extra executor slots
    # only add scheduling/GC overhead. SPARK_GRAFT_TEST_CPUS overrides.
    # (AQE-off was also A/B'd for the session: 193s vs 101s on the
    # same subset — WORSE; AQE stays on, matching production config.)
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "0")) or 8
    s = get_spark("lintdb_spark_tests", cpus=cpus, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run tests marked slow (the scheduled lane); the "
        "default lane skips them to hold the <15 min suite budget",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow lane: pass --slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
