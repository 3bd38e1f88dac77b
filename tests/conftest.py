import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pagerank_barrierfree_openmp_dynamic_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small parallelism for test speed; kernels are partition-count agnostic.
    # AQE off in tests: correctness is AQE-independent and per-iteration
    # stage re-planning dominates wall time on tiny fixtures. Bench keeps AQE on.
    s = get_spark(
        app_name="tests",
        cpus=4,
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s
