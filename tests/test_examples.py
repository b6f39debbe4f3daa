"""Smoke-run every example script end-to-end (VERDICT r4 item #7:
examples are documentation that must execute). Each runs in its own
subprocess — they create and stop their own SparkSession, which must
not touch the suite's shared session."""

import glob
import os
import subprocess
import sys

import pytest

# every example spawns its own subprocess + SparkSession (~15-60 s
# each, ~12 min total): documentation-execution coverage, full tier
pytestmark = pytest.mark.full

EXAMPLES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.py"))
)


def test_examples_exist():
    assert len(EXAMPLES) >= 7


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(path):
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [sys.executable, path],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"{os.path.basename(path)} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
