"""Gate: tests/COUNTS.txt (the canonical test-count file) matches live
collection — ends the hand-edited count drift (VERDICT r4 item 6).

Slow tier: spawns a fresh pytest collection subprocess (~30 s on this host).
"""
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _parse_counts():
    text = (REPO / "tests" / "COUNTS.txt").read_text()
    return {m.group(1): int(m.group(2))
            for m in re.finditer(r"^(\w+) = (\d+)$", text, re.M)}


def test_counts_file_exists_and_consistent():
    counts = _parse_counts()
    assert set(counts) == {"total", "quick", "slow"}
    assert counts["total"] == counts["quick"] + counts["slow"]


@pytest.mark.slow
def test_counts_match_live_collection():
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    m = re.search(r"(\d+)(?:/\d+)? tests collected", out)
    assert m, f"cannot parse collection output: {out[-500:]}"
    assert int(m.group(1)) == _parse_counts()["total"], (
        "tests/COUNTS.txt is stale — run python scripts/gen_test_counts.py"
    )
