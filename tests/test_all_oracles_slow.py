"""Full-registry differential harness as a (gated) pytest.

ADVICE r03: queries rotated outside the driver's 50-slot correctness
window had no automated oracle check — a regression there would be
invisible to both the driver and the default pytest suite. This test
runs scripts/check_correctness.py (every registered query, Spark vs
DuckDB, at sf0.01) end to end.

Gated behind RUN_SLOW=1 because it takes several minutes; run it
before shipping registry/oracle changes:

    RUN_SLOW=1 python -m pytest tests/test_all_oracles_slow.py -s
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="full 87-query differential harness (~10 min); set RUN_SLOW=1",
)
def test_every_registered_oracle_passes():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"differential harness failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert ", 0 failed" in proc.stdout
