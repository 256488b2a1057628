"""The full registry-oracle sweep as a single pytest gate
(VERDICT r4 #10): every ``__spark_entry__.queries()`` entry value-
matched against its DuckDB oracle, exit-code gated, without the
hour-long main suite. Excluded from default runs via the
``full_sweep`` marker (see pytest.ini) — invoke with:

    python -m pytest -m full_sweep -q

Set ``PHOLCUS_SWEEP_SF_DIR`` to sweep a different scale factor
(default sf0.001 keeps the sweep minutes-scale; the driver's own gate
runs at sf0.01)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.full_sweep
def test_every_registry_query_matches_its_oracle():
    sf_dir = os.environ.get(
        "PHOLCUS_SWEEP_SF_DIR", "/root/testdata/sf0.001"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "check_oracle.py"),
         sf_dir],
        capture_output=True,
        text=True,
        cwd=_REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, (
        f"check_oracle failed (exit {proc.returncode}); tail:\n{tail}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}"
    )
