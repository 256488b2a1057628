"""End-to-end `spark-submit --py-files` deployment test.

The north rule requires the engine to run via `spark-submit --py-files`
and resume mid-crawl from the snapshot checkpoint. This test exercises
exactly that, at process level: zip the package, submit a crawl from a
clean working directory (the zip is the ONLY way `pholcus_spark` can
import), stop it mid-crawl via --max-rounds, then re-submit against the
same store and let it run to its page budget. Reference deployment
counterpart: the single Go binary + flag surface in
/root/reference/exec/exec.go:94-120.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(dest: Path) -> Path:
    zpath = dest / "pholcus_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for src in sorted((REPO / "pholcus_spark").rglob("*.py")):
            zf.write(src, src.relative_to(REPO))
    return zpath


def _submit(workdir: Path, zpath: Path, *app_args: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.driver.memory=2g",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zpath),
        str(workdir / "submit_crawl.py"),
        *app_args,
    ]
    proc = subprocess.run(
        cmd, cwd=workdir, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    # the CLI prints its result as the last stdout JSON line
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    return json.loads(lines[-1])


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_resume(tmp_path):
    zpath = _build_zip(tmp_path)
    shutil.copy(REPO / "tools" / "submit_crawl.py", tmp_path / "submit_crawl.py")
    store = tmp_path / "store"
    common = [
        "--store", str(store),
        "--n-hosts", "6",
        "--batch-size", "16",
        "--limit", "80",
    ]

    # leg 1: seeded crawl, stopped mid-crawl by the round cap
    first = _submit(
        tmp_path, zpath,
        *common, "--synthetic-seeds", "8", "--max-rounds", "2",
    )
    assert first["rounds"] == 2
    assert 0 < first["visits"] < 80
    snap1 = first["snapshot_id"]
    assert snap1 is not None

    # leg 2: pure resume from the committed snapshot (no seeds), runs
    # to the page budget
    second = _submit(tmp_path, zpath, *common, "--max-rounds", "200")
    assert second["items"] == 80
    assert second["visits"] >= first["visits"]
    assert second["snapshot_id"] != snap1
