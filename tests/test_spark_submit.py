"""The north rule's literal deployment shape: ``spark-submit
--py-files dist/duke_spark.zip jobs/build_kg.py`` must work with the
zip — not the repo checkout — providing the package (BASELINE.json
north_rule: "run via spark-submit --py-files").

Skipped when no spark-submit binary is on PATH (library-only installs).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None,
    reason="spark-submit not on PATH")


def test_spark_submit_py_files_end_to_end(tmp_path):
    """Build the zip, launch build_kg through spark-submit from a
    NEUTRAL cwd (so the repo is not importable from '.'), and check the
    job's JSON summary + written triples parquet."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package as pkg
    zip_path = pkg.build()
    assert os.path.exists(zip_path)

    out = tmp_path / "kg_out"
    env = dict(os.environ, OPENBLAS_NUM_THREADS="1", OMP_NUM_THREADS="1")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "build_kg.py"),
         "--convs", "20", "--out", str(out), "--parallelism", "2"],
        capture_output=True, text=True, env=env,
        cwd=str(tmp_path), timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    rec = json.loads(lines[-1])
    assert rec["job"] == "build_kg"
    assert rec["triples"] > 0
    assert (out / "triples").exists() or any(out.iterdir())
