"""North-rule launch path: `spark-submit --py-files pulse_spark.zip
submit.py ...` must work end-to-end in a FRESH driver JVM — the library
shipped ONLY as the zip (no install, repo not on sys.path), the master
and confs inherited from spark-submit, build then search over real
parquet."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_build_and_search(transcripts_path, tmp_path):
    zip_path = tmp_path / "pulse_spark.zip"
    pkg = os.path.join(REPO, "pulse_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    # the app file is COPIED out of the repo: only --py-files may provide
    # the library (spark-submit adds the app file's own directory to
    # sys.path, which would silently fall back to the checkout)
    app = tmp_path / "submit.py"
    shutil.copy(os.path.join(REPO, "submit.py"), app)

    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    env.pop("PYTHONPATH", None)
    out_dir = tmp_path / "idx"

    def submit(*args):
        cmd = [
            SPARK_SUBMIT, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--py-files", str(zip_path),
            str(app), *args,
        ]
        return subprocess.run(cmd, cwd=str(tmp_path), env=env,
                              capture_output=True, text=True, timeout=600)

    p = submit("build", "--input", transcripts_path,
               "--output", str(out_dir), "--segments")
    assert p.returncode == 0, p.stderr[-3000:]
    info = json.loads(
        [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert info["n_docs"] > 0
    assert os.path.exists(out_dir / "manifest.json")

    # the submitted conf reached the session (not stomped by get_spark's
    # local-mode default — session.py's submit-mode detection)
    with open(out_dir / "manifest.json") as f:
        manifest = json.load(f)
    assert manifest["stages"]["docs"]["rows"] == info["n_docs"]

    p2 = submit("search", "--index", str(out_dir),
                "--query", "spark executor shuffle", "-k", "5")
    assert p2.returncode == 0, p2.stderr[-3000:]
    hits = [ln for ln in p2.stdout.splitlines()
            if ln and not ln.startswith(("#", "{"))]
    assert hits, p2.stdout[-2000:]
