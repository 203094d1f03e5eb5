"""spark-submit --py-files smoke test (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Builds the package zip with scripts/package_pyfiles.py, then runs
scripts/submit_pipeline.py through the REAL spark-submit binary from a
scratch cwd with PYTHONPATH stripped — the package must resolve from
the zip alone, on the driver and in the Python workers. A second
submit against the same checkpoint store must resume as a pure scan
(no new metrics rows committed).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _last_json_line(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON metrics line in stdout:\n{stdout[-2000:]}")


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_submit_pipeline_pyfiles_and_resume(tmp_path):
    zip_path = str(tmp_path / "geo_polygonize_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py"), zip_path],
        check=True, capture_output=True,
    )
    # the app script runs from scratch too — nothing imports from the repo cwd
    app = str(tmp_path / "submit_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_pipeline.py"), app)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    ck = str(tmp_path / "ckpt")
    out = str(tmp_path / "enriched.parquet")
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        app,
        "--n-records", "3000", "--grid", "10", "--tile-size", "5",
        "--ckpt-dir", ck, "--out", out,
    ]
    r1 = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420
    )
    assert r1.returncode == 0, r1.stderr[-4000:]
    m1 = _last_json_line(r1.stdout)
    # 10x10 lattice -> 100 unit cells; every derived point lands inside
    # the full-bbox coverage, so the enriched output is one row per record
    assert m1["n_polygons"] == 100
    assert m1["n_out"] == 3000
    assert m1["resumable"] is True

    def metrics_rows() -> int:
        files = glob.glob(os.path.join(ck, "metrics", "*.parquet"))
        assert files, "checkpoint metrics store missing"
        return duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{ck}/metrics/*.parquet')"
        ).fetchone()[0]

    rows_after_first = metrics_rows()
    assert rows_after_first > 0

    # second submit: identical input -> resume finds nothing pending;
    # the coverage phase is a pure scan and commits NO new metrics rows
    r2 = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420
    )
    assert r2.returncode == 0, r2.stderr[-4000:]
    m2 = _last_json_line(r2.stdout)
    assert m2["n_polygons"] == 100
    assert m2["n_out"] == 3000
    assert metrics_rows() == rows_after_first
