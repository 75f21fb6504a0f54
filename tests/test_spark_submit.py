"""Deployment-mode smoke: ``spark-submit --py-files ids_spark.zip``.

The north rule requires the engine to run "via spark-submit --py-files
on a multi-executor cluster".  This test evidences the packaging half
in-sandbox: it zips the package, copies the pipeline driver OUTSIDE the
repo (so the only way executors and the driver can import
``indigent_defense_stats_spark`` is through the shipped zip), and runs
the full crawl->parse->clean->publish->analytics pipeline under
``spark-submit --master local[8]``.

Reference analog: the user runs ``python -m orchestrator`` from a
checkout (reference: src/orchestrator/__init__.py); here the same
stages run from a zip artifact, which is exactly what a cluster
deployment ships.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this machine"
)
def test_spark_submit_py_files_pipeline(tmp_path):
    zip_base = tmp_path / "ids_spark"
    shutil.make_archive(
        str(zip_base), "zip", root_dir=REPO, base_dir="indigent_defense_stats_spark"
    )
    driver = tmp_path / "run_pipeline.py"
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), driver)

    env = dict(os.environ)
    # Strip any repo path from PYTHONPATH so the zip is the only source.
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and p != REPO
    )
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[8]",
            "--py-files",
            str(zip_base) + ".zip",
            str(driver),
            "--counties",
            "3",
            "--days",
            "1",
            "--base-dir",
            str(tmp_path / "run"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "[done] total" in out
    # Each stage actually produced rows.
    for marker in ("[crawl]", "[parse]", "[clean]", "[publish]", "[analytics]"):
        assert marker in out, f"missing stage output {marker}\n{out[-4000:]}"
    # Published snapshot exists on disk (publish stage wrote parquet).
    pub = tmp_path / "run" / "published"
    assert pub.exists() and any(pub.rglob("*.parquet"))
