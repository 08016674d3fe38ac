"""spark-submit --py-files smoke: the packaged job must run under the real
spark-submit binary with the engine resolved from the zip alone (north rule
packaging requirement)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not present"
)
def test_spark_submit_py_files_roundtrip(tmp_path):
    from docling_metrics_spark.shipping import build_zip

    corpus = str(tmp_path / "corpus")
    out_json = str(tmp_path / "result.json")

    # corpus written by a plain local session (the submit job only reads)
    from docling_metrics_spark.session import build_session
    from docling_metrics_spark.datagen import write_corpus

    spark = build_session(master="local[2]", shuffle_partitions=4)
    write_corpus(spark, corpus, n_docs=60, partitions=4)
    spark.stop()

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", build_zip(),
            os.path.join(REPO, "tools", "submit_job.py"),
            corpus, out_json,
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out_json) as f:
        result = json.load(f)
    assert result["n_docs"] == 60
    assert result["span_equal_rate"] == 1.0
    assert 0.0 <= result["avg_edit_distance_score"] <= 1.0
