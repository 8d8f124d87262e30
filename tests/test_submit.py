"""North-rule contract: the pipeline runs via REAL ``spark-submit
--py-files`` (fresh driver JVM, package shipped as a zip, executors import
it from the archive) — build then query, results rank-identical to the
in-process engine over the same corpus."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark  # the pip wheel ships its own launcher scripts

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


SPARK_SUBMIT = _find_spark_submit()


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_build_then_query(spark, tmp_path):
    from searchengine_spark.fixtures import transcripts_df
    from searchengine_spark.index import build_index
    from searchengine_spark.fixtures import doc_key_col

    src = str(tmp_path / "transcripts")
    out = str(tmp_path / "artifact")
    corpus = transcripts_df(spark, "tiny")
    corpus.select("conv_id", "turn_idx", "text").write.parquet(src)

    pkg_zip = shutil.make_archive(
        str(tmp_path / "searchengine_spark_pyfiles"), "zip", REPO,
        "searchengine_spark",
    )

    def submit(*argv) -> str:
        proc = subprocess.run(
            [
                SPARK_SUBMIT, "--master", "local[2]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.ui.showConsoleProgress=false",
                "--py-files", pkg_zip,
                os.path.join(REPO, "scripts", "submit_job.py"), *argv,
            ],
            capture_output=True, text=True, timeout=600,
            cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return proc.stdout

    build_out = submit(
        "build", "--input", src, "--output", out, "--segments", "2"
    )
    summary = json.loads(
        [l for l in build_out.splitlines() if l.startswith("{")][-1]
    )
    assert summary["n_docs"] == corpus.count()
    assert summary["segments"] == 2 and summary["postings"] > 0

    query_out = submit(
        "query", "--index", out, "--q", "spark shuffle error", "--k", "5"
    )
    got = [
        (json.loads(l)["doc_id"], round(json.loads(l)["score"], 9))
        for l in query_out.splitlines()
        if l.startswith("{")
    ]
    # rank-identical to the in-process engine over the same docs
    lidx = build_index(
        spark,
        corpus.withColumn("doc_id", doc_key_col()).select("doc_id", "text"),
        cache=False,
    )
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in lidx.search_bm25("spark shuffle error", 5).collect()
    ]
    assert got == want
