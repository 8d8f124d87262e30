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


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_lifecycle_commands(spark, tmp_path):
    """append / snapshots / tag / changelog / expire through REAL
    spark-submit: one ingestion increment lands as a committed segment
    (idempotent per --batch-id), tags pin versions through expiry, and
    the changelog counts exactly the appended docs."""
    from searchengine_spark.fixtures import transcripts_df

    src1 = str(tmp_path / "t1")
    src2 = str(tmp_path / "t2")
    out = str(tmp_path / "artifact")
    corpus = transcripts_df(spark, "tiny")
    first = corpus.where("conv_id < 'conv-00000015'")
    second = corpus.where("conv_id >= 'conv-00000015'")
    first.select("conv_id", "turn_idx", "text").write.parquet(src1)
    second.select("conv_id", "turn_idx", "text").write.parquet(src2)

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
            cwd=str(tmp_path),
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return [
            json.loads(l) for l in proc.stdout.splitlines()
            if l.startswith(("{", "["))
        ][-1]

    built = submit("build", "--input", src1, "--output", out)
    base_snap = built["snapshot_id"]
    appended = submit(
        "append", "--input", src2, "--index", out, "--batch-id", "7"
    )
    assert appended["n_docs"] == corpus.count()
    assert appended["segments"] == 2
    # replay with the same batch id is a no-op (idempotent ingestion)
    replay = submit(
        "append", "--input", src2, "--index", out, "--batch-id", "7"
    )
    assert replay["n_docs"] == corpus.count()
    assert replay["segments"] == 2

    tagged = submit("tag", "--index", out, "--name", "v1",
                    "--snapshot-id", str(base_snap))
    assert tagged["snapshot_id"] == base_snap
    snaps = submit("snapshots", "--index", out)
    assert [s["snapshot_id"] for s in snaps] == sorted(
        s["snapshot_id"] for s in snaps
    )
    assert any(s["tags"] == ["v1"] for s in snaps)

    change = submit("changelog", "--index", out,
                    "--from-snapshot", str(base_snap))
    assert change["n_added"] == second.count()

    # expire keeps the tagged base snapshot; untag then expire drops it
    gone = submit("expire", "--index", out, "--keep-last", "1")
    assert gone["snapshots_removed"] == 0
    submit("tag", "--index", out, "--name", "v1", "--remove")
    gone = submit("expire", "--index", out, "--keep-last", "1")
    assert gone["snapshots_removed"] == 1


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_export_commands(spark, tmp_path):
    """doc-vectors / ltr-features through REAL spark-submit: the training
    exports land as parquet and agree with the in-process operators."""
    from searchengine_spark.fixtures import doc_key_col, transcripts_df
    from searchengine_spark.index import build_index
    from searchengine_spark.query.ltr import ltr_features
    from searchengine_spark.query.morelike import doc_vectors

    src = str(tmp_path / "transcripts")
    out = str(tmp_path / "artifact")
    corpus = transcripts_df(spark, "tiny")
    corpus.select("conv_id", "turn_idx", "text").write.parquet(src)

    pkg_zip = shutil.make_archive(
        str(tmp_path / "searchengine_spark_pyfiles"), "zip", REPO,
        "searchengine_spark",
    )

    def submit(*argv) -> dict:
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
            cwd=str(tmp_path),
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return [
            json.loads(l) for l in proc.stdout.splitlines()
            if l.startswith("{")
        ][-1]

    submit("build", "--input", src, "--output", out)

    dv_out = str(tmp_path / "doc_vectors")
    dv = submit("doc-vectors", "--index", out, "--output", dv_out,
                "--n-terms", "3")
    # twin: the in-process logical index over the same corpus
    lidx = build_index(
        spark, corpus.withColumn("doc_id", doc_key_col()), cache=False
    )
    want = sorted(
        (r.doc_id, r.term, r.weight_r, r.rank)
        for r in doc_vectors(lidx, n_terms=3).collect()
    )
    got = sorted(
        (r.doc_id, r.term, r.weight_r, r.rank)
        for r in spark.read.parquet(dv_out).collect()
    )
    assert dv["rows"] == len(want) and got == want

    lt_out = str(tmp_path / "ltr")
    qjson = json.dumps({"q0": "spark shuffle error", "q1": "merge sort"})
    lt = submit("ltr-features", "--index", out, "--output", lt_out,
                "--queries", qjson, "--k", "5")
    want_lt = sorted(
        tuple(r)
        for r in ltr_features(
            lidx, {"q0": "spark shuffle error", "q1": "merge sort"}, k=5
        ).collect()
    )
    got_lt = sorted(tuple(r) for r in spark.read.parquet(lt_out).collect())
    assert lt["rows"] == len(want_lt) and got_lt == want_lt

    # proximity flag: the exported feature table carries min_pair_dist and
    # agrees with the in-process operator
    ltp_out = str(tmp_path / "ltr_prox")
    ltp = submit("ltr-features", "--index", out, "--output", ltp_out,
                 "--queries", qjson, "--k", "5", "--proximity")
    want_ltp = sorted(
        tuple(r)
        for r in ltr_features(
            lidx, {"q0": "spark shuffle error", "q1": "merge sort"}, k=5,
            proximity=True,
        ).collect()
    )
    got_ltp_df = spark.read.parquet(ltp_out)
    assert "min_pair_dist" in got_ltp_df.columns
    got_ltp = sorted(tuple(r) for r in got_ltp_df.collect())
    assert ltp["rows"] == len(want_ltp) and got_ltp == want_ltp

    # conv-dedup: exact re-logs classified through the CLI surface
    from pyspark.sql import functions as F

    cd_src = str(tmp_path / "transcripts_dup")
    base4 = corpus.select("conv_id", "turn_idx", "role", "text")
    base4.unionByName(
        base4.where(F.substring("conv_id", -1, 1) == "1").withColumn(
            "conv_id", F.concat(F.lit("re-"), F.col("conv_id"))
        )
    ).write.parquet(cd_src)
    cd_out = str(tmp_path / "conv_dedup")
    cd = submit("conv-dedup", "--input", cd_src, "--output", cd_out)
    assert cd["by_status"].get("exact_dup", 0) == 2  # conv ids ending in 1
    assert cd["convs"] == 22
    got_cd = {
        r.conv_id: (r.status, r.dup_of)
        for r in spark.read.parquet(cd_out).collect()
    }
    assert got_cd["re-conv-00000001"] == ("exact_dup", "conv-00000001")


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_write_audit_publish(spark, tmp_path):
    """WAP through REAL spark-submit: a staged append on an audit branch is
    invisible to main's changelog until branch --publish fast-forwards."""
    from searchengine_spark.fixtures import transcripts_df

    src1 = str(tmp_path / "t1")
    src2 = str(tmp_path / "t2")
    out = str(tmp_path / "artifact")
    corpus = transcripts_df(spark, "tiny")
    first = corpus.where("conv_id < 'conv-00000015'")
    second = corpus.where("conv_id >= 'conv-00000015'")
    first.select("conv_id", "turn_idx", "text").write.parquet(src1)
    second.select("conv_id", "turn_idx", "text").write.parquet(src2)

    pkg_zip = shutil.make_archive(
        str(tmp_path / "searchengine_spark_pyfiles"), "zip", REPO,
        "searchengine_spark",
    )

    def submit(*argv) -> dict:
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
            cwd=str(tmp_path),
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return [
            json.loads(l) for l in proc.stdout.splitlines()
            if l.startswith(("{", "["))
        ][-1]

    built = submit("build", "--input", src1, "--output", out)
    base = built["snapshot_id"]
    created = submit("branch", "--index", out, "--create", "audit")
    assert created["snapshot_id"] == base
    staged = submit(
        "append", "--input", src2, "--index", out,
        "--branch", "audit", "--batch-id", "9",
    )
    assert staged["branch"] == "audit" and staged["segments"] == 2
    # main's changelog sees NOTHING staged
    change = submit("changelog", "--index", out, "--from-snapshot", str(base))
    assert change["n_added"] == 0
    snaps = submit("snapshots", "--index", out)
    by_id = {s["snapshot_id"]: s for s in snaps}
    assert "main" in by_id[base]["branches"]
    assert "audit" in by_id[staged["snapshot_id"]]["branches"]
    # publish, then main's changelog reports exactly the staged docs
    pub = submit("branch", "--index", out, "--publish", "audit")
    assert pub["main_at"] == staged["snapshot_id"]
    change2 = submit("changelog", "--index", out, "--from-snapshot", str(base))
    assert change2["n_added"] == second.count()


def test_spark_submit_curation_commands(spark, tmp_path):
    """classify / shard-export through REAL spark-submit: the curation
    stages land as parquet and agree with the in-process operators."""
    from pyspark.sql import functions as F

    from searchengine_spark.textops import classifier as clf
    from searchengine_spark.textops import sharding as shd

    src = str(tmp_path / "docs")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    docs.write.parquet(src)

    pkg_zip = shutil.make_archive(
        str(tmp_path / "searchengine_spark_pyfiles"), "zip", REPO,
        "searchengine_spark",
    )

    def submit(*argv) -> dict:
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
            cwd=str(tmp_path),
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return [
            json.loads(l) for l in proc.stdout.splitlines()
            if l.startswith("{")
        ][-1]

    cl_out = str(tmp_path / "classified")
    rep = submit("classify", "--input", src, "--output", cl_out)
    want = {
        (r["doc_id"], r["n_grams"], r["w_sum_milli"], r["keep"])
        for r in clf.classifier_scores(docs).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(cl_out)
        .select("doc_id", "n_grams", "w_sum_milli", "keep")
        .collect()
    }
    assert got == want
    assert rep["docs_scored"] == len(want)
    assert rep["docs_kept"] == sum(1 for t in want if t[3])

    ko_out = str(tmp_path / "classified_keep")
    rep2 = submit("classify", "--input", src, "--output", ko_out,
                  "--keep-only", "--threshold-milli", "0")
    kept = spark.read.parquet(ko_out)
    assert kept.where(~F.col("keep")).count() == 0
    assert rep2["docs_kept"] == rep2["docs_scored"] == kept.count()

    sh_out = str(tmp_path / "shards")
    rep3 = submit("shard-export", "--input", src, "--output", sh_out,
                  "--shards", "8")
    assert rep3["shards"] == 8 and rep3["docs"] == docs.count()
    # shard 0 reads back in the same deterministic order as the
    # in-process export path
    want_ids = [
        r["doc_id"] for r in shd.read_shard(spark, sh_out, 0).collect()
    ]
    a = shd.shard_assignments(docs, n_shards=8)
    expect = [
        r["doc_id"]
        for r in a.where("shard = 0").orderBy("order_key").collect()
    ]
    assert want_ids == expect and len(want_ids) > 0
