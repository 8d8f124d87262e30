"""Hot-term skew defense + full-scan oracle (Q10).

North rule: hot terms must not serialize onto one reducer. The pack shuffle
range-partitions on (term, doc_ord), so a term present in EVERY doc splits
across partitions into doc-disjoint block runs — asserted here directly on
the artifact's part_id metadata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index import build_index
from searchengine_spark.index.artifact import build_artifact


def test_hot_term_splits_across_partitions(spark, tmp_path):
    # 4,000 docs, every one containing the hot term; plus a rare term
    rows = [
        (f"d{i:05d}", "hotterm filler" + str(i % 7) + (" raregem" if i == 17 else ""))
        for i in range(4000)
    ]
    corpus = spark.createDataFrame(rows, "doc_id string, text string").repartition(8)
    aidx = build_artifact(
        spark, corpus, str(tmp_path / "idx"), analyzer="punctuation",
        pack_partitions=8,
    )
    hot = aidx.blocks.where(F.col("term") == "hotterm").select(
        "part_id", "first_ord", "last_ord", "n"
    ).collect()
    parts = {r["part_id"] for r in hot}
    assert len(parts) > 1, "hot term landed on a single partition"
    # doc ranges across the split are disjoint (packing stays doc-ordered)
    spans = sorted((r["first_ord"], r["last_ord"]) for r in hot)
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 < a2
    assert sum(r["n"] for r in hot) == 4000
    # rare term still queries correctly next to the hot one
    assert aidx.search_and("hotterm raregem").count() == 1


def test_full_scan_search_oracle(spark, tiny_corpus):
    idx = build_index(spark, tiny_corpus.select("doc_id", "text"), cache=False)
    idx.corpus = tiny_corpus
    for kw in ["zqmarkeralpha", "error function", "the"]:
        via_index = sorted(r["doc_id"] for r in idx.search_and(kw).collect())
        via_scan = sorted(r["doc_id"] for r in idx.full_scan_search(kw).collect())
        assert via_index == via_scan, kw


def test_full_scan_respects_tombstones(spark, tiny_corpus):
    idx = build_index(spark, tiny_corpus.select("doc_id", "text"), cache=False)
    idx.corpus = tiny_corpus
    n_before = idx.full_scan_search("zqmarkeralpha").count()
    assert n_before > 0
    idx.delete_documents("zqmarkeralpha")
    assert idx.full_scan_search("zqmarkeralpha").count() == 0


def test_unicode_cjk_pipeline(spark, tmp_path):
    """CJK/emoji/accents survive the whole pipeline: analyze -> pack ->
    decode -> query (punctuation tokenizer treats CJK runs as single
    tokens; only ,.;?! and whitespace split)."""
    rows = [
        ("u1", "データ 処理 エンジン search engine"),
        ("u2", "naïve café データ résumé!"),
        ("u3", "emoji 🚀 rocket, data 処理"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id string, text string")
    aidx = build_artifact(
        spark, corpus, str(tmp_path / "uidx"), analyzer="punctuation"
    )
    assert sorted(
        r["doc_id"] for r in aidx.search_keyword("処理").collect()
    ) == ["u1", "u3"]
    assert [r["doc_id"] for r in aidx.search_keyword("naïve").collect()] == ["u2"]
    assert [r["doc_id"] for r in aidx.search_keyword("🚀").collect()] == ["u3"]
    # "café" keeps its accent; "data" appears in u3 only (u1 has データ)
    assert [r["doc_id"] for r in aidx.search_and("data emoji").collect()] == ["u3"]
    top = aidx.search_bm25("データ 処理", 3).collect()
    assert top and top[0]["doc_id"] == "u1"
