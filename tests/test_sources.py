"""JSONL transcript ingestion: schema enforcement, implicit turn indexes,
malformed-line quarantine, round-trip into the index build."""

import json

import pytest


def _write_jsonl(tmp_path, lines):
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_roundtrip_and_implicit_turn_idx(spark, tmp_path):
    from searchengine_spark.sources import read_transcripts_jsonl

    lines = [
        json.dumps(
            {
                "conv_id": "c-1",
                "turns": [
                    {"turn_idx": 0, "role": "user", "text": "hello spark",
                     "tool": "", "ts": "2026-01-01T00:00:00"},
                    {"turn_idx": 1, "role": "assistant",
                     "text": "shuffle error", "tool": "search",
                     "ts": "2026-01-01T00:00:30"},
                ],
            }
        ),
        # no explicit turn_idx: position in the array is the index
        json.dumps(
            {
                "conv_id": "c-2",
                "turns": [
                    {"role": "user", "text": "first"},
                    {"role": "assistant", "text": "second"},
                ],
            }
        ),
    ]
    turns, bad = read_transcripts_jsonl(spark, _write_jsonl(tmp_path, lines))
    assert bad.isEmpty()
    rows = {(r.conv_id, r.turn_idx): r for r in turns.collect()}
    assert set(rows) == {("c-1", 0), ("c-1", 1), ("c-2", 0), ("c-2", 1)}
    assert rows[("c-1", 1)].tool == "search"
    assert rows[("c-2", 1)].text == "second"
    assert rows[("c-2", 0)].tool == ""  # defaults applied
    assert rows[("c-1", 0)].ts is not None
    # canonical column set, ready for build_index
    assert turns.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_jsonl_malformed_lines_quarantined_not_fatal(spark, tmp_path):
    from searchengine_spark.sources import read_transcripts_jsonl

    lines = [
        json.dumps({"conv_id": "ok", "turns": [{"role": "user", "text": "x"}]}),
        "{this is not json",
        json.dumps({"turns": [{"role": "user", "text": "no conv id"}]}),
    ]
    path = _write_jsonl(tmp_path, lines)
    turns, bad = read_transcripts_jsonl(spark, path)
    assert turns.count() == 1
    assert bad.count() == 2
    # strict mode raises instead
    with pytest.raises(ValueError, match="malformed"):
        read_transcripts_jsonl(spark, path, strict=True)


def test_jsonl_feeds_index_build(spark, tmp_path):
    import pyspark.sql.functions as F

    from searchengine_spark.index import build_index
    from searchengine_spark.sources import read_transcripts_jsonl

    lines = [
        json.dumps(
            {
                "conv_id": f"c-{i}",
                "turns": [
                    {"role": "user", "text": f"spark shuffle doc {i}"},
                    {"role": "assistant", "text": "zqmarkergamma result"},
                ],
            }
        )
        for i in range(4)
    ]
    turns, _ = read_transcripts_jsonl(spark, _write_jsonl(tmp_path, lines))
    corpus = turns.withColumn(
        "doc_id", F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"))
    )
    idx = build_index(spark, corpus, analyzer="punctuation", cache=False)
    assert idx.search_keyword("zqmarkergamma").count() == 4
    assert idx.search_keyword("doc").count() == 4


def test_parse_json_col(spark):
    from searchengine_spark.sources import parse_json_col

    rows = [
        (1, '{"k": 7, "tag": "a"}'),
        (2, '{"k": "not-an-int", "tag": "b"}'),  # type miss -> NULL k
        (3, "{broken json"),                      # malformed -> all NULL
        (4, None),                                # NULL payload -> all NULL
        (5, '{"tag": "e"}'),                      # missing field -> NULL k
    ]
    df = spark.createDataFrame(rows, "event_id long, props string")
    out = {
        r["event_id"]: r
        for r in parse_json_col(df, "props", "k INT, tag STRING").collect()
    }
    assert out[1]["k"] == 7 and out[1]["tag"] == "a"
    assert out[2]["k"] is None and out[2]["tag"] == "b"
    assert out[3]["k"] is None and out[3]["tag"] is None
    assert out[4]["k"] is None and out[4]["tag"] is None
    assert out[5]["k"] is None and out[5]["tag"] == "e"
    assert "props" not in out[1].asDict()
    # prefix + keep the raw column
    kept = parse_json_col(df, "props", "k INT", prefix="p_", drop=False)
    assert set(kept.columns) == {"event_id", "props", "p_k"}


def test_parse_json_col_parameterized_and_nested_types(spark):
    """DDL with parameterized/nested types must parse (a comma-split on
    the schema string used to break DECIMAL(10,2) and MAP<...>)."""
    from searchengine_spark.sources import parse_json_col

    rows = [(1, '{"price": "12.34", "k": 5, "m": {"a": 1}}')]
    df = spark.createDataFrame(rows, "event_id long, props string")
    out = parse_json_col(
        df, "props", "price DECIMAL(10,2), k INT, m MAP<STRING, INT>"
    ).collect()[0]
    assert str(out["price"]) == "12.34"
    assert out["k"] == 5 and out["m"] == {"a": 1}
