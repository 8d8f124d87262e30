"""Sequence packing for LLM training export (concat-and-chunk).

Training pipelines don't feed documents to the model one-per-row: they
concatenate the tokenized corpus in a deterministic order and slice it
into fixed-capacity sequences (GPT-style "chunking"; every token lands in
exactly one training sequence, sequences are exactly ``capacity`` tokens
except the tail). The operator here computes, for each document, WHICH
sequences it lands in and at what offsets — the (seq_id, doc fragment)
assignment a downstream tokenizer/writer needs — without materializing
token arrays at all: only per-doc token COUNTS flow through the plan.

Scalably (no single-task global window):

1. ``repartitionByRange(order_col).sortWithinPartitions(order_col)`` —
   the range partitioner's sampled boundaries spread the key space, the
   same two-job prefix-sum pattern as ``index/ordinals.py`` (a global
   ``Window.orderBy`` would serialize 10^12 rows through one task);
2. per-partition SUM of token counts -> tiny driver-side cumulative
   offsets (O(partitions) collect);
3. ``mapInPandas`` adds each doc's exclusive global token offset via a
   vectorized in-partition ``np.cumsum``;
4. the fragment explosion is pure JVM: a doc spanning token interval
   [s, e) overlaps sequences ``floor(s/C) .. floor((e-1)/C)`` —
   ``F.sequence`` + ``explode``, with per-fragment offsets/lengths as
   plain column arithmetic. A doc longer than ``capacity`` simply spans
   many sequences (long-transcript case), which is exactly what
   concat-and-chunk training does.

The DuckDB oracle twin replays the identical arithmetic with a window
cumulative sum + ``generate_series`` (fine at test scale, where the
single-task window hazard doesn't bite).
"""

from __future__ import annotations

import numpy as np
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document (one row, with a token count) to its
    training-sequence fragments under concat-and-chunk packing at
    ``capacity`` tokens per sequence, concatenating docs in ascending
    ``order_col`` (default: ``id_col``) order.

    Returns one row per (document x overlapped sequence):

      - ``seq_id``     — 0-based training-sequence index,
      - ``id_col``     — the document,
      - ``doc_offset`` — first token of the fragment WITHIN the doc,
      - ``seq_offset`` — where the fragment starts WITHIN the sequence,
      - ``frag_len``   — fragment length in tokens.

    Zero-token docs yield no rows (nothing to pack). Fragment rows
    partition each doc's tokens exactly: sum(frag_len) per doc equals its
    token count, and sum(frag_len) per seq_id equals ``capacity`` for
    every sequence but the last.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    order_col = order_col or id_col
    spark = df.sparkSession
    parts = num_partitions or 2 * spark.sparkContext.defaultParallelism
    # persist BEFORE repartitionByRange: boundary sampling executes the
    # child twice (CLAUDE.md invariant), and src may sit on an expensive
    # upstream plan (a real tokenizer's count). The id tie-break in BOTH
    # the range keys and the partition sort makes the concatenation order
    # total even when order_col has duplicates (e.g. equal timestamps) —
    # without it, duplicate-key rows land in shuffle-arrival order and the
    # cumulative offsets (hence every fragment) differ run to run.
    src = (
        df.select(
            F.col(id_col).alias(id_col),
            F.col(order_col).alias("_ord"),
            F.col(n_tokens_col).cast("long").alias("_ntok"),
        )
        .where(F.col("_ntok") > 0)
        .persist()
    )
    ranged = (
        src.repartitionByRange(parts, F.col("_ord"), F.col(id_col))
        .sortWithinPartitions("_ord", id_col)
        .persist()
    )
    # two-job prefix sum (ordinals.py pattern): per-partition token totals,
    # driver-side cumulative offsets — O(partitions), not O(rows)
    counts = {
        r["pid"]: r["n"]
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("_ntok").alias("n"))
        .collect()
    }
    # the counts collect materialized ranged's cache (all partitions), so
    # src's persist — needed only for repartitionByRange's double
    # execution — can release NOW instead of holding a second corpus-sized
    # copy in executor memory through the whole fragment job
    src.unpersist()
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(ranged.schema.fields) + [StructField("_tok0", LongType())]
    )

    def add_offset(batches):
        pid = TaskContext.get().partitionId()
        nxt = offsets.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            n = pdf["_ntok"].to_numpy(dtype=np.int64)
            ends = np.cumsum(n)
            pdf["_tok0"] = nxt + ends - n  # exclusive prefix
            nxt += int(ends[-1]) if len(ends) else 0
            yield pdf

    spanned = ranged.mapInPandas(add_offset, schema=schema)
    cap = F.lit(int(capacity)).cast("long")
    s, e = F.col("_tok0"), F.col("_tok0") + F.col("_ntok")
    # integer DIV, not `/`: Spark's `/` on longs is DOUBLE division, exact
    # only while offsets stay under 2^53 tokens — `div` keeps the sequence
    # ids exact over the full int64 offset range
    frags = (
        spanned.select(
            id_col,
            "_tok0",
            "_ntok",
            F.explode(
                F.sequence(
                    F.expr(f"_tok0 DIV {int(capacity)}"),
                    F.expr(f"(_tok0 + _ntok - 1) DIV {int(capacity)}"),
                )
            ).alias("seq_id"),
        )
        .select(
            F.col("seq_id"),
            F.col(id_col),
            (F.greatest(s, F.col("seq_id") * cap) - s).alias("doc_offset"),
            (F.greatest(s, F.col("seq_id") * cap) - F.col("seq_id") * cap).alias(
                "seq_offset"
            ),
            (
                F.least(e, (F.col("seq_id") + 1) * cap)
                - F.greatest(s, F.col("seq_id") * cap)
            ).alias("frag_len"),
        )
    )
    frags = frags.persist()
    frags.count()  # pin before releasing the ranged intermediate
    ranged.unpersist()
    return frags


def attach_loss_mask(
    frags: DataFrame, meta: DataFrame, train_col: str = "train"
) -> DataFrame:
    """Per-fragment loss flags for SFT-style training export: join a
    per-doc boolean (e.g. ``role == 'assistant'`` over transcripts) onto
    ``pack_sequences`` fragments — a sequence writer then emits loss-mask
    spans alongside each sequence's token fragments (train on assistant
    tokens, mask user/tool context). Docs absent from ``meta`` mask to
    False. One broadcast-able doc_id equi-join, nothing else."""
    m = meta.select(
        "doc_id", F.col(train_col).cast("boolean").alias("loss_mask")
    )
    return frags.join(m, "doc_id", "left").fillna({"loss_mask": False})


def packing_stats(frags: DataFrame, capacity: int) -> DataFrame:
    """Per-sequence fill summary over ``pack_sequences`` output: fragment
    count, filled tokens, and fill ratio — the packing-efficiency report a
    training-export job logs (with concat-and-chunk every sequence but the
    tail is exactly full; the stats generalize to other packers)."""
    return (
        frags.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_frags"),
            F.sum("frag_len").alias("n_tokens"),
        )
        .select(
            "seq_id",
            "n_frags",
            "n_tokens",
            F.round(F.col("n_tokens") / F.lit(float(capacity)), 6).alias(
                "fill_ratio"
            ),
        )
    )
