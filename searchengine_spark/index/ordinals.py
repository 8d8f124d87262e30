"""Dense doc-ordinal assignment, scalably (no single-task window).

The compressed artifact needs integer docIDs (delta+varbyte encodes ints;
reference postings are int docIDs, ``Compressor.java:10``). Our logical
docIDs are global strings, so each *segment* assigns dense int64 ordinals in
global ``doc_id`` order via the classic two-job pattern:

1. ``repartitionByRange(doc_id).sortWithinPartitions(doc_id)`` — the range
   partitioner's sampling splits the key space evenly (this, not a window
   over one partition, is what survives 10^12 rows),
2. count rows per partition, cumulative-sum the counts into per-partition
   offsets (a tiny driver-side array),
3. ``mapInPandas`` adds ``doc_ord = offset[pid] + local_row_number``.

Ordinal space is segmented: segment ``s`` owns ordinals
``[s << SEG_SHIFT, ...)`` so appended segments never re-base earlier ones —
this deletes the reference's merge-time docID re-basing
(``InvertedIndex.java:600,616,678``) by construction.
"""

from __future__ import annotations

import numpy as np
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEG_SHIFT = 40  # ~1.1e12 docs per segment, 8M segments


def segment_base(segment_id: int) -> int:
    return segment_id << SEG_SHIFT


def assign_doc_ordinals(
    docs: DataFrame,
    id_col: str = "doc_id",
    base: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense ``doc_ord`` column (int64, ``base + rank``) to ``docs``
    (one row per doc). Returns a *persisted* DataFrame; callers unpersist
    after materializing downstream."""
    parts = num_partitions or 2 * docs.sparkSession.sparkContext.defaultParallelism
    ranged = (
        docs.repartitionByRange(parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .persist()
    )
    counts = {
        r["pid"]: r["n"]
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets = {}
    acc = base
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    # fresh StructType — .add() would mutate the DataFrame's cached schema
    schema = StructType(list(ranged.schema.fields) + [StructField("doc_ord", LongType())])

    def add_ord(batches):
        pid = TaskContext.get().partitionId()
        nxt = offsets.get(pid, base)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["doc_ord"] = np.arange(nxt, nxt + len(pdf), dtype=np.int64)
            nxt += len(pdf)
            yield pdf

    out = ranged.mapInPandas(add_ord, schema=schema).persist()
    out.count()  # pin while ranged is still live, then drop the intermediate
    ranged.unpersist()
    return out
