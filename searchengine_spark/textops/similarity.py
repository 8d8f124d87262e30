"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. One scan,
  no shuffle (TakeOrdered), all arithmetic in JVM expressions.
- lsh_topk: random-hyperplane LSH bucketing as the scale path — restricts
  the exact rerank to candidate buckets; probes p nearest buckets. At 100 TB
  you persist the bucketed table partitioned by bucket key and prune scans.
- ivf_topk: IVF-style coarse quantization using deterministic seed
  centroids (k-means is a build-time job; here centroids are sampled rows).
- kmeans_fit / semantic_dedup: deterministic Lloyd k-means and the
  SemDeDup recipe built on it (cells as blocking, within-cell cosine,
  smaller-id representative kept).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _guarded_cos(a_col, b_col):
    """Cosine that is NULL (not an ANSI DIVIDE_BY_ZERO crash) when either
    vector has zero norm. Spark 4 defaults to ANSI mode, where double
    division by zero THROWS — one zero/padding embedding anywhere in a
    100 TB corpus must not kill the job. CASE WHEN short-circuits, so the
    division never evaluates for the guarded rows; NULLs then fall out of
    every ``>= threshold`` filter and ``isNotNull`` cut downstream."""
    na, nb = _norm(a_col), _norm(b_col)
    return F.when((na > 0) & (nb > 0), _dot(a_col, b_col) / (na * nb))


def cosine_col(vec_col, query: list[float]):
    q = [float(x) for x in query]
    if sum(x * x for x in q) == 0.0:
        raise ValueError("zero-norm query vector: cosine is undefined")
    qv = F.lit(q)
    n = _norm(vec_col)
    return F.when(n > 0, _dot(vec_col, qv) / (n * _norm(qv)))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: orderBy().limit() compiles to a distributed
    TakeOrdered — no full sort, no shuffle of the scan."""
    return (
        df.select(F.col(id_col), cosine_col(F.col(vec_col), query).alias("cos_sim"))
        .where(F.col("cos_sim").isNotNull())  # zero-norm rows can't rank
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _hamming_ball(qkey: str, radius: int) -> set[str]:
    """Every bit-string within ``radius`` flips of ``qkey`` (inclusive) —
    the single definition of multi-probe enumeration (a previous version
    flipped only single bits whatever the radius — silent under-probing —
    and the fix must never have to be applied in two places)."""
    from itertools import combinations

    n = len(qkey)
    probe = set()
    for r in range(0, min(radius, n) + 1):
        for idxs in combinations(range(n), r):
            flipped = list(qkey)
            for i in idxs:
                flipped[i] = "1" if qkey[i] == "0" else "0"
            probe.add("".join(flipped))
    return probe


def bucket_col(vec_col, planes: np.ndarray):
    """LSH bucket id = sign-bit string over random hyperplanes."""
    bits = []
    for row in planes:
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.lit([float(x) for x in row]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: exact rerank within the query's LSH bucket plus
    all buckets within the given hamming distance (multi-probe)."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = (planes @ np.asarray(query, dtype=np.float64) >= 0).astype(int)
    qkey = "".join(map(str, qbits))
    probe = _hamming_ball(qkey, multiprobe_hamming)
    bucketed = df.withColumn("_bucket", bucket_col(F.col(vec_col), planes))
    cands = bucketed.where(F.col("_bucket").isin(sorted(probe)))
    return brute_force_topk(cands, query, k, id_col, vec_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a, doc_b, cos_sim).

    Scale path (default): random-hyperplane LSH buckets prune the pair
    space — near-identical vectors share all sign bits, so only within-
    bucket pairs are scored (plus Hamming-1 neighbor buckets via a second
    bucketing at ``seed+1``). ``exact=True`` scores all pairs — the O(n²)
    oracle twin, fine at test scale only.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        # dim lookup is one driver job — only the LSH path needs it, and an
        # empty frame has no dim (first() is None): no vectors, no pairs
        row = df.select(F.size(vec_col)).first()
        if row is None:
            idt = df.schema[id_col].dataType.simpleString()
            return df.sparkSession.createDataFrame(
                [], f"doc_a {idt}, doc_b {idt}, cos_sim double"
            )
        dim = row[0]
        keyed = []
        for s in (seed, seed + 1):  # two independent bucketings OR-ed
            planes = _hyperplanes(dim, n_planes, s)
            keyed.append(
                df.select(
                    F.col(id_col),
                    F.concat(F.lit(f"s{s}:"), bucket_col(F.col(vec_col), planes)).alias("bkey"),
                )
            )
        buckets = keyed[0].unionByName(keyed[1])
        ka = buckets.select(F.col(id_col).alias("id_a"), "bkey")
        kb = buckets.select(F.col(id_col).alias("id_b"), "bkey")
        cand = (
            ka.join(kb, ["bkey"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = (
            cand.join(a, "id_a")
            .join(b, "id_b")
        )
    sim = _guarded_cos(F.col("va"), F.col("vb"))
    return (
        pairs.select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            sim.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def nearest_cell_expr(vec_col, centroids: np.ndarray):
    """0-based index of the nearest centroid by squared L2 — a pure JVM
    expression over literal centroids (k is small: broadcast-by-construction).
    Ties resolve to the lowest cell index (array_position finds the FIRST
    minimum), which the SQL oracles replicate with an (dist, cell) sort."""
    dists = [
        F.aggregate(
            F.zip_with(
                vec_col,
                F.lit([float(x) for x in c]),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in centroids
    ]
    arr = F.array(*dists)
    return F.array_position(arr, F.array_min(arr)) - 1


def ivf_topk(
    df: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF: assign every vector to its nearest centroid (build-time at
    scale; persisted partitioned by cell), scan only the n_probe cells
    nearest the query."""
    q = np.asarray(query, dtype=np.float64)
    qd = ((centroids - q) ** 2).sum(axis=1)
    probe_cells = [int(i) for i in np.argsort(qd)[:n_probe]]
    assigned = df.withColumn("_cell", nearest_cell_expr(F.col(vec_col), centroids))
    cands = assigned.where(F.col("_cell").isin(probe_cells))
    return brute_force_topk(cands, query, k, id_col, vec_col)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd k-means over an embedding column (the build-time
    job behind IVF cells and semantic dedup).

    Init = the vectors of the k smallest ids (deterministic; swap in
    k-means|| sampling at scale — the loop body is unchanged). Each
    iteration is (a) a JVM argmin-assign over literal centroids — no
    shuffle — and (b) ONE partially-aggregated groupBy(cell, pos) mean,
    collecting k x dim values to the driver (tiny, independent of corpus
    size). Updated centroids are rounded to 6 decimals so the fit is
    bit-reproducible across partitionings (and replayable in SQL oracles);
    cells that lose all members keep their previous centroid.
    """
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = np.array([r[0] for r in init], dtype=np.float64)
    for _ in range(n_iter):
        assigned = df.withColumn(
            "_cell", nearest_cell_expr(F.col(vec_col), cents)
        )
        upd = (
            assigned.select("_cell", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("_cell", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("v"))
            .collect()
        )
        new = cents.copy()
        for r in upd:
            new[r["_cell"], r["pos"]] = r["v"]
        cents = new
    return cents


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means cells as the blocking key,
    exact cosine only WITHIN a cell, and any doc with a smaller-id cell-mate
    at cosine >= threshold is marked a semantic duplicate.

    Returns ``(id_col, cell, keep)`` for every input row. Pair scoring is
    candidate-then-verify with cluster cells as candidates — O(sum of
    squared cell sizes), never corpus-quadratic; at scale you raise k so
    cells stay bounded (SemDeDup's own recipe) and persist the assignment
    partitioned by cell."""
    cents = kmeans_fit(df, k, n_iter, id_col, vec_col)
    # persist: the frame feeds BOTH self-join sides plus the final left
    # join, and each branch would otherwise re-run the source scan and the
    # k x dim distance fold (no ReusedExchange applies — the projections
    # differ). Left persisted; Spark evicts LRU.
    assigned = df.select(
        F.col(id_col),
        F.col(vec_col),
        nearest_cell_expr(F.col(vec_col), cents).cast("int").alias("cell"),
    ).persist()
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col("cell"), F.col(vec_col).alias("va")
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col("cell"), F.col(vec_col).alias("vb")
    )
    sim = _guarded_cos(F.col("va"), F.col("vb"))
    removed = (
        a.join(b, ["cell"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(sim >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return (
        assigned.join(removed, id_col, "left")
        .select(
            id_col, "cell", F.col("__dup").isNull().alias("keep")
        )
    )


# --- persisted ANN index (the 100 TB form) --------------------------------


def build_lsh_index(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> dict:
    """Persist the corpus PARTITIONED BY LSH bucket: one parquet directory
    per bucket key plus a JSON meta sidecar (planes seed/dim). This is the
    form that scales — a query probes a handful of buckets, and the probe
    keys become a partition filter, so the scan lists/reads only those
    directories instead of the whole corpus (same directory-pruning trick
    as the inverted index's term-hash buckets, artifact.py)."""
    import json
    import os

    dim = df.select(F.size(vec_col)).first()[0]
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = df.withColumn("bucket", bucket_col(F.col(vec_col), planes))
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)
    meta = {"n_planes": n_planes, "seed": seed, "dim": int(dim)}
    with open(os.path.join(path, "_lsh_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def lsh_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a persisted LSH index: probe keys are computed driver-side
    from the stored plane seed, then pushed as a ``bucket IN (...)``
    partition filter — the exact rerank touches only the probed bucket
    directories."""
    import json
    import os

    with open(os.path.join(path, "_lsh_meta.json")) as fh:
        meta = json.load(fh)
    planes = _hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
    qbits = (planes @ np.asarray(query, dtype=np.float64) >= 0).astype(int)
    qkey = "".join(map(str, qbits))
    probe = _hamming_ball(qkey, multiprobe_hamming)
    cands = spark.read.parquet(path).where(
        F.col("bucket").isin(sorted(probe))
    )
    return brute_force_topk(cands, query, k, id_col, vec_col)


# --- int8 quantization (memory-4x candidate scan) --------------------------


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization (the ES ``int8_hnsw`` /
    faiss SQ8 storage trade): ``scale = max|x| / 127``, ``q_i =
    round_half_away(x_i / scale)`` in [-127, 127]. Returns ``(id, qvec
    array<int>, scale double)`` — 4x smaller than float32, which at
    100 TB is the difference between a candidate scan that fits in page
    cache and one that doesn't. Cosine over quantized vectors is
    scale-free (the per-vector scales cancel), so ``scale`` is kept only
    for value reconstruction. All JVM expressions; the zero vector gets
    scale eps (quantizes to all zeros, excluded from cosine by the
    qnorm > 0 guard in ``int8_topk``)."""
    vec = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
        / F.lit(127.0),
        F.lit(1e-12),
    )
    # project scale behind a boundary first: the quantize lambda references
    # it per element, and inlining the array_max re-runs it per element
    return df.select(
        F.col(id_col), scale.alias("scale"), vec.alias("_v")
    ).select(
        id_col,
        F.transform(
            F.col("_v"),
            lambda x: F.round(x.cast("double") / F.col("scale")).cast("int"),
        ).alias("qvec"),
        "scale",
    )


def _q8(vals) -> tuple[list[int], float]:
    """Driver-side twin of the quantizer for query vectors (round half
    AWAY from zero, matching Spark/DuckDB ``round`` — NOT Python's
    banker's rounding)."""
    import math

    m = max((abs(float(v)) for v in vals), default=0.0)
    scale = max(m / 127.0, 1e-12)
    out = []
    for v in vals:
        r = float(v) / scale
        out.append(int(math.floor(r + 0.5)) if r >= 0 else int(math.ceil(r - 0.5)))
    return out, scale


def int8_topk(
    df: DataFrame,
    query: list,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """int8-quantized ANN with exact float rerank: quantize the corpus
    (inline here; persist ``quantize_embeddings`` output at scale),
    coarse top ``k * rerank_factor`` by QUANTIZED cosine (integer dot /
    integer norms — the scales cancel), then re-score only those
    candidates against the float vectors and cut the exact top-k. Both
    cuts are deterministic (rounded score + id tie-break) so an oracle
    can replay them. Returns ``(id, cos_sim)`` with exact float scores."""
    if k <= 0 or rerank_factor < 1:
        raise ValueError("k must be positive and rerank_factor >= 1")
    qq, _ = _q8(query)
    qnq = float(sum(v * v for v in qq)) ** 0.5
    if qnq == 0.0:
        raise ValueError("zero-norm query vector: cosine is undefined")
    quant = quantize_embeddings(df, id_col, vec_col)
    qlit = F.lit(qq)
    dot = F.aggregate(
        F.zip_with(
            F.col("qvec"), qlit, lambda a, b: a.cast("long") * b.cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qn = F.aggregate(
        F.col("qvec"),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v.cast("long") * v.cast("long"),
    )
    coarse = (
        quant.select(
            id_col,
            # qn > 0 guard: a zero corpus embedding quantizes to all-zero
            # ints; under ANSI-default Spark the unguarded divide would
            # throw DIVIDE_BY_ZERO and kill the job (the DuckDB oracle has
            # the matching `WHERE ... > 0` predicate)
            F.when(
                qn > 0,
                dot.cast("double") / (F.sqrt(qn.cast("double")) * F.lit(qnq)),
            ).alias("qcos"),
        )
        .where(F.col("qcos").isNotNull())
        .select(id_col, F.round("qcos", 6).alias("qcos_r"))
        .orderBy(F.desc("qcos_r"), F.asc(id_col))
        .limit(k * rerank_factor)
    )
    rer = df.join(coarse.select(id_col), id_col, "left_semi")
    return (
        rer.select(
            F.col(id_col),
            cosine_col(F.col(vec_col), [float(x) for x in query]).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# --- hard-negative mining (contrastive training prep) ----------------------


def _anchor_scored(
    df: DataFrame,
    anchor_ids: list,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Shared anchor-vs-corpus cosine frame for the contrastive miners
    (:func:`hard_negatives`, :func:`training_triplets`): validate anchors
    (present, non-zero-norm), then a LITERAL array explode over ONE corpus
    scan — a projection, not a join (no nested-loop node). Returns
    ``(anchor_id, alabel, <id>, <label>, cos_r)`` with self rows and
    undefined (zero-norm corpus) rows excluded. At 10^9+ anchors you'd
    batch anchors through the bucketed LSH index instead; this is the
    broadcast-anchor form."""
    if not anchor_ids:
        raise ValueError("need at least one anchor id")
    rows = (
        df.where(F.col(id_col).isin(list(anchor_ids)))
        .select(id_col, vec_col, label_col)
        .collect()
    )
    if len(rows) != len(set(anchor_ids)):
        missing = set(anchor_ids) - {r[id_col] for r in rows}
        raise ValueError(f"anchor ids not found: {sorted(missing)}")
    zero = [
        r[id_col]
        for r in rows
        if sum(float(x) * float(x) for x in r[vec_col]) == 0.0
    ]
    if zero:
        raise ValueError(f"zero-norm anchor embeddings: {sorted(zero)}")
    anchors = F.array(
        *[
            F.struct(
                F.lit(r[id_col]).alias("aid"),
                F.lit([float(x) for x in r[vec_col]]).alias("avec"),
                F.lit(r[label_col]).alias("alabel"),
            )
            for r in sorted(rows, key=lambda r: r[id_col])
        ]
    )
    exploded = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        F.explode(anchors).alias("a"),
    )
    cos = _guarded_cos(F.col("a.avec"), F.col(vec_col))
    return (
        exploded.where(F.col(id_col) != F.col("a.aid"))
        .select(
            F.col("a.aid").alias("anchor_id"),
            F.col("a.alabel").alias("alabel"),
            F.col(id_col),
            F.col(label_col),
            F.round(cos, 6).alias("cos_r"),
        )
        # zero-norm corpus rows have NULL cos (undefined) — they must not
        # occupy ranking slots (anchors are checked non-zero above)
        .where(F.col("cos_r").isNotNull())
    )


def hard_negatives(
    df: DataFrame,
    anchor_ids: list,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the ``k`` most cosine-similar vectors with a DIFFERENT label (the
    near-misses a contrastive loss learns most from; same-label rows and
    the anchor itself are excluded). Returns ``(anchor_id, id, cos_r)``,
    per-anchor rank order. Plan: see :func:`_anchor_scored` — one corpus
    scan, one per-anchor window top-k."""
    from pyspark.sql import Window

    scored = _anchor_scored(df, anchor_ids, id_col, vec_col, label_col).where(
        F.col(label_col) != F.col("alabel")
    ).select("anchor_id", id_col, "cos_r")
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos_r"), F.asc(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("anchor_id", F.desc("cos_r"), F.asc(id_col))
    )


def training_triplets(
    df: DataFrame,
    anchor_ids: list,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Triplet mining for contrastive training (anchor, positive,
    negative): for each anchor, the hardest POSITIVE — the same-label
    vector with the LOWEST cosine to the anchor, i.e. the in-class example
    the loss most needs to pull in (ties break id-asc) — paired with each
    of the ``k`` hardest NEGATIVES (different label, highest cosine, the
    :func:`hard_negatives` set). Returns ``(anchor_id, pos_id, neg_id,
    pos_cos_r, neg_cos_r)`` in per-anchor negative-rank order; anchors
    with no same-label partner or no different-label row yield no rows.

    Plan: ONE :func:`_anchor_scored` corpus scan feeds both per-anchor
    window cuts (positive argmin, negative top-k), joined on anchor_id —
    the join sides are O(|A|) and O(|A|·k)."""
    from pyspark.sql import Window

    scored = _anchor_scored(df, anchor_ids, id_col, vec_col, label_col)
    wp = Window.partitionBy("anchor_id").orderBy(
        F.asc("cos_r"), F.asc(id_col)
    )
    pos = (
        scored.where(F.col(label_col) == F.col("alabel"))
        .withColumn("_rn", F.row_number().over(wp))
        .where(F.col("_rn") == 1)
        .select(
            "anchor_id",
            F.col(id_col).alias("pos_id"),
            F.col("cos_r").alias("pos_cos_r"),
        )
    )
    wn = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos_r"), F.asc(id_col)
    )
    neg = (
        scored.where(F.col(label_col) != F.col("alabel"))
        .withColumn("_rn", F.row_number().over(wn))
        .where(F.col("_rn") <= k)
        .select(
            "anchor_id",
            F.col(id_col).alias("neg_id"),
            F.col("cos_r").alias("neg_cos_r"),
        )
    )
    return (
        pos.join(neg, "anchor_id")
        .select("anchor_id", "pos_id", "neg_id", "pos_cos_r", "neg_cos_r")
        .orderBy("anchor_id", F.desc("neg_cos_r"), F.asc("neg_id"))
    )


# --- product quantization (PQ-ADC: the memory-32x candidate scan) ----------

# frozen codebook constants (shared verbatim with the DuckDB oracle twin,
# entry_queries.ANN_PQ_SQL) — same affine-mod family as the classifier's
# stand-in weights
PQ_A = 1103515245
PQ_B = 12345
PQ_P = (1 << 31) - 1


def pq_codebook(dim: int, n_sub: int = 8, n_cent: int = 16) -> np.ndarray:
    """Frozen deterministic INTEGER codebooks for product quantization:
    ``n_sub`` subspaces of ``dim // n_sub`` dims, ``n_cent`` centroids
    each, entry for flat index ``i = (sub*n_cent + cent)*sub_dim + j`` is
    ``((PQ_A*i + PQ_B) % PQ_P) % 255 - 127`` (int8 range). In production
    codebooks come from a k-means build job (``kmeans_fit`` per subspace);
    the frozen formula is the deterministic stand-in that keeps the
    assignment + ADC plumbing — the real surface — bit-replayable in SQL.
    Integer centroids keep every distance/dot below exact int64, so
    assignment and coarse scores are engine-portable with no float-tie
    risk (CLAUDE.md: integer-scaled intermediate scores)."""
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sd = dim // n_sub
    i = np.arange(n_sub * n_cent * sd, dtype=np.int64)
    vals = ((PQ_A * i + PQ_B) % PQ_P) % 255 - 127
    return vals.reshape(n_sub, n_cent, sd)


def _pq_cb(
    dim: int, n_sub: int, n_cent: int, codebook: np.ndarray | None
) -> np.ndarray:
    """Resolve the codebook: the frozen formula one, or a caller-supplied
    trained array validated to (n_sub, n_cent, dim//n_sub) int64."""
    if codebook is None:
        return pq_codebook(dim, n_sub, n_cent)
    cb = np.asarray(codebook, dtype=np.int64)
    want = (n_sub, n_cent, dim // n_sub)
    if cb.shape != want:
        raise ValueError(f"codebook shape {cb.shape} != {want}")
    return cb


def pq_encode(
    df: DataFrame,
    dim: int,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: np.ndarray | None = None,
) -> DataFrame:
    """``(id, qvec, codes array<int>)``: int8-quantize each vector
    (max-abs -> 127 — direction-normalized, which is exactly the
    representation cosine-PQ wants), then assign each subvector to its
    nearest codebook centroid by INTEGER L2; ties break to the lowest
    centroid id (``array_position`` returns the FIRST minimum). Codes are
    ``n_sub`` small ints per vector — at 100 TB the persisted codes
    column is ~32x smaller than float32 embeddings, the difference
    between an in-page-cache candidate scan and an IO-bound one.

    Plan shape: ZERO shuffle — quantization, distance evaluation and
    argmin are all higher-order-function projections pipelined into the
    scan. The codebook/LUT literals are projected ONCE behind a select
    boundary and referenced as bound columns inside the lambdas
    (CLAUDE.md: captured outer EXPRESSIONS re-evaluate per element;
    column references don't). Vectors whose length != dim get NULL codes
    (F.get is NULL out of bounds) and fall out of downstream filters.

    ``codebook`` overrides the frozen formula codebook with a trained one
    (:func:`pq_train`); shape must be ``(n_sub, n_cent, dim//n_sub)``
    ints."""
    sd = dim // n_sub
    cb = _pq_cb(dim, n_sub, n_cent, codebook)
    quant = quantize_embeddings(df, id_col, vec_col).select(
        id_col,
        "qvec",
        F.lit([int(x) for x in cb.reshape(-1)]).alias("_cb"),
    )
    seq_subs = F.sequence(F.lit(0), F.lit(n_sub - 1))
    seq_cent = F.sequence(F.lit(0), F.lit(n_cent - 1))
    seq_j = F.sequence(F.lit(0), F.lit(sd - 1))

    def _d2(sub, c):
        def step(acc, j):
            diff = F.get(F.col("qvec"), sub * sd + j).cast("long") - F.get(
                F.col("_cb"), (sub * n_cent + c) * sd + j
            ).cast("long")
            return acc + diff * diff

        return F.aggregate(seq_j, F.lit(0).cast("long"), step)

    dists = F.transform(
        seq_subs, lambda sub: F.transform(seq_cent, lambda c: _d2(sub, c))
    )
    return (
        quant.select(id_col, "qvec", dists.alias("_dists"))
        .select(
            id_col,
            "qvec",
            F.transform(
                F.col("_dists"),
                lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
            ).alias("codes"),
        )
    )


def pq_topk(
    df: DataFrame,
    query: list,
    k: int = 10,
    rerank_factor: int = 4,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k with exact float rerank (the faiss
    IVF*,PQ* scale recipe's scoring half): encode the corpus
    (:func:`pq_encode`; persist the codes at scale), score candidates by
    Asymmetric Distance Computation — the query's int8 form is dotted
    against every centroid ONCE driver-side into an ``n_sub x n_cent``
    lookup table, so scoring a vector is ``n_sub`` table lookups, never a
    ``dim``-wide arithmetic pass — coarse-cut the top ``k*rerank_factor``
    by reconstructed cosine, then re-score only those against the float
    vectors. All coarse arithmetic is integer sums (LUT dots and
    reconstruction norms) over the frozen integer codebook, so the coarse
    scores are bit-identical across engines; the per-vector quantization
    scale cancels from the reconstructed cosine exactly as in
    :func:`int8_topk`. Returns ``(id, cos_sim)``.

    ``codebook`` switches scoring to a trained integer codebook
    (:func:`pq_train`) — same exactness guarantees, better recall."""
    if k <= 0 or rerank_factor < 1:
        raise ValueError("k must be positive and rerank_factor >= 1")
    qq, _ = _q8(query)
    dim = len(qq)
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    qarr = np.asarray(qq, dtype=np.int64)
    qnorm = float(np.sqrt((qarr * qarr).sum()))
    if qnorm == 0.0:
        raise ValueError("zero-norm query vector: cosine is undefined")
    cb = _pq_cb(dim, n_sub, n_cent, codebook)
    lut = (cb * qarr.reshape(n_sub, 1, dim // n_sub)).sum(axis=2)
    cn2 = (cb * cb).sum(axis=2)

    qn_int = F.aggregate(
        F.col("qvec"),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v.cast("long") * v.cast("long"),
    )
    # persisted barrier between encode and ADC scoring: without it
    # CollapseProject inlines the whole 1024-op encode tree into the
    # scoring lambdas, where the captured `codes` expression re-evaluates
    # PER AGGREGATE ELEMENT (CLAUDE.md) and planning blows up. The codes
    # frame is n_sub small ints per id — exactly the artifact you persist
    # at 100 TB scale anyway. Micro-frame, LRU-evicted.
    enc = (
        pq_encode(df, dim, n_sub, n_cent, id_col, vec_col, codebook=cb)
        .where((F.size("qvec") == dim) & (qn_int > 0))
        .select(id_col, "codes")
        .persist()
    )
    scored = enc.select(
        id_col,
        "codes",
        F.lit([int(x) for x in lut.reshape(-1)]).alias("_lut"),
        F.lit([int(x) for x in cn2.reshape(-1)]).alias("_cn2"),
    )
    seq_subs = F.sequence(F.lit(0), F.lit(n_sub - 1))

    def _gather(tbl_col):
        return F.aggregate(
            seq_subs,
            F.lit(0).cast("long"),
            lambda acc, sub: acc
            + F.get(tbl_col, sub * n_cent + F.get(F.col("codes"), sub)),
        )

    num = _gather(F.col("_lut"))
    den2 = _gather(F.col("_cn2"))
    coarse = (
        scored.select(
            id_col,
            F.when(
                den2 > 0,
                num.cast("double") / (F.sqrt(den2.cast("double")) * F.lit(qnorm)),
            ).alias("pqcos"),
        )
        .where(F.col("pqcos").isNotNull())
        .select(id_col, F.round("pqcos", 6).alias("pqcos_r"))
        .orderBy(F.desc("pqcos_r"), F.asc(id_col))
        .limit(k * rerank_factor)
    )
    rer = df.join(coarse.select(id_col), id_col, "left_semi")
    return (
        rer.select(
            F.col(id_col),
            cosine_col(F.col(vec_col), [float(x) for x in query]).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def pq_train(
    df: DataFrame,
    dim: int,
    n_sub: int = 8,
    n_cent: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train INTEGER PQ codebooks with deterministic Lloyd k-means, all
    subspaces in one distributed pass per iteration (the production
    build-time job that replaces :func:`pq_codebook`'s frozen stand-in).

    The fit runs over the int8-quantized (direction-normalized) vectors —
    the same representation :func:`pq_encode` assigns against — and the
    updated centroids are rounded to the nearest INTEGER with exact
    driver-side rational arithmetic (``Fraction``-free: long sums from
    Spark, half-away division in Python ints), so the result is
    bit-reproducible across partitionings and keeps ADC scoring in exact
    int64 (CLAUDE.md: integer-scaled intermediate scores).

    Per iteration: (a) one zero-shuffle argmin-assign projection over the
    flat codebook literal (same expression shape as :func:`pq_encode`),
    (b) ONE partially-aggregated ``groupBy(sub, cell, pos)`` sum/count —
    ``n_sub * n_cent * sub_dim`` rows to the driver, independent of
    corpus size. Cells that lose every member keep their previous
    centroid. Init = subvectors of the ``n_cent`` smallest ids."""
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sd = dim // n_sub
    quant = quantize_embeddings(df, id_col, vec_col).where(
        F.size("qvec") == dim
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        lambda s: F.slice("qvec", s * sd + 1, sd),
    )
    subs = quant.select(
        id_col, F.posexplode(chunks).alias("sub", "subvec")
    ).persist()  # consumed n_iter times; (id, sub, 8 ints) micro-rows

    init = (
        quant.orderBy(id_col).limit(n_cent).select(id_col, "qvec").collect()
    )
    if len(init) < n_cent:
        raise ValueError(
            f"need >= {n_cent} vectors to init {n_cent} centroids"
        )
    cents = (
        np.array([r["qvec"] for r in sorted(init, key=lambda r: r[0])],
                 dtype=np.int64)
        .reshape(n_cent, n_sub, sd)
        .transpose(1, 0, 2)
        .copy()
    )  # (n_sub, n_cent, sd)

    seq_cent = F.sequence(F.lit(0), F.lit(n_cent - 1))
    seq_j = F.sequence(F.lit(0), F.lit(sd - 1))
    for _ in range(n_iter):
        cb_flat = F.lit([int(x) for x in cents.reshape(-1)])
        framed = subs.select("sub", "subvec", cb_flat.alias("_cb"))

        def _d2(c):
            def step(acc, j):
                diff = F.get(F.col("subvec"), j).cast("long") - F.get(
                    F.col("_cb"),
                    (F.col("sub") * n_cent + c) * sd + j,
                ).cast("long")
                return acc + diff * diff

            return F.aggregate(seq_j, F.lit(0).cast("long"), step)

        dists = F.transform(seq_cent, _d2)
        assigned = framed.select(
            "sub",
            "subvec",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cell"),
        )
        upd = (
            assigned.select(
                "sub", "cell", F.posexplode("subvec").alias("pos", "val")
            )
            .groupBy("sub", "cell", "pos")
            .agg(
                F.sum(F.col("val").cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        for r in upd:
            s, n = int(r["s"]), int(r["n"])
            # round half AWAY from zero in exact integer arithmetic
            q, rem = divmod(abs(s), n)
            mean = q + (1 if 2 * rem >= n else 0)
            if s < 0:
                mean = -mean
            new[r["sub"], r["cell"], r["pos"]] = max(-127, min(127, mean))
        cents = new
    subs.unpersist()
    return cents


def ivfpq_topk(
    df: DataFrame,
    centroids: np.ndarray,
    query: list,
    k: int = 10,
    n_probe: int = 2,
    rerank_factor: int = 4,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ (the faiss ``IVFx,PQy`` scale recipe, composed from the
    repo's two halves): restrict the scan to the ``n_probe`` coarse cells
    nearest the query (:func:`nearest_cell_expr`; at 100 TB the encoded
    corpus is persisted PARTITIONED BY cell — same directory-pruning
    shape as :func:`build_lsh_index` — so unprobed cells are never read),
    then PQ-ADC coarse-score only those cells' codes and float-rerank the
    top ``k * rerank_factor`` (:func:`pq_topk`). Probe order is
    deterministic (stable argsort, lowest cell id on ties), matching the
    cell-assignment tie-break."""
    if n_probe <= 0:
        raise ValueError("n_probe must be positive")
    q = np.asarray(query, dtype=np.float64)
    qd = ((centroids - q) ** 2).sum(axis=1)
    probe_cells = [int(i) for i in np.argsort(qd, kind="stable")[:n_probe]]
    assigned = df.withColumn(
        "_cell", nearest_cell_expr(F.col(vec_col), centroids)
    )
    cands = assigned.where(F.col("_cell").isin(probe_cells)).drop("_cell")
    return pq_topk(
        cands, query, k, rerank_factor, n_sub, n_cent, id_col, vec_col,
        codebook=codebook,
    )
