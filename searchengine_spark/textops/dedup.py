"""Deduplication operators for large-scale training-data pipelines.

All of these are built from Spark SQL primitives (shuffle-conscious: exact
dedup is one hash aggregate; MinHash-LSH replaces the O(n²) pair join with a
band-bucket join whose fan-out is bounded by bucket size). The shingle/hash
constants are module-level so the DuckDB oracle SQL can be generated from
the *same* values (see entry_queries.py).

Near-dup semantics follow the standard MinHash-LSH construction
(Broder 1997; banding per Mining of Massive Datasets ch.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .hashing import md5_prefix48

# --- shared constants (mirrored into the DuckDB oracle SQL) ---
SHINGLE_N = 3
MINHASH_P = (1 << 31) - 1  # Mersenne prime; keeps a*x+b inside int64
# deterministic affine hash params, generated once (seed 42) and frozen
MINHASH_A = [
    906310530, 1558393129, 1970897249, 1613955976, 259830189, 125193147,
    1265197034, 1725499439, 1440917255, 468662783, 1263834878, 1981286156,
    930295735, 567238099, 428854700, 83145819,
]
MINHASH_B = [
    1120048829, 744137676, 1662630858, 2138096952, 986992934, 1226302815,
    304669965, 641783343, 421065694, 1559241988, 1846728013, 857265483,
    42471291, 1877172761, 1414331233, 313217304,
]
N_HASHES = 16
N_BANDS = 4  # 4 rows per band


def word_ngrams(tokens_col, n: int):
    """Word n-gram *instances* (duplicates kept) from an array<string>
    column; empty array when len(tokens) < n. The single definition of the
    windowing arithmetic — word_shingles and quality.repetition_signals
    both build on it so a slice-bound fix can never diverge."""
    joined = F.transform(
        tokens_col,
        lambda x, i: F.concat_ws(" ", F.slice(tokens_col, i + 1, n)),
    )
    # drop the trailing (n-1) short windows
    return F.slice(
        joined, 1, F.greatest(F.size(tokens_col) - (n - 1), F.lit(0))
    )


def word_shingles(tokens_col, n: int = SHINGLE_N):
    """Distinct word n-gram shingles from an array<string> column."""
    return F.array_distinct(word_ngrams(tokens_col, n))


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-decontamination scan: per training doc, the fraction of its
    distinct word n-gram shingles that appear anywhere in the eval corpus.

    Returns ``(id_col, n_shingles, n_hit, overlap_r)`` for every train doc
    with at least one shingle. The eval shingle set is distinct'd and
    broadcast (an eval suite is tiny next to a training corpus); the train
    side is ONE shingle explode + ONE partially-aggregated groupBy — no
    all-pairs, no doc-id join, linear in corpus size at any scale.
    """
    # per-(doc, shingle) distinct ACROSS rows too, so duplicate doc_id rows
    # (which upstream operators tolerate) can't double-count — keeps the
    # "distinct shingles" contract and the SELECT DISTINCT oracle exact
    tr = shingle_df(train, tokens_col, id_col).distinct()
    ev = F.broadcast(
        shingle_df(eval_df, tokens_col, id_col)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        tr.join(ev, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count("__hit").cast("long").alias("n_hit"),
        )
        .withColumn(
            "overlap_r", F.round(F.col("n_hit") / F.col("n_shingles"), 6)
        )
    )


def exact_dedup_summary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level exact-duplicate accounting: one hash aggregate."""
    groups = df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique_texts"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_docs_in_dup_groups"),
    )


def _exact_keep_ids(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col) frame of the min-id representative per exact text group —
    the single definition of exact-dedup keep semantics (shared by
    exact_dedup and dedup_pipeline so the two can't drift)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_th"))
        .groupBy("_th")
        .agg(F.min(id_col).alias(id_col))
        .drop("_th")
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each exact text group (all input
    columns pass through)."""
    return df.join(_exact_keep_ids(df, id_col, text_col), id_col, "left_semi")


def shingle_df(df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) exploded distinct word n-grams."""
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(tokens_col))).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs via a shingle equi-join.

    Scale note: this is the *verification* kernel; at 100 TB you run it only
    on LSH candidate pairs (minhash_candidate_pairs), never all-pairs. The
    shingle join is the standard inverted-file trick: docs sharing no
    shingle never meet.
    """
    sh = shingle_df(df, tokens_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY for the given candidate pairs
    (the scale-safe verification kernel: work is O(|pairs| x shingles), not
    O(n^2)). Shingles are computed just for docs that appear in a pair
    (semi-join pruning)."""
    # a duplicated (doc_a, doc_b) row would count every shared shingle once
    # per duplicate, inflating jaccard past 1.0 — dedupe defensively (free
    # when the caller already passed distinct pairs)
    pairs = pairs.select("doc_a", "doc_b").distinct()
    involved = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh = shingle_df(df.join(involved, id_col, "left_semi"), tokens_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


# Pair-count cap under which connected components run driver-side: the
# verified near-dup pair set is METADATA-scale (edges, not documents — a
# corpus where 1M+ pairs survive Jaccard verification is mid-dedup of a
# pathological corpus), and each distributed label-prop round costs ~4
# tiny jobs whose fixed latency dwarfs the work at that size (same
# driver/distributed twin pattern as query/wand.py's keep-set).
_DRIVER_CC_MAX_PAIRS = 1 << 20


def _cc_driver(pairs: DataFrame, rows: list) -> DataFrame:
    """Union-find over collected pairs; merging always attaches the larger
    root under the smaller, so by induction each root IS the min id of its
    cluster — identical output to min-label propagation."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    id_type = pairs.schema["doc_a"].dataType.simpleString()
    return pairs.sparkSession.createDataFrame(
        [(v, find(v)) for v in parent],
        f"node {id_type}, component {id_type}",
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 25, driver_max_pairs: int | None = None
) -> DataFrame:
    """Min-label propagation over an undirected pair graph ->
    ``(node, component)`` where component = min node id in the cluster.

    Below ``driver_max_pairs`` (default ``_DRIVER_CC_MAX_PAIRS``) the
    components are computed by union-find on the driver from ONE collect —
    the edge set is metadata-sized long before the corpus is, and each
    distributed round costs ~4 fixed-latency jobs. The distributed twin
    (pinned set-identical by tests) runs above the cap:

    each round joins labels across edges and keeps the per-node min; stops
    when no label changes (checked every round with one tiny aggregate).
    Rounds needed = graph diameter — near-dup clusters are cliquish (dozens
    of hops at worst), so this stays a handful of shuffles even at 100 TB.
    For adversarial long-chain graphs swap in large-star/small-star
    (Kiveris et al., 2014); the operator contract is the same."""
    cap = _DRIVER_CC_MAX_PAIRS if driver_max_pairs is None else driver_max_pairs
    if cap > 0:
        # one job decides AND feeds the fast path: collect at most cap+1
        # rows — if the edge set fits, union-find runs on exactly these
        # rows (no second execution of an unpersisted upstream plan)
        head = pairs.select("doc_a", "doc_b").limit(cap + 1).collect()
        if len(head) <= cap:
            return _cc_driver(pairs, head)
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # localCheckpoint (not persist): each round's frame references the
    # previous one twice, so without lineage truncation the logical plan
    # doubles per iteration — planning itself becomes the bottleneck long
    # before the data does (on a cluster use reliable checkpoint dirs)
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        neigh = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("component").alias("nc")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("nc").alias("nc"))
        )
        # pointer jumping: also adopt the label OF the current label
        # (path-halving), so rounds needed are O(log diameter) instead of
        # O(diameter) — a pure one-hop propagation silently fails to
        # converge on chains longer than max_iter
        grand = labels.select(
            F.col("node").alias("component"), F.col("component").alias("gc")
        )
        new = (
            labels.join(neigh, "node", "left")
            .join(grand, "component", "left")
            .select(
                "node",
                F.least(
                    "component",
                    F.coalesce("nc", F.col("component")),
                    F.coalesce("gc", F.col("component")),
                ).alias("new_component"),
                F.col("component").alias("old_component"),
            )
            .select(
                "node",
                F.col("new_component").alias("component"),
                (F.col("new_component") < F.col("old_component"))
                .cast("int")
                .alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new.agg(F.sum("changed")).collect()[0][0] or 0
        labels = new.drop("changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels


def dedup_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "tokens",
    threshold: float = 0.5,
    with_metrics: bool = False,
):
    """The composed training-data dedup operator: exact dedup -> MinHash-LSH
    candidates -> exact n-gram Jaccard verify -> connected components ->
    keep the min-id representative per near-dup cluster.

    Semantics (each stage deterministic, DuckDB-twin-checked in
    entry_queries._dedup_pipeline_sql):

    1. exact: keep the min-id doc of each identical-``text`` group;
    2. LSH: banded MinHash candidates among the exact survivors
       (``minhash_candidate_pairs`` — no all-pairs join);
    3. verify: exact n-gram Jaccard >= ``threshold`` on candidates only
       (``jaccard_for_pairs``);
    4. cluster: connected components over verified pairs (a~b, b~c => one
       cluster even if a,c were never a candidate pair), keep each
       cluster's min id; docs in no verified pair survive unchanged.

    Returns the surviving rows of ``df`` (same columns); with
    ``with_metrics=True`` returns ``(survivors, metrics_dict)`` where the
    dict counts each stage (forces extra jobs — debugging/reporting only).

    The reference's own candidate-then-verify shape is its phrase search
    (InvertedIndex.java:1278-1330): cheap candidate generation, exact
    verification, never a corpus cross product.
    """
    metrics: dict[str, int] = {}
    if with_metrics:
        metrics["n_input"] = df.count()
    exact_keep = _exact_keep_ids(df, id_col, text_col)
    survivors = df.join(exact_keep, id_col, "left_semi").persist()
    if with_metrics:
        metrics["n_after_exact"] = survivors.count()
    # cand feeds two joins inside jaccard_for_pairs; verified is re-read by
    # every CC round — persist both, materialize verified, drop cand
    cand = minhash_candidate_pairs(survivors, tokens_col, id_col).persist()
    if with_metrics:
        metrics["n_candidate_pairs"] = cand.count()
    verified = jaccard_for_pairs(
        survivors, cand, tokens_col, id_col, threshold=threshold
    ).persist()
    metrics["n_verified_pairs"] = verified.count()
    cand.unpersist()
    comp = connected_components(verified)  # materialized+persisted inside
    verified.unpersist()
    survivors.unpersist()
    drop = comp.where(F.col("component") != F.col("node")).select(
        F.col("node").alias(id_col)
    )
    out = df.join(exact_keep, id_col, "left_semi").join(
        drop, id_col, "left_anti"
    )
    if with_metrics:
        metrics["n_survivors"] = out.count()
        return out, metrics
    return out


def minhash_signatures(df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sig: array<long>[N_HASHES]) MinHash signatures.

    One shuffle (groupBy doc): shingles -> 48-bit ids -> per-hash min of
    (a*x'+b) mod p with x' = x mod p. All JVM-side expressions.
    """
    sh = shingle_df(df, tokens_col, id_col)
    x = md5_prefix48(F.col("shingle")) % F.lit(MINHASH_P)
    hashed = sh.select(
        F.col(id_col),
        F.array(
            *[
                ((F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P))
                for a, b in zip(MINHASH_A, MINHASH_B)
            ]
        ).alias("hs"),
    )
    mins = [
        F.min(F.col("hs").getItem(i)).alias(f"h{i}") for i in range(N_HASHES)
    ]
    return (
        hashed.groupBy(id_col)
        .agg(*mins)
        .select(F.col(id_col), F.array(*[f"h{i}" for i in range(N_HASHES)]).alias("sig"))
    )


def band_keys(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, bkey) LSH band keys from a (id, sig) signature frame.

    A pure projection + explode (no shuffle); shared by the one-shot
    candidate join and the incremental batch-vs-store path so both sides
    derive identical keys from identical signatures.
    """
    rows = N_HASHES // N_BANDS
    return sig_df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(band * rows + r).cast("string")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for band in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bkey")


def minhash_candidate_pairs(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become a candidate pair.

    Shuffle pattern at scale: explode to (band, band_key) — a narrow row —
    then self-join per bucket. Hot buckets (boilerplate text) are the skew
    risk; cap fan-out upstream by exact-deduping first.
    """
    bands = band_keys(minhash_signatures(df, tokens_col, id_col), id_col)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# incremental (batch-vs-corpus) dedup
# ---------------------------------------------------------------------------


def signature_store(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, text_sha, sig) — the per-corpus dedup state an incremental
    pipeline persists between batches.

    ``text_sha`` (sha256 hex) carries exact-dup identity; ``sig`` the
    MinHash signature (NULL for docs too short to shingle — those can only
    ever exact-dup). At 100 TB this is the ONLY thing kept per seen doc:
    ~16·8 B signature + 64 B hash, not tokens or text, so a 10^12-doc
    store is ~0.2 PB → ~80 TB as parquet — scannable state, and the
    band-key projection below prunes it to the colliding buckets only.
    """
    sigs = minhash_signatures(df, tokens_col, id_col)
    return df.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_sha")
    ).join(sigs, id_col, "left")


def estimated_jaccard(sig_a, sig_b):
    """MinHash-estimated Jaccard: fraction of agreeing components.

    The incremental path can't recompute exact Jaccard against seen docs —
    their tokens are gone by design — so it uses the signature estimator
    (unbiased, stderr ~1/sqrt(N_HASHES); Broder 1997). O(N_HASHES) per
    candidate pair, JVM-side.
    """
    return F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(N_HASHES))


def incremental_dedup(
    new_df: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "tokens",
    est_threshold: float = 0.5,
) -> DataFrame:
    """Dedup a new batch against a :func:`signature_store` of everything
    seen so far (the per-crawl-batch form of the dedup pipeline: each
    batch pays one pass against state, never a corpus×corpus join).

    Returns one row per new doc: (id, ``status`` in {'exact_dup',
    'near_dup', 'novel'}, ``dup_of`` = smallest matching partner id, NULL
    for novel). Batch and store id spaces must be disjoint.

    One-pass drop rule: a new doc is a dup if it matches any SEEN doc or
    any SMALLER-ID batch doc — even one that is itself a dup. This
    slightly over-drops transitive chains within a batch (a~b, b~c, a!~c
    still drops c) but keeps the pass single-shot and deterministic; the
    full connected-components treatment stays available via
    :func:`dedup_pipeline` for one-shot corpora.

    To advance state: ``store.unionByName(signature_store(novel_docs))``.

    Scale shape: exact identity via sha equi-joins; near-dup via band-key
    equi-joins (new bands × store bands — the store side is a projection
    of the signature parquet, prunable to colliding buckets); the
    estimator runs only on candidates. No all-pairs anywhere.
    """
    # the batch signature frame feeds ~8 subtrees of the result plan (both
    # exact joins, both band joins, the estimator, the final spine);
    # persist so the shingle+16-hash minhash aggregation runs once, not
    # once per subtree (left persisted — the frame is micro-batch-sized
    # and evicted LRU; callers may unpersist after materializing)
    ns = signature_store(new_df, id_col, text_col, tokens_col).persist()
    seen = store.select(
        F.col(id_col).alias("__pid"),
        F.col("text_sha").alias("__psha"),
        F.col("sig").alias("__psig"),
    )

    # exact partners: any seen doc, or a smaller-id batch doc, same sha
    ex_seen = ns.join(seen, ns["text_sha"] == seen["__psha"]).select(
        F.col(id_col), F.col("__pid").alias("__partner")
    )
    nsl, nsr = ns.alias("l"), ns.alias("r")
    ex_batch = nsl.join(
        nsr,
        (F.col("l.text_sha") == F.col("r.text_sha"))
        & (F.col(f"r.{id_col}") < F.col(f"l.{id_col}")),
    ).select(F.col(f"l.{id_col}").alias(id_col), F.col(f"r.{id_col}").alias("__partner"))
    exact = (
        ex_seen.unionByName(ex_batch)
        .groupBy(id_col)
        .agg(F.min("__partner").alias("__exact_of"))
    )

    # near candidates: band-key collisions vs store and vs smaller batch ids
    new_bands = band_keys(
        ns.where(F.col("sig").isNotNull()).select(id_col, "sig"), id_col
    ).persist()
    store_bands = band_keys(
        seen.where(F.col("__psig").isNotNull()).select(
            F.col("__pid").alias(id_col), F.col("__psig").alias("sig")
        ),
        id_col,
    ).select(F.col(id_col).alias("__pid"), "band", "bkey")
    cand_seen = new_bands.join(store_bands, ["band", "bkey"]).select(
        id_col, F.col("__pid").alias("__partner")
    )
    nbl, nbr = new_bands.alias("bl"), new_bands.alias("br")
    cand_batch = nbl.join(
        nbr,
        (F.col("bl.band") == F.col("br.band"))
        & (F.col("bl.bkey") == F.col("br.bkey"))
        & (F.col(f"br.{id_col}") < F.col(f"bl.{id_col}")),
    ).select(F.col(f"bl.{id_col}").alias(id_col), F.col(f"br.{id_col}").alias("__partner"))
    cand = cand_seen.unionByName(cand_batch).distinct()

    # estimator over candidates only; partner sigs come from store ∪ batch
    partner_sigs = seen.select(
        F.col("__pid").alias("__partner"), F.col("__psig").alias("__partner_sig")
    ).unionByName(
        ns.select(F.col(id_col).alias("__partner"), F.col("sig").alias("__partner_sig"))
    )
    near = (
        cand.join(ns.select(id_col, "sig"), id_col)
        .join(partner_sigs, "__partner")
        .where(
            estimated_jaccard(F.col("sig"), F.col("__partner_sig"))
            >= F.lit(est_threshold)
        )
        .groupBy(id_col)
        .agg(F.min("__partner").alias("__near_of"))
    )

    return (
        ns.select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("__exact_of").isNotNull(), F.lit("exact_dup"))
            .when(F.col("__near_of").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("status"),
            F.coalesce("__exact_of", "__near_of").alias("dup_of"),
        )
    )
