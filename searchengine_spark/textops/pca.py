"""Dominant principal direction of an embedding column, exact-integer
variant (sign-quantized power iteration).

The dimensionality-reduction primitive a training pipeline wants next to
ANN / near-dup (whitening checks, drift monitoring, "is one direction
eating the space" anisotropy audits — Mu & Viswanath 2018 style). True
float PCA is not cross-engine checkable (eigensolves and even float
matvec sums are association-dependent), so this operator computes the
dominant direction of the SIGN-quantized Gram matrix instead — the 1-bit
estimator: with zero-centered embeddings (the fixture's and any
well-trained encoder's regime), sign correlations preserve the leading
covariance direction while making every intermediate an exact integer:

- ``sign_gram``: G = Σ s_i s_iᵀ over s = sign(x) ∈ {-1,0,1}^d — the ONLY
  data-sized pass. Per-Arrow-batch numpy ``SᵀS`` inside ``mapInPandas``
  (vectorized, no per-row Python), one combinable groupBy: the shuffle
  carries ≤ d² rows per partition regardless of corpus size (the MLlib
  computeGramian shape).
- ``power_component``: driver-side power iteration on the collected d²
  integers in PYTHON BIG INTS — exact at any scale, O(d²·iters), corpus-
  size-independent. The result is canonicalized (component of max |v|,
  lowest index on ties, made positive) and rescaled to integer micro
  units by TRUNC-toward-zero division — the exact semantics of DuckDB's
  ``//`` on HUGEINT, so the oracle replays every step bit-for-bit. The
  SQL twin is exact as long as intermediates fit HUGEINT:
  (n·d)^iters · 1e6 < 2^127 (the library itself has no such bound).
- ``project_signs``: proj = Σ_j sign(x_j)·w_j — an exact integer dot
  per row (the cross-engine-safe score kind), shuffle-free, fed to a
  TakeOrdered top-k.

Reference parity note: the reference engine has no linear-algebra stage;
this extends the embedding-column toolkit (similarity.py) the same way
the graph stages extend PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_SCALE = 1_000_000  # component weights in integer micro-units


def sign_gram(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Gram matrix of the sign-quantized vectors as ``(i, j, g)`` longs
    (dense: all d² cells, zero cells included)."""
    import numpy as np
    import pandas as pd

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")

    def part(batches):
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy())
            if X.shape[1] != dim:
                raise ValueError(
                    f"vector dim {X.shape[1]} != declared dim {dim}"
                )
            S = np.sign(X).astype(np.int64)
            acc += S.T @ S
            seen = True
        if seen:
            ii, jj = np.indices((dim, dim))
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()}
            )

    part_schema = "i int, j int, g long"
    return (
        df.select(vec_col)
        .mapInPandas(part, schema=part_schema)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )


def power_component(
    cells, dim: int, n_iter: int = 7, scale: int = PCA_SCALE
) -> list[int]:
    """Dominant eigenvector direction of the integer Gram via ``n_iter``
    UNNORMALIZED power iterations in exact Python big ints, returned as
    canonicalized integer weights in [-scale, scale].

    ``cells`` is an iterable of (i, j, g). Start vector = all-ones.
    Canonical form: the max-|v| component (lowest index on ties) is made
    positive; every weight is trunc-toward-zero of v_j·scale/max|v| —
    replayable in SQL integer arithmetic (``//``).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    G = [[0] * dim for _ in range(dim)]
    for i, j, g in cells:
        G[int(i)][int(j)] = int(g)
    v = [1] * dim
    for _ in range(n_iter):
        v = [
            sum(G[i][j] * v[j] for j in range(dim) if G[i][j])
            for i in range(dim)
        ]
    m = max(abs(x) for x in v)
    if m == 0:
        return [0] * dim
    k = min(i for i in range(dim) if abs(v[i]) == m)
    s = 1 if v[k] > 0 else -1
    out = []
    for x in v:
        num = x * s * scale
        out.append(num // m if num >= 0 else -((-num) // m))
    return out


def project_signs(
    df: DataFrame, vec_col: str, component: list[int]
) -> DataFrame:
    """Adds ``proj`` = Σ_j sign(vec[j])·component[j] — an exact integer
    (|proj| ≤ d·scale, far inside int64), identical under any
    partitioning and in any engine."""
    comp = F.array([F.lit(int(c)).cast("long") for c in component])
    proj = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            comp,
            lambda x, w: F.signum(x).cast("long") * w,
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return df.withColumn("proj", proj)


def dominant_direction_topk(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_iter: int = 7,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """End-to-end: sign Gram (distributed) → power iteration (driver,
    O(d²) data — the scale-independent collect) → top-k rows by |proj|
    (TakeOrdered; vec order ties broken by the first extra column)."""
    cells = [(r["i"], r["j"], r["g"]) for r in sign_gram(df, vec_col, dim).collect()]
    comp = power_component(cells, dim, n_iter=n_iter)
    cols = list(extra_cols or [c for c in df.columns if c != vec_col])
    out = project_signs(df, vec_col, comp).select(*cols, "proj")
    order = [F.desc(F.abs(F.col("proj")))] + [F.asc(c) for c in cols[:1]]
    return out.orderBy(*order).limit(k)


def py_dominant_direction(
    vectors, dim: int, n_iter: int = 7, scale: int = PCA_SCALE
) -> tuple[list[int], list[int]]:
    """Pure-python twin: (component, projections) over a list of float
    vectors."""

    def sgn(x: float) -> int:
        return 1 if x > 0 else (-1 if x < 0 else 0)

    signs = [[sgn(x) for x in v] for v in vectors]
    G = [
        [sum(s[i] * s[j] for s in signs) for j in range(dim)]
        for i in range(dim)
    ]
    cells = [(i, j, G[i][j]) for i in range(dim) for j in range(dim)]
    comp = power_component(cells, dim, n_iter=n_iter, scale=scale)
    projs = [sum(s[j] * comp[j] for j in range(dim)) for s in signs]
    return comp, projs
