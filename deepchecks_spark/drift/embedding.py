"""Embedding-corpus drift — the multivariate companion to the
per-column drift kernels for `array<float>` embedding columns.

The reference's multivariate drift check (
reference/deepchecks/tabular/checks/train_test_validation/multivariate_drift.py)
trains a domain classifier over tabular FEATURES; embeddings have no
named features, so the standard corpus-level statistic is the kernel
maximum mean discrepancy (Gretton et al., JMLR 2012, "A Kernel
Two-Sample Test") estimated with random Fourier features (Rahimi &
Recht, NeurIPS 2007): for the RBF kernel ``k(x,y)=exp(-g*||x-y||^2)``,

    z_j(x) = cos(w_j . x + b_j),  w_j ~ N(0, 2g I),  b_j ~ U[0, 2pi)
    MMD^2  ~= (2/D) * sum_j (mean_A z_j - mean_B z_j)^2

so the whole two-sample statistic collapses to ONE distributive
aggregation per corpus (D feature means + dim coordinate means + a
count), with the projections fixed, seeded constants inlined into the
plan. No pairwise anything, no Python, no shuffle beyond two one-row
exchanges — at 10^12 rows the cost is the two scans.

The same seeded constants are inlined into the DuckDB oracle SQL
(:func:`rff_oracle_sql`), and every dot product folds left-to-right in
both engines, so the comparison is deterministic to the last ulp of
libm cos.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepchecks_spark.core.parallel import spread_input


def rff_params(dim: int, n_features: int, gamma: float, seed: int = 42):
    """Seeded random-Fourier projection constants for the RBF kernel
    ``exp(-gamma * ||x - y||^2)``: returns ``(W, b)`` as plain Python
    float lists (``W`` is n_features x dim, rows ~ N(0, 2*gamma*I);
    ``b`` ~ U[0, 2pi)). Plain floats so the same decimal literals can
    be inlined into both the Spark plan and the oracle SQL."""
    rng = np.random.default_rng(seed)
    w = rng.normal(0.0, math.sqrt(2.0 * gamma), size=(n_features, dim))
    b = rng.uniform(0.0, 2.0 * math.pi, size=n_features)
    return [[float(x) for x in row] for row in w], [float(x) for x in b]


def _features_array(vec_col: str, w: list, b: list):
    """All n_features RFF features of a row as ONE array column: a
    single transform over a nested {w, b} literal, instead of
    n_features separate zip_with/aggregate expression trees — Catalyst
    analysis and codegen stay O(1) in the feature count (the
    _pq_books_lit shape trick; profiled at ~15 s of driver/codegen at
    dim 64 x 16 features in the r5 final session for the nested-Add
    form, and still seconds for the per-feature flat form this
    replaces). Each feature's left-fold b + w0*v[1] + w1*v[2] + ... is
    unchanged, so every bit matches the oracle's left-associative SQL
    chain."""
    wb = F.array(*[
        F.struct(F.array(*[F.lit(float(x)) for x in w_row]).alias("w"),
                 F.lit(float(b_j)).alias("b"))
        for w_row, b_j in zip(w, b)
    ])
    return F.transform(
        wb,
        lambda e: F.cos(F.aggregate(
            F.zip_with(e["w"], F.col(vec_col),
                       lambda wv, xv: wv * xv.cast("double")),
            e["b"], lambda acc, y: acc + y)),
    )


def _corpus_means(df: DataFrame, vec_col: str, w: list, b: list,
                  dim: int, tag: str) -> DataFrame:
    # the n_features interpreted zip_with folds per row are the heavy
    # map work: spread an under-partitioned scan first (no-op at scale)
    rows = (
        spread_input(df)
        .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .select(F.col(vec_col), _features_array(vec_col, w, b).alias("__z"))
    )
    aggs = [F.count(F.lit(1)).alias(f"n_{tag}")]
    aggs += [F.avg(F.element_at(F.col("__z"), j + 1)).alias(f"z{j}_{tag}")
             for j in range(len(b))]
    aggs += [F.avg(F.element_at(F.col(vec_col), k + 1).cast("double"))
             .alias(f"c{k}_{tag}") for k in range(dim)]
    return rows.agg(*aggs)


def embedding_drift(ref: DataFrame, cur: DataFrame, vec_col: str, dim: int,
                    n_features: int = 64, gamma: float | None = None,
                    seed: int = 42) -> DataFrame:
    """RFF-estimated MMD^2 between two embedding corpora plus the
    centroid cosine similarity. One output row::

        n_ref, n_cur, mmd2, centroid_cos

    ``mmd2`` near 0 means the corpora are kernel-indistinguishable at
    this feature resolution; ``centroid_cos`` is the first-moment
    summary (1.0 = identical mean direction). Rows with NULL vectors
    or the wrong dimension are excluded on both sides.

    Scale shape: ONE distributive aggregation per corpus (the RFF
    features and coordinates are codegen'd JVM expressions over the
    array column — no explode, no Python, no Expand), then O(D + dim)
    arithmetic on the two broadcast one-row frames. ``gamma`` defaults
    to ``1/dim`` (the median-heuristic-free convention for unit-ish
    scaled embeddings)."""
    if gamma is None:
        gamma = 1.0 / dim
    w, b = rff_params(dim, n_features, gamma, seed)
    a = _corpus_means(ref, vec_col, w, b, dim, "a")
    c = _corpus_means(cur, vec_col, w, b, dim, "b")
    joined = a.crossJoin(F.broadcast(c))
    mmd2 = F.lit(0.0)
    for j in range(n_features):
        d = F.col(f"z{j}_a") - F.col(f"z{j}_b")
        mmd2 = mmd2 + d * d
    mmd2 = mmd2 * F.lit(2.0 / n_features)
    dot = F.lit(0.0)
    na = F.lit(0.0)
    nb = F.lit(0.0)
    for k in range(dim):
        dot = dot + F.col(f"c{k}_a") * F.col(f"c{k}_b")
        na = na + F.col(f"c{k}_a") * F.col(f"c{k}_a")
        nb = nb + F.col(f"c{k}_b") * F.col(f"c{k}_b")
    cos = F.when((na > 0) & (nb > 0), dot / (F.sqrt(na) * F.sqrt(nb)))
    return joined.select(
        F.col("n_a").cast("long").alias("n_ref"),
        F.col("n_b").cast("long").alias("n_cur"),
        F.round(mmd2, 6).alias("mmd2"),
        F.round(cos, 6).alias("centroid_cos"),
    )


def rff_oracle_sql(vec_expr: str, w: list, b: list) -> list:
    """The DuckDB twin of :func:`_features_array` — one
    ``cos(b + w0*vec[1]::DOUBLE + ...)`` string per feature, same
    left-associative fold order as the Spark expression."""
    out = []
    for j in range(len(b)):
        terms = "".join(
            f" + ({wk!r}) * ({vec_expr})[{k + 1}]::DOUBLE"
            for k, wk in enumerate(w[j])
        )
        out.append(f"cos(({b[j]!r}){terms})")
    return out


def embedding_drift_timeseries(df: DataFrame, ts_col: str, vec_col: str,
                               dim: int, granularity: str = "day",
                               n_features: int = 64,
                               gamma: float | None = None,
                               seed: int = 42) -> DataFrame:
    """Embedding-drift TIME SERIES — the multivariate companion to
    :func:`deepchecks_spark.drift.spark.temporal_drift`: per
    ``granularity`` window (``date_trunc`` semantics), the RFF-MMD^2
    of the window's embedding distribution against the FIRST window's.
    One row per window::

        window_start (string), n_rows, mmd2

    (the baseline window reports 0.0 against itself). Rows with NULL
    timestamps, NULL vectors, or the wrong dimension are excluded.

    Scale shape: the RFF features are per-row codegen'd expressions, so
    the whole series is ONE ``groupBy(window)`` aggregation whose
    shuffle carries O(windows x n_features) partial means — the raw
    vectors never enter an exchange; the first-window lookup and the
    per-window MMD are O(windows) broadcast arithmetic after."""
    if gamma is None:
        gamma = 1.0 / dim
    w, b = rff_params(dim, n_features, gamma, seed)
    rows = spread_input(df).filter(
        F.col(ts_col).isNotNull() & F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim)
    ).select(
        F.date_format(F.date_trunc(granularity, F.col(ts_col)),
                      "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        _features_array(vec_col, w, b).alias("__z"),
    )
    means = rows.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.avg(F.element_at(F.col("__z"), j + 1)).alias(f"z{j}")
          for j in range(n_features)],
    )
    first = means.crossJoin(
        F.broadcast(means.agg(F.min("window_start").alias("__w0")))
    ).filter(F.col("window_start") == F.col("__w0")).select(
        *[F.col(f"z{j}").alias(f"b{j}") for j in range(n_features)])
    mmd2 = F.lit(0.0)
    for j in range(n_features):
        d = F.col(f"z{j}") - F.col(f"b{j}")
        mmd2 = mmd2 + d * d
    return (
        means.crossJoin(F.broadcast(first))
        .select(
            "window_start",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(mmd2 * F.lit(2.0 / n_features), 6).alias("mmd2"),
        )
        .orderBy("window_start")
    )
