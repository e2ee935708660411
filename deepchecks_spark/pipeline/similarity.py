"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path buckets
with random-hyperplane LSH so each query only scores its bucket. Dot
products run JVM-side via zip_with/aggregate (no Python). The top-k is
two-stage (per-partition pre-top-k, then global) so the shuffle carries
at most n_queries × k × n_partitions rows, never the full cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.col(col).cast("array<double>")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                     id_col: str = "id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus; per-partition pre-top-k keeps the shuffle bounded.

    Returns (query_id, neighbor_id, cosine, rank). Deterministic
    tie-break: (cosine desc, neighbor_id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qe")
    ).withColumn("qn", _norm("qe"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("ce")
    ).withColumn("cn", _norm("ce"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot("qe", "ce") / (F.col("qn") * F.col("cn")))
        .select("query_id", "neighbor_id", "cosine")
    )
    # stage 1: top-k inside each partition (map-side, no shuffle)
    w_local = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    local = scored.withColumn("r", F.row_number().over(w_local)).filter(F.col("r") <= k).drop("r")
    # stage 2: global top-k over the k·partitions survivors
    w_global = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates(df: DataFrame, dim: int, threshold: float = 0.95,
                              n_planes: int = 8, n_tables: int = 1, seed: int = 42,
                              id_col: str = "id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed self-join +
    exact cosine filter ≥ threshold. The bucket equi-join replaces the
    n² cross join; recall is tuned on two axes (fewer planes = bigger
    buckets; more tables = OR-amplification — a pair is a candidate if
    it collides in ANY table). Pass autotune_lsh_params(...) output for
    self-configuring recall. Returns (id_a, id_b, cosine)."""
    planes_by_table = [random_hyperplanes(dim, n_planes, seed + 97 * t)
                       for t in range(n_tables)]
    base = df.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    ).withColumn("n", _norm("v"))
    tb = [
        F.struct(F.lit(t).alias("tbl"),
                 lsh_bucket_expr("v", planes_by_table[t]).alias("bucket"))
        for t in range(n_tables)
    ]
    vecs = base.select(
        "id", "v", "n", F.explode(F.array(*tb)).alias("tb")
    ).select("id", "v", "n", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    a = vecs.alias("a")
    b = vecs.alias("b")
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", _dot("a.v", "b.v") / (F.col("a.n") * F.col("b.n")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


def autotune_lsh_params(df: DataFrame, threshold: float, target_recall: float = 0.9,
                        max_planes: int = 16, max_tables: int = 64,
                        sample_size: int = 1000, id_col: str = "id",
                        vec_col: str = "embedding") -> dict:
    """Choose (n_planes, n_tables) so random-hyperplane LSH reaches
    ``target_recall`` for pairs of cosine ≥ ``threshold`` while
    minimizing the candidate rate at the corpus's BACKGROUND similarity
    (ROADMAP #8 — self-configuring ANN on real corpora, where manual
    plane counts over- or under-bucket).

    Theory (Charikar's SimHash collision probability, public): one
    hyperplane agrees on a pair of cosine s with p(s) = 1 − arccos(s)/π;
    with b planes per table and T OR-amplified tables,
    recall(s) = 1 − (1 − p(s)^b)^T. Given the target recall at
    ``threshold``, every b yields the minimal T(b) =
    ⌈ln(1−r)/ln(1−p₀^b)⌉; among the feasible (b, T≤max_tables) pairs the
    tuner picks the one with the lowest expected false-candidate rate at
    the sampled background similarity — i.e. the most selective buckets
    that still hit recall.

    The background similarity is the median pairwise cosine of a
    bounded deterministic sample (lowest ``sample_size`` ids — a cheap
    TakeOrdered, no full scan; the reference caps check inputs the same
    way, e.g. feature_label_correlation's 100k-row sample). Everything
    else is closed-form math — no search over the corpus.

    Returns {'n_planes', 'n_tables', 'expected_recall',
    'expected_fp_rate', 'background_similarity'}.
    """
    import math

    rows = (
        df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .orderBy("id").limit(sample_size).collect()
    )
    mat = np.asarray([r["v"] for r in rows], dtype=float)
    if len(mat) < 2:
        raise ValueError("autotune_lsh_params needs at least 2 sampled vectors")
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    sims = unit @ unit.T
    s_bg = float(np.median(sims[np.triu_indices(len(mat), k=1)]))

    def p_collide(s: float) -> float:
        return 1.0 - math.acos(min(1.0, max(-1.0, s))) / math.pi

    p0 = p_collide(threshold)
    p_bg = p_collide(s_bg)
    best = None
    for b in range(max_planes, 0, -1):
        pb = p0 ** b
        if pb >= 1.0:  # threshold ≥ 1 → everything collides
            t = 1
        else:
            t = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pb)))
        if t > max_tables:
            continue
        fp = 1.0 - (1.0 - p_bg ** b) ** t
        if best is None or (fp, t) < (best["expected_fp_rate"], best["n_tables"]):
            best = {
                "n_planes": b,
                "n_tables": t,
                "expected_recall": 1.0 - (1.0 - pb) ** t,
                "expected_fp_rate": fp,
                "background_similarity": s_bg,
            }
    if best is None:
        # even b=1 cannot hit the recall within max_tables → take the
        # closest achievable configuration rather than failing
        b = 1
        t = max_tables
        best = {
            "n_planes": b,
            "n_tables": t,
            "expected_recall": 1.0 - (1.0 - p0) ** t,
            "expected_fp_rate": 1.0 - (1.0 - p_bg) ** t,
            "background_similarity": s_bg,
        }
    return best


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def deterministic_int_hyperplanes(n_tables: int, n_planes: int, dim: int) -> list:
    """INTEGER-valued hyperplanes from a pure-integer LCG formula — the
    same literals can be embedded in ANSI SQL, so an external engine
    (the DuckDB correctness oracle) can reproduce the exact bucket
    assignment: integer dot products are IEEE-exact in doubles, making
    the whole LSH pipeline cross-engine deterministic. Returns
    [table][plane][dim] ints in [-1024, 1024]."""
    return [
        [
            [((1103515245 * (t * 1009 + p * 131 + d) + 12345) % 2049) - 1024
             for d in range(dim)]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def lsh_bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-of-projection LSH bucket id as a JVM-side expression: bit i =
    sign(v · plane_i); planes are baked into the plan as literals."""
    bucket = F.lit(0).cast("long")
    v = _as_double(vec_col)
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(x)) for x in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return bucket


def lsh_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 10,
             n_planes: int = 8, n_tables: int = 1, seed: int = 42,
             id_col: str = "id", vec_col: str = "embedding",
             hyperplanes: list | None = None) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane buckets, equi-join on
    (table, bucket), exact scoring within the bucket. Recall is tuned on
    two axes: fewer planes → bigger buckets; more tables (OR-
    amplification) → a neighbor is a candidate if it collides in ANY of
    the ``n_tables`` independent hyperplane sets, P(candidate) =
    1−(1−(1−θ/π)^n_planes)^n_tables. The bucket join replaces the cross
    join — at 10^12 rows this is the only viable shape, and the
    equi-join is AQE-skew-splittable. Candidate pairs are deduped before
    ranking so multi-table hits score once.

    ``hyperplanes`` (optional): explicit [table][plane][dim] values —
    pass deterministic_int_hyperplanes(...) for a cross-engine-
    reproducible bucket assignment (the correctness oracle path)."""
    if hyperplanes is not None:
        planes_by_table = [np.asarray(h, dtype=float) for h in hyperplanes]
        n_tables = len(planes_by_table)
    else:
        planes_by_table = [random_hyperplanes(dim, n_planes, seed + 97 * t)
                           for t in range(n_tables)]

    def entries(df, out_id, vec_name, norm_name):
        base = df.select(
            F.col(id_col).alias(out_id), _as_double(vec_col).alias(vec_name)
        ).withColumn(norm_name, _norm(vec_name))
        tb = [
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_expr(vec_name, planes_by_table[t]).alias("bucket"),
            )
            for t in range(n_tables)
        ]
        return base.select(
            out_id, vec_name, norm_name, F.explode(F.array(*tb)).alias("tb")
        ).select(out_id, vec_name, norm_name, F.col("tb.tbl").alias("tbl"),
                 F.col("tb.bucket").alias("bucket"))

    q = entries(queries, "query_id", "qe", "qn")
    c = entries(corpus, "neighbor_id", "ce", "cn")
    scored = (
        c.join(F.broadcast(q), on=["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot("qe", "ce") / (F.col("qn") * F.col("cn")))
        .select("query_id", "neighbor_id", "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
