"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set — the standard pre-training
contamination check (GPT-3 appendix C / PaLM use 8–13-gram overlap).
The reference has no analogue; this is the engine's training-data
pipeline extension, same family as pipeline/dedup.py.

Scale shape: the benchmark side is SMALL by definition (an eval set),
so its distinct gram-hash set is computed once, gated, and broadcast;
the corpus side never all-pairs-joins. Two paths:

- literal path (tiny benchmarks): the sorted hash set becomes one
  in-plan array and the corpus pass is a ZERO-shuffle projection
  (``array_intersect`` per row);
- join path: corpus grams explode to ``(id, hash)`` rows — the only
  shuffle moves those pairs plus the per-doc counts, never the text —
  and hit counts re-join to the id spine so clean documents keep
  zero rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class BenchmarkTooLargeError(ValueError):
    """The benchmark gram set exceeded max_benchmark_grams."""


def semantic_decontamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
    max_benchmark_rows: int = 100_000,
) -> DataFrame:
    """Embedding-space decontamination (the paraphrase-robust companion
    to :func:`ngram_decontamination` — the PaLM-2 / Llama-2 style
    "near-duplicate of an eval example" sweep): per corpus row, the max
    cosine similarity to ANY benchmark embedding. Returns the corpus id
    spine with

    - ``max_cosine``        — highest cosine vs the benchmark (NULL when
      the corpus embedding is NULL),
    - ``nearest_bench_id``  — benchmark id attaining it (ties break to
      the smallest benchmark id, so the output is deterministic),
    - ``is_contaminated``   — ``max_cosine >= threshold`` (false for
      NULL embeddings).

    Scale shape: the benchmark is gated at ``max_benchmark_rows`` (an
    eval set, by definition small) and BROADCAST; the corpus side is
    scanned exactly once. The broadcast nested-loop join expands each
    corpus row by n_bench IN PLACE, and the per-id max collapses back
    to one row per corpus id in the hash aggregate's partial (map-side)
    step — the only Exchange moves the (id, max) spine, never the
    n_corpus x n_bench expansion (pinned in tests/test_plans.py).
    Dot products are JVM-side ``zip_with``/``aggregate`` — no Python.
    """
    from .similarity import _as_double, _dot, _norm

    bench_id = bench_id_col or id_col
    bench_vec = bench_vec_col or vec_col
    b = benchmark.select(
        F.col(bench_id).alias("__bid"), _as_double(bench_vec).alias("__be")
    ).filter(F.col("__be").isNotNull()).withColumn("__bn", _norm("__be"))
    # gate on the NULL-FILTERED frame: rows without embeddings neither
    # broadcast nor match, so an all-NULL benchmark must raise, not
    # silently report nothing contaminated
    probe = b.limit(max_benchmark_rows + 1).count()
    if probe > max_benchmark_rows:
        raise BenchmarkTooLargeError(
            f"benchmark has more than {max_benchmark_rows:,} rows with "
            "embeddings; semantic_decontamination broadcasts the benchmark "
            "embeddings, so pass a smaller benchmark or raise "
            "max_benchmark_rows explicitly"
        )
    if probe == 0:
        raise ValueError(
            "benchmark has no non-NULL embeddings — nothing to "
            "decontaminate against")
    c = corpus.select(
        F.col(id_col).alias("__id"), _as_double(vec_col).alias("__ce")
    ).withColumn("__cn", _norm("__ce"))
    cos = _dot("__ce", "__be") / (F.col("__cn") * F.col("__bn"))
    joined = c.join(F.broadcast(b), F.col("__ce").isNotNull(), "left").select(
        "__id",
        # lexicographic struct min == (max cosine, then smallest bench id):
        # NULL cosine (null corpus vec) keeps the row but aggregates to NULL
        F.when(cos.isNotNull(), F.struct((-cos).alias("negcos"), F.col("__bid").alias("bid"))).alias("__s"),
    )
    agg = joined.groupBy("__id").agg(F.min("__s").alias("__best"))
    return agg.select(
        F.col("__id").alias(id_col),
        (-F.col("__best.negcos")).alias("max_cosine"),
        F.col("__best.bid").alias("nearest_bench_id"),
        F.coalesce(-F.col("__best.negcos") >= threshold, F.lit(False)).alias("is_contaminated"),
    )


def _gram_hashes(text_col: str, ngram: int):
    """Distinct xxhash64 hashes of the space-joined word ``ngram``-grams
    of ``text_col`` (empty array when the doc is shorter than one gram)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(F.size(toks))
    grams = F.when(
        n >= ngram,
        F.transform(
            F.sequence(F.lit(0), n - F.lit(ngram)),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, ngram), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(grams)


def ngram_decontamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    ngram: int = 13,
    threshold: float = 0.0,
    max_benchmark_grams: int = 5_000_000,
    literal_threshold: int = 10_000,
) -> DataFrame:
    """Per corpus document: how many of its distinct word ``ngram``-grams
    appear anywhere in ``benchmark``. Returns the corpus id spine with

    - ``n_grams``          — distinct grams in the document,
    - ``n_contaminated``   — of those, grams present in the benchmark,
    - ``contaminated_frac``— ratio (0 for sub-gram documents),
    - ``is_contaminated``  — ``contaminated_frac > threshold`` (the
      default 0.0 flags ANY overlap, the GPT-3 convention).

    Grams are compared by xxhash64 — identical to comparing the gram
    text absent a 64-bit collision. The benchmark gram set is counted
    with a ``limit(cap+1)`` probe and a descriptive
    :class:`BenchmarkTooLargeError` is raised above
    ``max_benchmark_grams`` (a benchmark that large is a corpus, not an
    eval set — broadcasting it would flatten the executors)."""
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(_gram_hashes(bench_text, ngram)).alias("__h"))
        .distinct()
    )
    probe = bench_grams.limit(max_benchmark_grams + 1).count()
    if probe > max_benchmark_grams:
        raise BenchmarkTooLargeError(
            f"benchmark has more than {max_benchmark_grams:,} distinct "
            f"{ngram}-grams; decontamination broadcasts the benchmark gram set, "
            "so pass a smaller benchmark or raise max_benchmark_grams explicitly"
        )
    base = corpus.select(
        F.col(id_col).alias("__id"), _gram_hashes(text_col, ngram).alias("__grams")
    ).withColumn("n_grams", F.size("__grams").cast("long"))

    if probe <= literal_threshold:
        hashes = sorted(r["__h"] for r in bench_grams.collect())
        lit_set = F.array(*[F.lit(int(h)).cast("bigint") for h in hashes])
        out = base.withColumn(
            "n_contaminated",
            F.size(F.array_intersect("__grams", lit_set)).cast("long"),
        )
    else:
        hits = (
            base.select("__id", F.explode("__grams").alias("__h"))
            .join(F.broadcast(bench_grams), "__h")
            .groupBy("__id")
            .agg(F.count("*").alias("__hits"))
        )
        out = base.join(hits, "__id", "left").withColumn(
            "n_contaminated", F.coalesce(F.col("__hits"), F.lit(0)).cast("long")
        ).drop("__hits")
    frac = F.col("n_contaminated") / F.greatest(F.col("n_grams"), F.lit(1)).cast("double")
    return (
        out.withColumn("contaminated_frac", frac)
        .withColumn("is_contaminated", frac > threshold)
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            "n_contaminated",
            "contaminated_frac",
            "is_contaminated",
        )
    )


def ngram_overlap(corpus_a: DataFrame, corpus_b: DataFrame, text_col: str,
                  ngram: int = 3, text_col_b: str | None = None) -> DataFrame:
    """Corpus-level word-``ngram`` set overlap between two corpora — the
    one-row contamination/redundancy summary (how much of snapshot B's
    gram vocabulary already exists in snapshot A, and vice versa)::

        n_grams_a, n_grams_b, n_common, jaccard,
        containment_a_in_b, containment_b_in_a

    Grams are compared by xxhash64 of the space-joined gram (identical
    to comparing gram text absent a 64-bit collision — the
    :func:`ngram_decontamination` convention).

    Scale shape: ONE shuffle total — each corpus explodes to
    ``(hash, flag_a, flag_b)`` rows, the tagged union feeds a single
    ``groupBy(hash).agg(max(a), max(b))`` whose map-side combine
    collapses within-partition duplicates before the Exchange (no
    per-corpus ``distinct()`` pre-pass: the group-by IS the dedup), and
    the final agg reduces the O(|vocab union|) table to one row. The
    shuffle carries 8-byte hashes plus two ints; gram text never leaves
    the map side and nothing but one row reaches the driver.
    """
    tcb = text_col_b or text_col
    ga = corpus_a.select(
        F.explode(_gram_hashes(text_col, ngram)).alias("__h"),
        F.lit(1).alias("__a"), F.lit(0).alias("__b"),
    )
    gb = corpus_b.select(
        F.explode(_gram_hashes(tcb, ngram)).alias("__h"),
        F.lit(0).alias("__a"), F.lit(1).alias("__b"),
    )
    per = (
        ga.unionByName(gb)
        .groupBy("__h")
        .agg(F.max("__a").alias("a"), F.max("__b").alias("b"))
    )
    tot = per.agg(
        F.sum("a").cast("long").alias("n_grams_a"),
        F.sum("b").cast("long").alias("n_grams_b"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n_common"),
    )
    union_n = F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_common")
    return tot.select(
        "n_grams_a", "n_grams_b", "n_common",
        F.round(F.when(union_n > 0, F.col("n_common") / union_n.cast("double"))
                .otherwise(F.lit(0.0)), 6).alias("jaccard"),
        F.round(F.when(F.col("n_grams_a") > 0,
                       F.col("n_common") / F.col("n_grams_a").cast("double"))
                .otherwise(F.lit(0.0)), 6).alias("containment_a_in_b"),
        F.round(F.when(F.col("n_grams_b") > 0,
                       F.col("n_common") / F.col("n_grams_b").cast("double"))
                .otherwise(F.lit(0.0)), 6).alias("containment_b_in_a"),
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_name_col: str,
    bench_text_col: str | None = None,
    ngram: int = 13,
    max_benchmark_grams: int = 5_000_000,
) -> DataFrame:
    """Per-BENCHMARK contamination summary — the release-review table
    (one row per eval set) on top of :func:`ngram_decontamination`'s
    per-document flags: for every distinct ``bench_name_col`` value::

        benchmark, n_bench_grams, n_docs_contaminated,
        pct_docs_contaminated

    A document counts as contaminated for benchmark B when ANY of its
    word ``ngram``-grams appears in B (the GPT-3 any-overlap
    convention, threshold 0). Grams compare by xxhash64, identical to
    gram text absent a 64-bit collision.

    Scale shape: the (name, gram-hash) table is deduped with one
    bounded groupBy, gated at ``max_benchmark_grams`` (cap+1 probe +
    descriptive raise — an eval set bigger than that is a corpus), and
    BROADCAST; corpus grams join it map-side, so the only exchange the
    corpus pays is the (doc, benchmark) distinct — one row per
    contaminated (doc, benchmark) pair, not per gram hit. The per-name
    summary and the one-row corpus count are O(benchmarks) and
    broadcast back."""
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.col(bench_name_col).alias("benchmark"),
            F.explode(_gram_hashes(bench_text, ngram)).alias("__h"),
        )
        .groupBy("benchmark", "__h")
        .agg(F.count(F.lit(1)).alias("__dummy"))
        .select("benchmark", "__h")
    )
    probe = bench_grams.limit(max_benchmark_grams + 1).count()
    if probe > max_benchmark_grams:
        raise BenchmarkTooLargeError(
            f"benchmark table has more than {max_benchmark_grams:,} distinct "
            f"(benchmark, {ngram}-gram) pairs; the report broadcasts that set, "
            "so shrink the eval sets or raise max_benchmark_grams explicitly"
        )
    per_bench = bench_grams.groupBy("benchmark").agg(
        F.count(F.lit(1)).alias("n_bench_grams"))
    hits = (
        corpus.select(
            F.col(id_col).alias("__id"),
            F.explode(_gram_hashes(text_col, ngram)).alias("__h"),
        )
        .join(F.broadcast(bench_grams), "__h")
        .select("__id", "benchmark")
        .distinct()
    )
    n_docs = corpus.agg(F.count(F.lit(1)).alias("__n"))
    return (
        per_bench.join(
            hits.groupBy("benchmark").agg(
                F.count(F.lit(1)).alias("n_docs_contaminated")),
            "benchmark", "left")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "benchmark",
            F.col("n_bench_grams").cast("long").alias("n_bench_grams"),
            F.coalesce(F.col("n_docs_contaminated"), F.lit(0)).cast("long")
            .alias("n_docs_contaminated"),
            F.round(
                F.coalesce(F.col("n_docs_contaminated"), F.lit(0))
                / F.greatest(F.col("__n"), F.lit(1)).cast("double"), 6)
            .alias("pct_docs_contaminated"),
        )
        .orderBy("benchmark")
    )
