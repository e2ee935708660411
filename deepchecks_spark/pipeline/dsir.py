"""DSIR-style importance resampling for pretraining-data selection.

Re-expresses the selection method of Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling" (NeurIPS 2023): featurize
every document as a bag of hashed n-grams (unigrams + word bigrams
hashed into ``n_buckets`` feature buckets), fit two smoothed bag-of-
ngrams models — one on a small high-quality TARGET corpus (the
Wikipedia/books proxy), one on the RAW web corpus — and weight every
raw document by its log importance ratio

    log w(doc) = sum over doc's gram buckets [log p_target(b) - log p_raw(b)]

then sample k documents WITHOUT replacement proportionally to w via the
Gumbel-top-k trick (Vieira 2014): add an independent Gumbel noise term
to each document's log-weight and take the k largest keys.

Everything is deterministic and engine-reproducible:

- the gram->bucket hash is the md5-prefix arithmetic used across this
  package (``conv(substring(md5(gram), 1, 7), 16, 10) % n_buckets``),
  which a DuckDB oracle recomputes verbatim;
- the Gumbel noise is a pure function of (doc id, seed) through the
  same md5-uniform construction — no ``F.rand`` (whose stream depends
  on partitioning), no RNG state.

Scale shape (the reason this fits a 10^12-document corpus):

- both model-fitting passes are gram-bucket groupBys with map-side
  combine — the shuffle is bounded by ``n_buckets`` (10k by default),
  NOT by corpus size, because the hash projects the unbounded gram
  vocabulary into a fixed feature space (the paper's own trick);
- the per-bucket weight table is <= ``n_buckets`` rows and broadcasts;
  scoring is explode -> broadcast hash join -> per-doc sum, so the only
  corpus-sized shuffle moves ``(id, double)`` pairs;
- the final top-k orders by a scalar key and Catalyst plans it as
  TakeOrderedAndProject — per-partition partial top-k, never a global
  sort.

Reference behavioral anchor: deepchecks has no data-selection surface;
this extends the engine's corpus-pipeline layer (SURVEY.md "LLM
data-pipeline operators") alongside mixture resampling
(webclean.sample_to_mixture) and token-budget selection
(packing.select_by_token_budget).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16^7 — the span of the 7-hex-digit md5 prefix used for both the
# bucket hash and the Gumbel uniform (same constant as
# webclean.split_by_group so the oracle arithmetic is shared).
_HASH_SPAN = 268_435_456


def _gram_array(text_col: str, include_bigrams: bool = True):
    """array<string> of whitespace unigrams (+ adjacent word bigrams)
    for one document; [] for blank text. Pure codegen'd JVM exprs."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    empty = F.length(F.trim(F.col(text_col))) == 0
    unis = F.when(empty, F.array().cast("array<string>")).otherwise(toks)
    if not include_bigrams:
        return unis
    n = F.size(toks)
    bigs = F.when(
        empty | (n < 2), F.array().cast("array<string>")
    ).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )
    return F.concat(unis, bigs)


def _bucket(gram_col):
    """Deterministic md5-prefix bucket hash of a gram string (modulo is
    applied by the caller, which knows n_buckets)."""
    return F.conv(F.substring(F.md5(gram_col), 1, 7), 16, 10).cast("long")


def _doc_buckets(df: DataFrame, id_col: str, text_col: str,
                 n_buckets: int, include_bigrams: bool) -> DataFrame:
    """(__id, bp) — one row per gram INSTANCE (not distinct): both the
    model counts and the document score are over gram occurrences,
    matching the paper's bag-of-ngrams construction."""
    return (
        df.select(F.col(id_col).alias("__id"),
                  F.explode(_gram_array(text_col, include_bigrams)).alias("__g"))
        .filter(F.col("__g") != "")
        .select("__id", F.pmod(_bucket(F.col("__g")), F.lit(n_buckets)).alias("bp"))
    )


def _bucket_counts(df: DataFrame, id_col: str, text_col: str,
                   n_buckets: int, include_bigrams: bool) -> DataFrame:
    """(bp, c) hashed-gram occurrence counts — map-side-combined
    groupBy whose shuffle is bounded by n_buckets."""
    return (
        _doc_buckets(df, id_col, text_col, n_buckets, include_bigrams)
        .groupBy("bp").agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_importance_weights(raw_df: DataFrame, target_df: DataFrame,
                            id_col: str, text_col: str,
                            n_buckets: int = 10_000,
                            include_bigrams: bool = True) -> DataFrame:
    """Attach the DSIR log importance weight to every raw document.

    Both bag-of-ngrams models use add-one (Laplace) smoothing over the
    full hashed feature space: ``p(b) = (c_b + 1) / (N + n_buckets)``,
    so buckets unseen in the target corpus still get finite mass and
    the weight table is defined for every bucket a raw document can
    hash into. Output adds ``n_grams`` (gram instances) and
    ``log_weight`` (sum of per-gram log ratios; NULL for documents with
    no grams — blank text carries no evidence either way, callers
    exclude them from resampling).

    Scale: two bounded-shuffle count passes + one broadcast join +
    one (id, double) aggregation; see module docstring.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    tgt = _bucket_counts(target_df, id_col, text_col, n_buckets, include_bigrams)
    raw = _bucket_counts(raw_df, id_col, text_col, n_buckets, include_bigrams)
    tgt_tot = tgt.agg(F.sum("c").alias("nt"))
    raw_tot = raw.agg(F.sum("c").alias("nr"))
    # weight table: every bucket that occurs in the raw corpus (a raw
    # document can only hash into those); target counts coalesce to 0.
    wtab = (
        raw.withColumnRenamed("c", "cr")
        .join(tgt.withColumnRenamed("c", "ct"), "bp", "left")
        .crossJoin(F.broadcast(tgt_tot)).crossJoin(F.broadcast(raw_tot))
        .select(
            "bp",
            (F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1)
                   / (F.col("nt") + F.lit(n_buckets)).cast("double"))
             - F.log((F.col("cr") + 1)
                     / (F.col("nr") + F.lit(n_buckets)).cast("double"))
             ).alias("__w"),
        )
    )
    per_doc = (
        _doc_buckets(raw_df, id_col, text_col, n_buckets, include_bigrams)
        .join(F.broadcast(wtab), "bp")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum("__w").alias("log_weight"))
    )
    return (
        raw_df.join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .drop("__id")
        .withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0)))
    )


def gumbel_key_expr(id_col: str, seed: int = 0):
    """Deterministic standard-Gumbel noise for one document:
    ``u = (md5_prefix(id ':' seed) + 0.5) / 16^7`` (the +0.5 keeps u
    strictly inside (0, 1)), ``g = -ln(-ln(u))``. A pure projection —
    reproducible across re-runs, task retries, partitionings and
    engines, unlike ``F.rand``."""
    u = (
        (F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"),
                               F.lit(":"), F.lit(str(int(seed))))),
                1, 7),
            16, 10).cast("long") + F.lit(0.5))
        / F.lit(float(_HASH_SPAN))
    )
    return -F.log(-F.log(u))


def dsir_resample(raw_df: DataFrame, target_df: DataFrame,
                  id_col: str, text_col: str, k: int,
                  n_buckets: int = 10_000, seed: int = 0,
                  include_bigrams: bool = True) -> DataFrame:
    """Select ``k`` raw documents by Gumbel-top-k importance resampling
    (sampling without replacement proportional to the importance
    weights — Vieira 2014's equivalence): key = log_weight + Gumbel(id,
    seed); keep the k largest keys. Documents with no grams (NULL
    log_weight) are excluded — no evidence, no ticket. Ties (exactly
    equal keys) break to the smaller id, making the selection a pure
    function of (corpus, target, k, seed).

    Returns the selected rows of ``raw_df`` plus ``n_grams``,
    ``log_weight`` and ``sample_key``, ordered by descending key. The
    top-k plans as TakeOrderedAndProject (per-partition partial top-k,
    never a global sort)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    scored = dsir_importance_weights(
        raw_df, target_df, id_col, text_col,
        n_buckets=n_buckets, include_bigrams=include_bigrams)
    keyed = (
        scored.filter(F.col("log_weight").isNotNull())
        .withColumn("sample_key",
                    F.col("log_weight") + gumbel_key_expr(id_col, seed))
    )
    return keyed.orderBy(F.col("sample_key").desc(),
                         F.col(id_col).asc()).limit(k)
