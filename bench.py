#!/usr/bin/env python
"""Benchmark harness: headline engine workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the wall time of the full fused integrity+drift
suite over the largest table (lineitem); ``rows_per_sec`` reports the
corresponding throughput (the north-rule docs/sec analogue). Scaling
evidence (local[8] vs local[32]) is produced by bench_scaling.py and
recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_spark():
    from deepchecks_spark.session import get_spark

    return get_spark("deepchecks_spark_bench", cores=CPUS, shuffle_partitions=CPUS)


def bench_integrity_suite(spark):
    """Fused stats pass + melted string pass + duplicates over lineitem."""
    from pyspark.sql import functions as F

    from deepchecks_spark import Dataset, Suite
    from deepchecks_spark.checks.integrity import (
        DataDuplicates,
        IsSingleValue,
        MixedDataTypes,
        MixedNulls,
        PercentOfNulls,
        SpecialCharacters,
    )

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ds = Dataset(df, cat_features=["l_returnflag", "l_linestatus"], infer_categorical=False)
    suite = Suite(
        "bench integrity",
        IsSingleValue().add_condition_not_single_value(),
        PercentOfNulls().add_condition_percent_of_nulls_not_greater_than(0.05),
        MixedNulls().add_condition_different_nulls_less_equal_to(1),
        MixedDataTypes().add_condition_rare_type_ratio_not_in_range(),
        SpecialCharacters().add_condition_ratio_of_special_characters_less_or_equal(),
        DataDuplicates(columns=["l_orderkey", "l_partkey", "l_suppkey"])
        .add_condition_ratio_less_or_equal(0.5),
    )
    result = suite.run(ds)
    assert not result.get_failures(), [repr(f) for f in result.get_failures()]
    return df.count()


def bench_drift(spark):
    from pyspark.sql import functions as F

    from deepchecks_spark import Dataset
    from deepchecks_spark.checks.traintest import FeatureDrift, LabelDrift

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    mk = lambda d: Dataset(  # noqa: E731
        d.select("o_custkey", "o_totalprice", "o_orderpriority", "o_orderstatus"),
        label="o_orderstatus",
        cat_features=["o_orderpriority"],
        infer_categorical=False,
    )
    train = mk(df.filter(F.col("o_orderkey") % 2 == 0))
    test = mk(df.filter(F.col("o_orderkey") % 2 == 1))
    r = FeatureDrift().add_condition_drift_score_less_than().run(train, test)
    r2 = LabelDrift().run(train, test)
    assert r.value and r2.value
    return df.count()


def bench_traintest_joins(spark):
    from pyspark.sql import functions as F

    from deepchecks_spark import Dataset
    from deepchecks_spark.core.context import Context
    from deepchecks_spark.checks.traintest import (
        DateTrainTestLeakageDuplicates,
        DateTrainTestLeakageOverlap,
        TrainTestSamplesMix,
    )

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    mk = lambda d: Dataset(d, datetime_name="o_orderdate", infer_categorical=False)  # noqa: E731
    ctx = Context(train=mk(df.filter(F.col("o_orderkey") % 2 == 0)),
                  test=mk(df.filter(F.col("o_orderkey") % 2 == 1)))
    DateTrainTestLeakageDuplicates().compute(ctx)
    DateTrainTestLeakageOverlap().compute(ctx)
    TrainTestSamplesMix().compute(ctx)
    return df.count()


def bench_dedup(spark):
    from deepchecks_spark.pipeline.dedup import (
        deduplicate_by_pairs,
        exact_duplicate_stats,
        minhash_near_duplicates,
        repeated_span_stats,
        simhash,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact_duplicate_stats(docs, ["lang", "source"])
    pairs = minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5)
    pairs.persist().count()
    simhash(docs, "doc_id", "text").count()
    # end-to-end: cluster the minhash pairs (iterative pointer-jumping CC)
    # and keep one representative per cluster — the full dedup pipeline,
    # so the clustering's per-iteration localCheckpoint cost is measured
    deduplicate_by_pairs(docs, pairs, "doc_id").count()
    pairs.unpersist()
    # exact-substring duplication (Lee et al. semantics; added r5 —
    # delta documented in BENCH/BASELINE.md)
    repeated_span_stats(docs, "doc_id", "text", window_words=10) \
        .agg({"dup_tokens": "sum"}).collect()
    return docs.count()


def bench_similarity(spark):
    from pyspark.sql import functions as F

    from deepchecks_spark.pipeline.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)
    brute_force_topk(queries, emb, k=10, id_col="vec_id").count()
    # the IVF scale path: quantizer training (bounded sample) + map-only
    # cell assignment + broadcast probe join, measured end-to-end
    ivf_topk(queries, emb, dim=64, k=10, nlist=16, nprobe=2,
             id_col="vec_id").count()
    return emb.count()


def bench_pq(spark):
    # NEW stage (r5 closing): the PQ/ADC compression path — codebook
    # training (bounded sample) + map-only encode + lookup-table full
    # scan, measured end-to-end. Kept OUT of similarity_embeddings so
    # that stage's cross-round timings stay like-for-like.
    from pyspark.sql import functions as F

    from deepchecks_spark.pipeline.similarity import ivfadc_topk, pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)
    pq_topk(queries, emb, dim=64, k=10, m=8, ksub=16,
            id_col="vec_id").count()
    # the composed two-level index (IVF pruning + PQ scoring)
    ivfadc_topk(queries, emb, dim=64, k=10, nlist=16, nprobe=2,
                m=8, ksub=16, id_col="vec_id").count()
    return emb.count()


def _ensure_corpus(spark, rows: int) -> str:
    """Stage the north-rule webtext corpus once (datagen is NOT part of
    the timed run; rows are a pure function of (seed, index))."""
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_SCALE_DATA", "/tmp/spark_graft_scale"),
        f"webpages_{rows}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from deepchecks_spark.corpus import generate_corpus_distributed

        generate_corpus_distributed(spark, rows, seed=42, partitions=max(CPUS, 8)) \
            .write.mode("overwrite").parquet(path)
    return path


CORPUS_ROWS = int(os.environ.get("SPARK_GRAFT_CORPUS_ROWS", "1000000"))


def bench_corpus_runner(spark):
    """The north-rule workload itself (VERDICT r2 next-10): the full
    runner job — global verdicts, per-partition verdicts, violations,
    metrics — over the staged webtext corpus. BENCH_rNN now tracks the
    same job bench_scaling.py measures for the scaling evidence."""
    import shutil
    import tempfile

    from deepchecks_spark.runner import run_job

    path = _ensure_corpus(spark, CORPUS_ROWS)
    out = tempfile.mkdtemp(prefix="bench_corpus_out_")
    try:
        run_job(spark, path, out, cat_features=["lang"], resume=False)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return CORPUS_ROWS


def bench_textstats(spark):
    from deepchecks_spark.pipeline.textstats import (
        document_fingerprint,
        language_id,
        text_quality,
        top_terms,
        vocabulary_stats,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    text_quality(docs, "text").agg({"n_tokens": "sum"}).collect()
    language_id(docs, "text").groupBy("lang_pred").count().collect()
    document_fingerprint(docs, "text").agg({"fingerprint": "min"}).collect()
    # vocabulary pass (round-5 late addition): the token explode +
    # map-side-combined groupBy is the heaviest textstats shape
    vocabulary_stats(docs, "text").collect()
    top_terms(docs, "text", k=20).collect()
    return docs.count()


def bench_relational(spark):
    """Temporal/relational operators over events (round-5 addition —
    delta documented in BENCH/BASELINE.md): as-of join (one-Exchange
    merge), gap sessionization (one partitioned window), and
    Misra-Gries heavy hitters (bounded-state candidates + exact
    recount)."""
    from pyspark.sql import functions as F

    from deepchecks_spark.pipeline.relational import (
        asof_join,
        heavy_hitters,
        sessionize,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", "event_id")
    views = ev.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", F.col("value").alias("view_value"))
    asof_join(clicks, views, on=["user_id"], ts_col="ts").count()
    sessionize(ev, ["user_id"], "ts", gap_seconds=7200) \
        .agg({"session_id": "max"}).collect()
    heavy_hitters(ev, "user_id", k=2000, threshold=60).count()
    return ev.count()


def bench_corpus_drift(spark):
    """Corpus-drift operators (round-5 addition, NEW stage so the
    pre-existing per-stage timings stay cross-round comparable):
    PSI drift time series over events, RFF-MMD embedding drift +
    its per-window time series, and unigram JS lexical divergence."""
    from pyspark.sql import functions as F

    from deepchecks_spark.drift.embedding import (
        embedding_drift,
        embedding_drift_timeseries,
    )
    from deepchecks_spark.drift.spark import temporal_drift
    from deepchecks_spark.pipeline.textstats import unigram_js_divergence

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    temporal_drift(ev, "ts", "value", "day", n_bins=10).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    embedding_drift(emb.filter(F.col("vec_id") % 2 == 0),
                    emb.filter(F.col("vec_id") % 2 == 1),
                    "embedding", dim=64, n_features=16).collect()
    ts = emb.selectExpr(
        "timestamp(date_add(date'2024-01-01', cast(vec_id % 3 as int))) AS ts",
        "embedding")
    embedding_drift_timeseries(ts, "ts", "embedding", dim=64,
                               n_features=16).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    unigram_js_divergence(docs.filter(F.col("lang") == "en"),
                          docs.filter(F.col("lang") != "en"),
                          "text").collect()
    return ev.count()


def bench_webgraph(spark):
    """Web-graph / URL-level operators (round-5 addition, NEW stage so
    pre-existing timings stay cross-round comparable): per-domain
    profile (hash-only shuffles), URL spam scoring (zero-shuffle
    projection), domain blocklist filtering (literal arrays_overlap
    path), boilerplate-line report (TakeOrdered top-k) and the
    crawl-churn summary (distinct + full-outer join)."""
    from pyspark.sql import functions as F

    from deepchecks_spark.pipeline.webclean import (
        boilerplate_lines,
        crawl_churn,
        domain_profile,
        filter_by_domain_blocklist,
        url_spam_scores,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    url = ("concat('http://', CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END,"
           " 'example', CAST(doc_id % 1000 AS STRING), '.com/p',"
           " CAST(doc_id % 7 AS STRING),"
           " CASE WHEN doc_id % 4 = 0 THEN '?a=1&b=2' ELSE '' END)")
    with_url = docs.selectExpr("doc_id", "text", url + " AS url")
    domain_profile(with_url, "url", "text").count()
    url_spam_scores(with_url.select("doc_id", "url"), "url") \
        .agg({"spam_score": "avg"}).collect()
    filter_by_domain_blocklist(
        with_url.select("doc_id", "url"), "url",
        [f"example{i}.com" for i in range(0, 1000, 10)]).count()
    boilerplate_lines(docs.select("text"), "text", min_docs=2, k=20).collect()
    old = with_url.filter(F.col("doc_id") % 2 == 0).select("url")
    new = with_url.filter(F.col("doc_id") % 2 == 1).select("url")
    crawl_churn(old, new, "url").collect()
    return docs.count()


def bench_tokenizer(spark):
    """Tokenizer/script operators (final r5 session, NEW stage so
    pre-existing timings stay cross-round comparable): the BPE type
    table (explode + map-side-combined groupBy — the one corpus-volume
    pass of BPE training), iteration-0 pair counts, a 200-merge train
    + Arrow-batched encode on a bounded slice, and the shuffle-free
    script-mix profile."""
    from deepchecks_spark.pipeline.bpe import (
        apply_bpe,
        char_pair_counts,
        learn_bpe,
    )
    from deepchecks_spark.pipeline.textstats import script_profile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    char_pair_counts(docs, "text", top_k=100).collect()
    model = learn_bpe(docs, "text", num_merges=200)
    apply_bpe(docs.limit(2000), "text", model["merges"]) \
        .agg({"bpe_tokens": "count"}).collect()
    script_profile(docs, "text").groupBy("main_script").count().collect()
    return docs.count()


BENCHES = {
    "integrity_suite_lineitem": bench_integrity_suite,
    "feature_label_drift_orders": bench_drift,
    "traintest_joins_orders": bench_traintest_joins,
    "dedup_documents": bench_dedup,
    "similarity_embeddings": bench_similarity,
    "pq_embeddings": bench_pq,
    "textstats_documents": bench_textstats,
    "relational_events": bench_relational,
    "corpusdrift_events": bench_corpus_drift,
    "webgraph_documents": bench_webgraph,
    "tokenizer_documents": bench_tokenizer,
    "corpus_runner_webpages": bench_corpus_runner,
}

# min-of-N for the long-running corpus job: a single run can land in a
# hypervisor-throttle window (measured 17 s vs 181 s for identical runs,
# BENCH/BASELINE.md) — noise only ever ADDS time, so min-of-N reports
# the engine. Three runs because the FIRST corpus run in a fresh JVM
# also pays one-off codegen + page-cache warm-up (~33 s vs ~13 s warm,
# measured r5), so min-of-2 can still report a cold pair. The six
# short queries keep single runs for r1/r2 comparability.
BENCH_RUNS = {"corpus_runner_webpages": 3}


def main():
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen path so timings measure the engine, not startup
    spark.range(1000).count()
    _ensure_corpus(spark, CORPUS_ROWS)  # datagen outside the timed loop
    timings = {}
    rows = {}
    for name, fn in BENCHES.items():
        best = float("inf")
        for _ in range(BENCH_RUNS.get(name, 1)):
            t0 = time.time()
            rows[name] = fn(spark)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    suite_rows = rows["integrity_suite_lineitem"]
    out = {
        "metric": "suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "rows_per_sec_integrity": round(suite_rows / timings["integrity_suite_lineitem"], 1),
        "docs_per_sec_corpus": round(CORPUS_ROWS / timings["corpus_runner_webpages"], 1),
        "corpus_rows": CORPUS_ROWS,
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
