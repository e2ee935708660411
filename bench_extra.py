#!/usr/bin/env python
"""Per-substep profiling harness for the optimization rounds (guide §1.4).

NOT part of the frozen driver bench (bench.py is the measured contract);
this file exists so OPTIMIZATION_rNN.md can cite per-operator numbers:
each invocation runs ONE bench stage in a fresh session with per-substep
wall timings, so cold costs (codegen compile, first scan) are attributed
to the operator that pays them.

Usage:  python bench_extra.py <stage> [--repeat N]
        python bench_extra.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_TIMINGS: dict = {}


def step(name):
    """Decorator-ish context: time.time around a callable."""
    class _Ctx:
        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, *exc):
            dt = time.time() - self.t0
            _TIMINGS.setdefault(name, []).append(round(dt, 3))
            print(f"  [{name}] {dt:.2f}s", file=sys.stderr, flush=True)
    return _Ctx()


def build_spark():
    from deepchecks_spark.session import get_spark

    return get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def stage_dedup(spark):
    from deepchecks_spark.pipeline.dedup import (
        deduplicate_by_pairs,
        exact_duplicate_stats,
        minhash_near_duplicates,
        repeated_span_stats,
        simhash,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with step("exact_duplicate_stats"):
        exact_duplicate_stats(docs, ["lang", "source"])
    with step("minhash_near_duplicates"):
        pairs = minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5)
        pairs.persist().count()
    with step("simhash"):
        simhash(docs, "doc_id", "text").count()
    with step("deduplicate_by_pairs"):
        deduplicate_by_pairs(docs, pairs, "doc_id").count()
    pairs.unpersist()
    with step("repeated_span_stats"):
        repeated_span_stats(docs, "doc_id", "text", window_words=10) \
            .agg({"dup_tokens": "sum"}).collect()
    with step("docs.count"):
        docs.count()


def stage_integrity(spark):
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
    checks = [
        ("IsSingleValue", IsSingleValue().add_condition_not_single_value()),
        ("PercentOfNulls", PercentOfNulls().add_condition_percent_of_nulls_not_greater_than(0.05)),
        ("MixedNulls", MixedNulls().add_condition_different_nulls_less_equal_to(1)),
        ("MixedDataTypes", MixedDataTypes().add_condition_rare_type_ratio_not_in_range()),
        ("SpecialCharacters", SpecialCharacters().add_condition_ratio_of_special_characters_less_or_equal()),
        ("DataDuplicates", DataDuplicates(columns=["l_orderkey", "l_partkey", "l_suppkey"]).add_condition_ratio_less_or_equal(0.5)),
    ]
    # run as the Suite does, but timing each check individually
    from deepchecks_spark.core.context import Context

    ctx = Context(train=ds)
    with step("persist+materialize"):
        ctx.persist("train")
    for name, check in checks:
        with step(name):
            check.compute(ctx, "train")
    ctx.unpersist_all()
    with step("df.count"):
        df.count()


def stage_pq(spark):
    from pyspark.sql import functions as F

    from deepchecks_spark.pipeline.similarity import ivfadc_topk, pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)
    with step("pq_topk"):
        pq_topk(queries, emb, dim=64, k=10, m=8, ksub=16, id_col="vec_id").count()
    with step("ivfadc_topk"):
        ivfadc_topk(queries, emb, dim=64, k=10, nlist=16, nprobe=2,
                    m=8, ksub=16, id_col="vec_id").count()
    with step("emb.count"):
        emb.count()


def stage_similarity(spark):
    from pyspark.sql import functions as F

    from deepchecks_spark.pipeline.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)
    with step("brute_force_topk"):
        brute_force_topk(queries, emb, k=10, id_col="vec_id").count()
    with step("ivf_topk"):
        ivf_topk(queries, emb, dim=64, k=10, nlist=16, nprobe=2,
                 id_col="vec_id").count()
    with step("emb.count"):
        emb.count()


def stage_textstats(spark):
    from deepchecks_spark.pipeline.textstats import (
        document_fingerprint,
        language_id,
        text_quality,
        top_terms,
        vocabulary_stats,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with step("text_quality"):
        text_quality(docs, "text").agg({"n_tokens": "sum"}).collect()
    with step("language_id"):
        language_id(docs, "text").groupBy("lang_pred").count().collect()
    with step("document_fingerprint"):
        document_fingerprint(docs, "text").agg({"fingerprint": "min"}).collect()
    with step("vocabulary_stats"):
        vocabulary_stats(docs, "text").collect()
    with step("top_terms"):
        top_terms(docs, "text", k=20).collect()
    with step("docs.count"):
        docs.count()


def stage_relational(spark):
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
    with step("asof_join"):
        asof_join(clicks, views, on=["user_id"], ts_col="ts").count()
    with step("sessionize"):
        sessionize(ev, ["user_id"], "ts", gap_seconds=7200) \
            .agg({"session_id": "max"}).collect()
    with step("heavy_hitters"):
        heavy_hitters(ev, "user_id", k=2000, threshold=60).count()
    with step("ev.count"):
        ev.count()


def stage_corpusdrift(spark):
    from pyspark.sql import functions as F

    from deepchecks_spark.drift.embedding import (
        embedding_drift,
        embedding_drift_timeseries,
    )
    from deepchecks_spark.drift.spark import temporal_drift
    from deepchecks_spark.pipeline.textstats import unigram_js_divergence

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with step("temporal_drift"):
        temporal_drift(ev, "ts", "value", "day", n_bins=10).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with step("embedding_drift"):
        embedding_drift(emb.filter(F.col("vec_id") % 2 == 0),
                        emb.filter(F.col("vec_id") % 2 == 1),
                        "embedding", dim=64, n_features=16).collect()
    ts = emb.selectExpr(
        "timestamp(date_add(date'2024-01-01', cast(vec_id % 3 as int))) AS ts",
        "embedding")
    with step("embedding_drift_timeseries"):
        embedding_drift_timeseries(ts, "ts", "embedding", dim=64,
                                   n_features=16).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with step("unigram_js"):
        unigram_js_divergence(docs.filter(F.col("lang") == "en"),
                              docs.filter(F.col("lang") != "en"),
                              "text").collect()
    with step("ev.count"):
        ev.count()


def stage_drift(spark):
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
    with step("FeatureDrift"):
        FeatureDrift().add_condition_drift_score_less_than().run(train, test)
    with step("LabelDrift"):
        LabelDrift().run(train, test)
    with step("df.count"):
        df.count()


def stage_traintest(spark):
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
    with step("DateTrainTestLeakageDuplicates"):
        DateTrainTestLeakageDuplicates().compute(ctx)
    with step("DateTrainTestLeakageOverlap"):
        DateTrainTestLeakageOverlap().compute(ctx)
    with step("TrainTestSamplesMix"):
        TrainTestSamplesMix().compute(ctx)
    with step("df.count"):
        df.count()


def stage_webgraph(spark):
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
    with step("domain_profile"):
        domain_profile(with_url, "url", "text").count()
    with step("url_spam_scores"):
        url_spam_scores(with_url.select("doc_id", "url"), "url") \
            .agg({"spam_score": "avg"}).collect()
    with step("blocklist"):
        filter_by_domain_blocklist(
            with_url.select("doc_id", "url"), "url",
            [f"example{i}.com" for i in range(0, 1000, 10)]).count()
    with step("boilerplate_lines"):
        boilerplate_lines(docs.select("text"), "text", min_docs=2, k=20).collect()
    old = with_url.filter(F.col("doc_id") % 2 == 0).select("url")
    new = with_url.filter(F.col("doc_id") % 2 == 1).select("url")
    with step("crawl_churn"):
        crawl_churn(old, new, "url").collect()


def stage_tokenizer(spark):
    from deepchecks_spark.pipeline.bpe import (
        apply_bpe,
        char_pair_counts,
        learn_bpe,
    )
    from deepchecks_spark.pipeline.textstats import script_profile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with step("char_pair_counts"):
        char_pair_counts(docs, "text", top_k=100).collect()
    with step("learn_bpe"):
        model = learn_bpe(docs, "text", num_merges=200)
    with step("apply_bpe"):
        apply_bpe(docs.limit(2000), "text", model["merges"]) \
            .agg({"bpe_tokens": "count"}).collect()
    with step("script_profile"):
        script_profile(docs, "text").groupBy("main_script").count().collect()


def stage_corpus_runner(spark):
    import shutil
    import tempfile

    from deepchecks_spark.runner import run_job

    rows = int(os.environ.get("SPARK_GRAFT_CORPUS_ROWS", "1000000"))
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_SCALE_DATA", "/tmp/spark_graft_scale"),
        f"webpages_{rows}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from deepchecks_spark.corpus import generate_corpus_distributed

        generate_corpus_distributed(spark, rows, seed=42, partitions=max(CPUS, 8)) \
            .write.mode("overwrite").parquet(path)
    out = tempfile.mkdtemp(prefix="bench_extra_corpus_")
    try:
        with step("run_job"):
            run_job(spark, path, out, cat_features=["lang"], resume=False)
    finally:
        shutil.rmtree(out, ignore_errors=True)


STAGES = {
    "dedup": stage_dedup,
    "integrity": stage_integrity,
    "pq": stage_pq,
    "similarity": stage_similarity,
    "textstats": stage_textstats,
    "relational": stage_relational,
    "corpusdrift": stage_corpusdrift,
    "drift": stage_drift,
    "traintest": stage_traintest,
    "webgraph": stage_webgraph,
    "tokenizer": stage_tokenizer,
    "corpus_runner": stage_corpus_runner,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", nargs="?")
    ap.add_argument("--repeat", type=int, default=1,
                    help="repeat the stage in the SAME session (pass 2+ to "
                         "separate cold codegen/compile cost from steady state)")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list or not args.stage:
        print(" ".join(STAGES))
        return
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    fn = STAGES[args.stage]
    totals = []
    for i in range(args.repeat):
        print(f"--- pass {i} ---", file=sys.stderr, flush=True)
        t0 = time.time()
        fn(spark)
        totals.append(round(time.time() - t0, 3))
    print(json.dumps({"stage": args.stage, "totals": totals,
                      "steps": _TIMINGS}))


if __name__ == "__main__":
    main()
