"""Driver-contract query registry (consumed by __spark_entry__.py).

Each entry runs a real engine check (or pipeline operator) over the
driver's sf-scale parquet tables and returns a small DataFrame whose
values a DuckDB oracle (oracle_sql) reproduces independently — the
round's correctness gate. Column names/types are aligned on both sides;
floats are rounded identically before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepchecks_spark.dataset import Dataset


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver supplies its own SparkSession; apply the ICU case-mapping
    # opt-out here too (see session.py: the Spark 4.x ICU path serializes
    # every executor thread behind a 200+ s class-init on this host and
    # is slower per row afterwards; JVM case mapping matches the oracles)
    try:
        spark.conf.set("spark.sql.icu.caseMappings.enabled", "false")
    except Exception:
        pass
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate",
]
ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"]


# ---------------------------------------------------------------------------
# integrity checks over the stats pass
# ---------------------------------------------------------------------------

def q_percent_of_nulls_lineitem(spark, sf_dir):
    from deepchecks_spark.checks.integrity import PercentOfNulls

    ds = Dataset(_t(spark, sf_dir, "lineitem"), infer_categorical=False)
    value, _ = PercentOfNulls().compute(_ctx(ds), "train")
    rows = [(c, round(float(v), 6)) for c, v in sorted(value.items())]
    return spark.createDataFrame(rows, "column string, percent_nulls double")


def o_percent_of_nulls_lineitem():
    parts = [
        f"SELECT '{c}' AS column, round(avg(CASE WHEN {c} IS NULL THEN 1.0 ELSE 0.0 END), 6) "
        f"AS percent_nulls FROM lineitem"
        for c in LINEITEM_COLS
    ]
    return " UNION ALL ".join(parts)


def q_is_single_value_orders(spark, sf_dir):
    from deepchecks_spark.checks.integrity import IsSingleValue

    ds = Dataset(_t(spark, sf_dir, "orders"), infer_categorical=False)
    value, _ = IsSingleValue().compute(_ctx(ds), "train")
    rows = [(c, int(v)) for c, v in sorted(value.items())]
    return spark.createDataFrame(rows, "column string, n_unique long")


def o_is_single_value_orders():
    parts = [
        f"SELECT '{c}' AS column, count(DISTINCT {c}) AS n_unique FROM orders"
        for c in ORDERS_COLS
    ]
    return " UNION ALL ".join(parts)


def q_class_imbalance_embeddings(spark, sf_dir):
    from deepchecks_spark.checks.integrity import ClassImbalance

    ds = Dataset(_t(spark, sf_dir, "embeddings"), label="label", infer_categorical=False)
    value, _ = ClassImbalance().compute(_ctx(ds), "train")
    rows = [(int(k), float(v)) for k, v in value.items()]
    return spark.createDataFrame(rows, "label long, ratio double")


def o_class_imbalance_embeddings():
    # python round() is banker's; at n=500 ratios never land on a .xx5
    # boundary (count/5 can't produce .005 fractions), so plain round matches.
    return (
        "SELECT label::BIGINT AS label, round(count(*) / (SELECT count(*) FROM embeddings WHERE "
        "label IS NOT NULL)::double, 2) AS ratio FROM embeddings WHERE label IS NOT NULL GROUP BY label"
    )


def q_data_duplicates_documents(spark, sf_dir):
    from deepchecks_spark.checks.integrity import DataDuplicates

    ds = Dataset(_t(spark, sf_dir, "documents"), infer_categorical=False)
    value, _ = DataDuplicates(columns=["lang", "source"]).compute(_ctx(ds), "train")
    return spark.createDataFrame([(round(float(value), 6),)], "percent_duplicates double")


def o_data_duplicates_documents():
    return (
        "SELECT round(1 - (SELECT count(*) FROM (SELECT DISTINCT lang, source FROM documents))"
        "::double / (SELECT count(*) FROM documents), 6) AS percent_duplicates"
    )


def q_special_characters_documents(spark, sf_dir):
    from deepchecks_spark.checks.integrity import SpecialCharacters

    ds = Dataset(_t(spark, sf_dir, "documents"), infer_categorical=False)
    value, _ = SpecialCharacters(columns=["text", "lang", "source"]).compute(_ctx(ds), "train")
    rows = [(c, round(float(v), 6)) for c, v in sorted(value.items())]
    return spark.createDataFrame(rows, "column string, special_ratio double")


def o_special_characters_documents():
    parts = [
        f"SELECT '{c}' AS column, round(avg(CASE WHEN length({c}) > 0 AND "
        f"length(regexp_replace({c}, '[^a-zA-Z0-9]', '', 'g')) = 0 THEN 1.0 ELSE 0.0 END), 6) "
        f"AS special_ratio FROM documents WHERE {c} IS NOT NULL"
        for c in ["lang", "source", "text"]
    ]
    return " UNION ALL ".join(parts)


def q_text_length_quantiles_documents(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    qs = [0.25, 0.5, 0.75, 0.99]
    row = df.agg(
        F.percentile(F.length("text"), qs).alias("q")
    ).first()["q"]
    rows = [(f"p{int(q * 100)}", round(float(v), 6)) for q, v in zip(qs, row)]
    return spark.createDataFrame(rows, "quantile string, length double")


def o_text_length_quantiles_documents():
    parts = [
        f"SELECT 'p{int(q * 100)}' AS quantile, round(quantile_cont(length(text), {q}), 6) "
        f"AS length FROM documents"
        for q in [0.25, 0.5, 0.75, 0.99]
    ]
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# drift kernels (train = even keys, test = odd keys)
# ---------------------------------------------------------------------------

def q_psi_orders_priority(spark, sf_dir):
    from deepchecks_spark.drift import psi_from_counts
    from deepchecks_spark.drift.spark import categorical_histograms

    df = _t(spark, sf_dir, "orders")
    train = df.filter(F.col("o_orderkey") % 2 == 0)
    test = df.filter(F.col("o_orderkey") % 2 == 1)
    h1 = categorical_histograms(train, ["o_orderpriority"])["o_orderpriority"]
    h2 = categorical_histograms(test, ["o_orderpriority"])["o_orderpriority"]
    score = psi_from_counts(h1, h2, min_category_size_ratio=0.01)
    return spark.createDataFrame([(round(float(score), 6),)], "psi double")


def o_psi_orders_priority():
    # 5 near-balanced categories → no Other-binning triggers; PSI floor 0.01.
    return """
    WITH train AS (SELECT o_orderpriority v FROM orders WHERE o_orderkey % 2 = 0 AND o_orderpriority IS NOT NULL),
         test  AS (SELECT o_orderpriority v FROM orders WHERE o_orderkey % 2 = 1 AND o_orderpriority IS NOT NULL),
         c1 AS (SELECT v, count(*) n FROM train GROUP BY v),
         c2 AS (SELECT v, count(*) n FROM test GROUP BY v),
         j AS (SELECT coalesce(c1.v, c2.v) v, coalesce(c1.n, 0) n1, coalesce(c2.n, 0) n2
               FROM c1 FULL OUTER JOIN c2 ON c1.v = c2.v)
    SELECT round(sum((e - a) * ln(e / a)), 6) AS psi
    FROM (SELECT greatest(n1 / (SELECT sum(n1)::double FROM j), 0.01) e,
                 greatest(n2 / (SELECT sum(n2)::double FROM j), 0.01) a
          FROM j)
    """


def q_cramers_v_events_type(spark, sf_dir):
    from deepchecks_spark.drift import cramers_v_from_counts
    from deepchecks_spark.drift.spark import categorical_histograms

    df = _t(spark, sf_dir, "events")
    # key-parity split (not a timestamp literal): immune to the session
    # timezone of whatever SparkSession the driver hands us
    train = df.filter(F.col("event_id") % 2 == 0)
    test = df.filter(F.col("event_id") % 2 == 1)
    h1 = categorical_histograms(train, ["event_type"])["event_type"]
    h2 = categorical_histograms(test, ["event_type"])["event_type"]
    score = cramers_v_from_counts(h1, h2, min_category_size_ratio=0.01)
    return spark.createDataFrame([(round(float(score), 6),)], "cramers_v double")


def _cramers_sql(table: str, col: str, keycol: str, out_name: str = "cramers_v",
                 extra_select: str | None = None):
    """Bias-corrected Cramér's V on the 2×k contingency after downsizing
    the larger side (round to int), k>2 → no Yates correction. Mirrors
    reference deepchecks drift.py:98-172 semantics. Parameterized so
    FeatureDrift/LabelDrift oracles reuse the identical math."""
    select = extra_select + ", " if extra_select else ""
    return f"""
    WITH train AS (SELECT {col} v FROM {table} WHERE {keycol} % 2 = 0 AND {col} IS NOT NULL),
         test  AS (SELECT {col} v FROM {table} WHERE {keycol} % 2 = 1 AND {col} IS NOT NULL),
         c1 AS (SELECT v, count(*) n FROM train GROUP BY v),
         c2 AS (SELECT v, count(*) n FROM test GROUP BY v),
         j AS (SELECT coalesce(c1.v, c2.v) v, coalesce(c1.n, 0)::double n1, coalesce(c2.n, 0)::double n2
               FROM c1 FULL OUTER JOIN c2 ON c1.v = c2.v),
         sums AS (SELECT sum(n1) s1, sum(n2) s2 FROM j),
         scaled AS (SELECT v,
                    round(CASE WHEN (SELECT s1 FROM sums) > (SELECT s2 FROM sums)
                               THEN n1 * (SELECT s2 FROM sums) / (SELECT s1 FROM sums) ELSE n1 END) a1,
                    round(CASE WHEN (SELECT s2 FROM sums) > (SELECT s1 FROM sums)
                               THEN n2 * (SELECT s1 FROM sums) / (SELECT s2 FROM sums) ELSE n2 END) a2
                    FROM j),
         flt AS (SELECT * FROM scaled WHERE a1 + a2 > 0),
         tot AS (SELECT sum(a1) r1, sum(a2) r2, sum(a1 + a2) n, count(*) k FROM flt),
         chi AS (SELECT sum(pow(a1 - (a1 + a2) * (SELECT r1 FROM tot) / (SELECT n FROM tot), 2)
                          / ((a1 + a2) * (SELECT r1 FROM tot) / (SELECT n FROM tot)))
                      + sum(pow(a2 - (a1 + a2) * (SELECT r2 FROM tot) / (SELECT n FROM tot), 2)
                          / ((a1 + a2) * (SELECT r2 FROM tot) / (SELECT n FROM tot))) chi2
                 FROM flt)
    SELECT {select}round(sqrt(greatest(0, (SELECT chi2 FROM chi) / (SELECT n FROM tot)
                                   - ((SELECT k FROM tot) - 1) * 1.0 / ((SELECT n FROM tot) - 1))
                  / least((SELECT k FROM tot) - pow((SELECT k FROM tot) - 1, 2) / ((SELECT n FROM tot) - 1) - 1,
                          2 - 1.0 / ((SELECT n FROM tot) - 1) - 1)), 6) AS {out_name}
    """


def _ks_sql(table: str, col: str, keycol: str, out_name: str = "ks",
            extra_select: str | None = None):
    """Two-sample KS via SQL-window cumulative CDFs over the merged
    support — the same formulation the engine's ks_from_hist uses."""
    select = extra_select + ", " if extra_select else ""
    return f"""
    WITH t1 AS (SELECT {col} v FROM {table} WHERE {keycol} % 2 = 0 AND {col} IS NOT NULL),
         t2 AS (SELECT {col} v FROM {table} WHERE {keycol} % 2 = 1 AND {col} IS NOT NULL),
         merged AS (SELECT v, 1 a, 0 b FROM t1 UNION ALL SELECT v, 0, 1 FROM t2),
         cum AS (SELECT v,
                        sum(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) ca,
                        sum(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) cb
                 FROM merged),
         grp AS (SELECT v, max(ca) ca, max(cb) cb FROM cum GROUP BY v)
    SELECT {select}round(max(abs(ca / (SELECT count(*)::double FROM t1)
                      - cb / (SELECT count(*)::double FROM t2))), 6) AS {out_name}
    FROM grp
    """


def o_cramers_v_events_type():
    return _cramers_sql("events", "event_type", "event_id")


def q_ks_lineitem_price(spark, sf_dir):
    from deepchecks_spark.drift import ks_from_hist
    from deepchecks_spark.drift.spark import numeric_histograms

    df = _t(spark, sf_dir, "lineitem")
    train = df.filter(F.col("l_orderkey") % 2 == 0)
    test = df.filter(F.col("l_orderkey") % 2 == 1)
    v1, c1 = numeric_histograms(train, ["l_extendedprice"], "exact")["l_extendedprice"]
    v2, c2 = numeric_histograms(test, ["l_extendedprice"], "exact")["l_extendedprice"]
    score = ks_from_hist(v1, c1, v2, c2)
    return spark.createDataFrame([(round(float(score), 6),)], "ks double")


def o_ks_lineitem_price():
    return _ks_sql("lineitem", "l_extendedprice", "l_orderkey")


def q_emd_events_value(spark, sf_dir):
    from deepchecks_spark.drift import emd_from_hist
    from deepchecks_spark.drift.spark import numeric_histograms

    df = _t(spark, sf_dir, "events")
    train = df.filter(F.col("event_id") % 2 == 0)
    test = df.filter(F.col("event_id") % 2 == 1)
    v1, c1 = numeric_histograms(train, ["value"], "exact")["value"]
    v2, c2 = numeric_histograms(test, ["value"], "exact")["value"]
    score = emd_from_hist(v1, c1, v2, c2, margin_quantile_filter=0.0)
    return spark.createDataFrame([(round(float(score), 6),)], "emd double")


def o_emd_events_value():
    # W1 = ∫ |ECDF1 − ECDF2| dx on jointly min-max-scaled values (margin
    # filter 0 here, so no quantile step).
    return """
    WITH t1 AS (SELECT value v FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL AND NOT isnan(value)),
         t2 AS (SELECT value v FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL AND NOT isnan(value)),
         bounds AS (SELECT least((SELECT min(v) FROM t1), (SELECT min(v) FROM t2)) lo,
                           greatest((SELECT max(v) FROM t1), (SELECT max(v) FROM t2)) hi),
         s1 AS (SELECT (v - (SELECT lo FROM bounds)) / ((SELECT hi FROM bounds) - (SELECT lo FROM bounds)) v FROM t1),
         s2 AS (SELECT (v - (SELECT lo FROM bounds)) / ((SELECT hi FROM bounds) - (SELECT lo FROM bounds)) v FROM t2),
         merged AS (SELECT v, 1 a, 0 b FROM s1 UNION ALL SELECT v, 0, 1 FROM s2),
         cum AS (SELECT v,
                        sum(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) ca,
                        sum(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) cb
                 FROM merged),
         grp AS (SELECT v, max(ca) ca, max(cb) cb FROM cum GROUP BY v),
         step AS (SELECT abs(ca / (SELECT count(*)::double FROM s1)
                            - cb / (SELECT count(*)::double FROM s2)) d,
                         lead(v) OVER (ORDER BY v) - v dx
                  FROM grp)
    SELECT round(sum(d * dx), 6) AS emd FROM step WHERE dx IS NOT NULL
    """


# ---------------------------------------------------------------------------
# train/test set-op checks
# ---------------------------------------------------------------------------

def _split_ds(df, key, label=None, index_name=None, datetime_name=None):
    train = Dataset(df.filter(F.col(key) % 2 == 0), label=label, index_name=index_name,
                    datetime_name=datetime_name, infer_categorical=False)
    test = Dataset(df.filter(F.col(key) % 2 == 1), label=label, index_name=index_name,
                   datetime_name=datetime_name, infer_categorical=False)
    return train, test


def q_new_label_embeddings(spark, sf_dir):
    from deepchecks_spark.checks.traintest import NewLabelTrainTest
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "embeddings")
    train, test = _split_ds(df, "vec_id", label="label")
    value, _ = NewLabelTrainTest().compute(Context(train=train, test=test))
    return spark.createDataFrame(
        [(int(value["n_new_labels_samples"]), int(value["n_samples"]))],
        "n_new_labels_samples long, n_samples long",
    )


def o_new_label_embeddings():
    return """
    SELECT (SELECT count(*) FROM embeddings te WHERE te.vec_id % 2 = 1 AND te.label IS NOT NULL
            AND te.label NOT IN (SELECT DISTINCT label FROM embeddings tr
                                 WHERE tr.vec_id % 2 = 0 AND tr.label IS NOT NULL)
           )::BIGINT AS n_new_labels_samples,
           (SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1)::BIGINT AS n_samples
    """


def q_date_leakage_overlap_orders(spark, sf_dir):
    from deepchecks_spark.checks.traintest import DateTrainTestLeakageOverlap
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "orders")
    train, test = _split_ds(df, "o_orderkey", datetime_name="o_orderdate")
    value, _ = DateTrainTestLeakageOverlap().compute(Context(train=train, test=test))
    return spark.createDataFrame([(round(float(value), 6),)], "overlap_ratio double")


def o_date_leakage_overlap_orders():
    return """
    SELECT round(avg(CASE WHEN o_orderdate < (SELECT max(o_orderdate) FROM orders WHERE o_orderkey % 2 = 0)
                          THEN 1.0 ELSE 0.0 END), 6) AS overlap_ratio
    FROM orders WHERE o_orderkey % 2 = 1 AND o_orderdate IS NOT NULL
    """


def q_date_leakage_duplicates_orders(spark, sf_dir):
    from deepchecks_spark.checks.traintest import DateTrainTestLeakageDuplicates
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "orders")
    train, test = _split_ds(df, "o_orderkey", datetime_name="o_orderdate")
    value, _ = DateTrainTestLeakageDuplicates().compute(Context(train=train, test=test))
    return spark.createDataFrame([(round(float(value), 6),)], "dup_date_ratio double")


def o_date_leakage_duplicates_orders():
    return """
    SELECT round(avg(CASE WHEN o_orderdate IN (SELECT DISTINCT o_orderdate FROM orders
                                               WHERE o_orderkey % 2 = 0 AND o_orderdate IS NOT NULL)
                          THEN 1.0 ELSE 0.0 END), 6) AS dup_date_ratio
    FROM orders WHERE o_orderkey % 2 = 1 AND o_orderdate IS NOT NULL
    """


def q_index_leakage_events(spark, sf_dir):
    from deepchecks_spark.checks.traintest import IndexTrainTestLeakage
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "events")
    hi = df.agg(F.max("event_id")).first()[0]
    t_train, t_test = int(hi * 0.6), int(hi * 0.4)
    train = Dataset(df.filter(F.col("event_id") < t_train), index_name="event_id", infer_categorical=False)
    test = Dataset(df.filter(F.col("event_id") >= t_test), index_name="event_id", infer_categorical=False)
    value, _ = IndexTrainTestLeakage().compute(Context(train=train, test=test))
    return spark.createDataFrame([(round(float(value), 6),)], "leak_ratio double")


def o_index_leakage_events():
    # same scale-relative split: train = id < 0.6*max, test = id >= 0.4*max
    return """
    WITH m AS (SELECT cast(floor(max(event_id) * 0.6) AS BIGINT) t_train,
                      cast(floor(max(event_id) * 0.4) AS BIGINT) t_test FROM events)
    SELECT round(coalesce(avg(CASE WHEN event_id < (SELECT t_train FROM m) THEN 1.0 ELSE 0.0 END), 0), 6)
           AS leak_ratio
    FROM events WHERE event_id >= (SELECT t_test FROM m)
    """


def q_samples_mix_customer(spark, sf_dir):
    from deepchecks_spark.checks.traintest import TrainTestSamplesMix
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    train = Dataset(df.filter(F.col("c_custkey") % 2 == 0), features=["c_nationkey", "c_mktsegment"],
                    infer_categorical=False)
    test = Dataset(df.filter(F.col("c_custkey") % 2 == 1), features=["c_nationkey", "c_mktsegment"],
                   infer_categorical=False)
    value, _ = TrainTestSamplesMix().compute(Context(train=train, test=test))
    return spark.createDataFrame([(round(float(value["ratio"]), 6),)], "mix_ratio double")


def o_samples_mix_customer():
    return """
    SELECT round(avg(CASE WHEN EXISTS (SELECT 1 FROM customer tr WHERE tr.c_custkey % 2 = 0
                                       AND tr.c_nationkey IS NOT DISTINCT FROM te.c_nationkey
                                       AND tr.c_mktsegment IS NOT DISTINCT FROM te.c_mktsegment)
                          THEN 1.0 ELSE 0.0 END), 6) AS mix_ratio
    FROM customer te WHERE te.c_custkey % 2 = 1
    """


def q_datasets_size_orders(spark, sf_dir):
    from deepchecks_spark.checks.traintest import DatasetsSizeComparison
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "orders")
    train, test = _split_ds(df, "o_orderkey")
    value, _ = DatasetsSizeComparison().compute(Context(train=train, test=test))
    return spark.createDataFrame([(int(value["Train"]), int(value["Test"]))],
                                 "train_size long, test_size long")


def o_datasets_size_orders():
    return """
    SELECT (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0)::BIGINT AS train_size,
           (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 1)::BIGINT AS test_size
    """


def q_new_category_orders(spark, sf_dir):
    from deepchecks_spark.checks.traintest import NewCategoryTrainTest
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "orders")
    train = Dataset(df.filter(F.col("o_orderkey") % 2 == 0), cat_features=["o_orderpriority", "o_orderstatus"],
                    infer_categorical=False)
    test = Dataset(df.filter(F.col("o_orderkey") % 2 == 1), cat_features=["o_orderpriority", "o_orderstatus"],
                   infer_categorical=False)
    value, _ = NewCategoryTrainTest().compute(Context(train=train, test=test))
    rows = [
        (c, int(info["n_new_categories"]), round(float(info["ratio_of_new_categories"]), 6))
        for c, info in sorted(value.items())
    ]
    return spark.createDataFrame(rows, "column string, n_new_categories long, new_ratio double")


def o_new_category_orders():
    parts = []
    for c in ["o_orderpriority", "o_orderstatus"]:
        parts.append(f"""
        SELECT '{c}' AS column,
               (SELECT count(DISTINCT {c}) FROM orders te WHERE te.o_orderkey % 2 = 1 AND {c} IS NOT NULL
                AND {c} NOT IN (SELECT DISTINCT {c} FROM orders tr WHERE tr.o_orderkey % 2 = 0
                                AND {c} IS NOT NULL))::BIGINT AS n_new_categories,
               round((SELECT count(*) FROM orders te WHERE te.o_orderkey % 2 = 1 AND {c} IS NOT NULL
                      AND {c} NOT IN (SELECT DISTINCT {c} FROM orders tr WHERE tr.o_orderkey % 2 = 0
                                      AND {c} IS NOT NULL))
                     / (SELECT count(*) FROM orders te2 WHERE te2.o_orderkey % 2 = 1
                        AND {c} IS NOT NULL)::double, 6) AS new_ratio
        """)
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / text / similarity)
# ---------------------------------------------------------------------------

def q_exact_dedup_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.dedup import exact_duplicate_stats

    df = _t(spark, sf_dir, "documents")
    stats = exact_duplicate_stats(df, ["lang", "source"])
    return spark.createDataFrame(
        [(int(stats["n_dup_groups"]), int(stats["n_dup_rows"]), round(float(stats["dup_ratio"]), 6))],
        "n_dup_groups long, n_dup_rows long, dup_ratio double",
    )


def o_exact_dedup_documents():
    return """
    WITH g AS (SELECT lang, source, count(*) n FROM documents GROUP BY lang, source)
    SELECT (SELECT count(*) FROM g WHERE n > 1)::BIGINT AS n_dup_groups,
           (SELECT coalesce(sum(n - 1), 0) FROM g WHERE n > 1)::BIGINT AS n_dup_rows,
           round((SELECT coalesce(sum(n - 1), 0) FROM g WHERE n > 1)
                 / (SELECT count(*) FROM documents)::double, 6) AS dup_ratio
    """


def q_token_count_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.textstats import with_token_count

    df = _t(spark, sf_dir, "documents")
    return with_token_count(df, "text").select("doc_id", "n_tokens")


def o_token_count_documents():
    return """
    SELECT doc_id, (CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE array_length(string_split_regex(trim(text), '\\s+')) END)::BIGINT AS n_tokens
    FROM documents
    """


def q_text_quality_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.textstats import text_quality

    df = _t(spark, sf_dir, "documents")
    out = text_quality(df, "text")
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
    )


def o_text_quality_documents():
    return """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents)
    SELECT doc_id,
           len(t)::BIGINT AS n_tokens,
           round(list_sum(list_transform(t, x -> length(x))) / len(t)::double, 6) AS avg_token_len,
           round(len(list_filter(t, x -> x IN ('a', 'the', 'of', 'and', 'to', 'in', 'is', 'that')))
                 / len(t)::double, 6) AS stopword_ratio
    FROM toks
    """


def q_ngram_jaccard_adjacent_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.dedup import jaccard_adjacent

    df = _t(spark, sf_dir, "documents")
    return jaccard_adjacent(df, id_col="doc_id", text_col="text").select(
        "doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard")
    )


def o_ngram_jaccard_adjacent_documents():
    return """
    WITH toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) t FROM documents)
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           round(len(list_intersect(a.t, b.t))
                 / len(list_distinct(list_concat(a.t, b.t)))::double, 6) AS jaccard
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
    """


def q_containment_adjacent_documents(spark, sf_dir):
    """Broder containment (one-sided near-dup) between consecutive doc
    ids, both directions: catches a short document quoted whole inside
    a longer one, which Jaccard under-scores. Same token sets as the
    Jaccard check; the oracle recomputes |A∩B|/|A| and |A∩B|/|B| from
    the distinct-token lists in SQL."""
    from deepchecks_spark.pipeline.dedup import containment_adjacent

    df = _t(spark, sf_dir, "documents")
    return containment_adjacent(df, id_col="doc_id", text_col="text").select(
        "doc_id_a", "doc_id_b",
        F.round("containment_a_in_b", 6).alias("containment_a_in_b"),
        F.round("containment_b_in_a", 6).alias("containment_b_in_a"),
    )


def o_containment_adjacent_documents():
    return """
    WITH toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) t FROM documents)
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           round(len(list_intersect(a.t, b.t)) / len(a.t)::double, 6) AS containment_a_in_b,
           round(len(list_intersect(a.t, b.t)) / len(b.t)::double, 6) AS containment_b_in_a
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
    """


# churn fixture: even docs form the OLD crawl (url keys doc_id % 31),
# odd docs the NEW crawl (keys shifted by +10) — a deterministic
# retained/added/removed split once both residue sets are populated
_CHURN_OLD_SQL = ("concat('http://e.com/', CAST(doc_id % 31 AS STRING))")
_CHURN_NEW_SQL = ("concat('http://e.com/', CAST((doc_id % 31) + 10 AS STRING))")


def q_crawl_churn_documents(spark, sf_dir):
    """Crawl-over-crawl URL churn summary: distinct-URL retention /
    addition / removal between two snapshots. The engine computes it
    with a full-outer join + conditional sums; the oracle recomputes
    each count with INDEPENDENT set operations (semi joins on the
    distinct sides), so the two agree only if the set arithmetic is
    right."""
    from deepchecks_spark.pipeline.webclean import crawl_churn

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter("doc_id % 2 = 0").selectExpr(_CHURN_OLD_SQL + " AS url")
    new = docs.filter("doc_id % 2 = 1").selectExpr(_CHURN_NEW_SQL + " AS url")
    out = crawl_churn(old, new, "url")
    return out.select(
        "n_old", "n_new", "n_retained", "n_added", "n_removed",
        F.round("retention_rate", 6).alias("retention_rate"),
        F.round("growth_rate", 6).alias("growth_rate"),
    )


def o_crawl_churn_documents():
    return f"""
    WITH old AS (SELECT DISTINCT {_CHURN_OLD_SQL} AS u FROM documents WHERE doc_id % 2 = 0),
         new AS (SELECT DISTINCT {_CHURN_NEW_SQL} AS u FROM documents WHERE doc_id % 2 = 1),
         c AS (SELECT (SELECT count(*) FROM old) AS n_old,
                      (SELECT count(*) FROM new) AS n_new,
                      (SELECT count(*) FROM old WHERE u IN (SELECT u FROM new)) AS n_ret)
    SELECT n_old::BIGINT AS n_old, n_new::BIGINT AS n_new, n_ret::BIGINT AS n_retained,
           (n_new - n_ret)::BIGINT AS n_added, (n_old - n_ret)::BIGINT AS n_removed,
           round(n_ret / n_old::DOUBLE, 6) AS retention_rate,
           round((n_new - n_ret) / n_old::DOUBLE, 6) AS growth_rate
    FROM c
    """


# blocklist fixture: five domains, every 3rd doc behind a subdomain —
# blocking example1/example3.com must also drop their subdomain rows
_BLOCKLIST_URL_SQL = (
    "concat('http://',"
    " CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END,"
    " 'example', CAST(doc_id % 5 AS STRING), '.com/p',"
    " CAST(doc_id AS STRING))"
)


def q_domain_blocklist_documents(spark, sf_dir):
    """UT1-style domain blocklist filter: example1.com and example3.com
    are blocked, so every doc whose host is one of them OR any
    subdomain ('sub.example1.com') must vanish. The oracle selects the
    survivors ARITHMETICALLY (doc_id % 5 not in the blocked residues)
    without running any suffix logic — a suffix-matching slip (a
    surviving subdomain row, an over-matched 'notexample1.com') breaks
    the row set."""
    from deepchecks_spark.pipeline.webclean import filter_by_domain_blocklist

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _BLOCKLIST_URL_SQL + " AS url")
    out = filter_by_domain_blocklist(df, "url",
                                     ["example1.com", "example3.com"])
    return out.select("doc_id", "url").orderBy("doc_id")


def o_domain_blocklist_documents():
    return f"""
    SELECT doc_id, {_BLOCKLIST_URL_SQL} AS url
    FROM documents WHERE doc_id % 5 NOT IN (1, 3) ORDER BY doc_id
    """


# NFC fixture: a decomposed 'e' + COMBINING ACUTE and 'A' + COMBINING
# RING appended to every text — normalization must precompose both
_NFC_FIXTURE_SQL = "concat(text, ' café Å')"


def q_nfc_normalize_documents(spark, sf_dir):
    """Unicode NFC normalization (Arrow-batched pandas UDF over
    unicodedata): the planted decomposed combining sequences must
    precompose into 'café' / 'Å'. The oracle is DuckDB's utf8proc
    ``nfc_normalize`` — an INDEPENDENT implementation of the same
    Unicode spec, compared on the full normalized text."""
    from deepchecks_spark.pipeline.webclean import normalize_text_nfc

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _NFC_FIXTURE_SQL + " AS text")
    return normalize_text_nfc(df, "text").select(
        "doc_id", "nfc_text", "changed")


def o_nfc_normalize_documents():
    return f"""
    WITH f AS (SELECT doc_id, {_NFC_FIXTURE_SQL} AS text FROM documents)
    SELECT doc_id, nfc_normalize(text) AS nfc_text,
           nfc_normalize(text) != text AS changed
    FROM f
    """


def q_repetition_stats_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.textstats import repetition_stats

    df = _t(spark, sf_dir, "documents")
    out = repetition_stats(df, "text", ngram=2)
    return out.select(
        "doc_id",
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        F.round("dup_ngram_frac", 6).alias("dup_ngram_frac"),
        "top_ngram_count",
        F.round("top_ngram_char_frac", 6).alias("top_ngram_char_frac"),
    )


def o_repetition_stats_documents():
    # word bigrams: t[i:i+1] is the INCLUSIVE 2-element slice; ties on the
    # max count break to the lexicographically smallest gram on both
    # engines (Spark: first strictly-longer run over the sorted array)
    return r"""
    WITH toks AS (
      SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\s+') END AS t
      FROM documents),
    g AS (
      SELECT doc_id, text, t, len(t) AS nt,
             CASE WHEN len(t) >= 2
                  THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
                  ELSE [] END AS grams
      FROM toks),
    tg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    cnt AS (SELECT doc_id, gram, count(*) AS c FROM tg GROUP BY 1, 2),
    top AS (SELECT doc_id, gram, c,
                   row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
            FROM cnt)
    SELECT g.doc_id,
           round(CASE WHEN nt > 0 THEN (nt - len(list_distinct(t))) / nt::double ELSE 0 END, 6) AS dup_word_frac,
           round(CASE WHEN len(grams) > 0 THEN (len(grams) - len(list_distinct(grams))) / len(grams)::double ELSE 0 END, 6) AS dup_ngram_frac,
           coalesce(top.c, 0)::BIGINT AS top_ngram_count,
           round(coalesce(top.c * length(top.gram) / greatest(length(g.text), 1)::double, 0), 6) AS top_ngram_char_frac
    FROM g LEFT JOIN top ON top.doc_id = g.doc_id AND top.rn = 1
    """


def q_duplicate_chunks_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.dedup import duplicate_chunk_stats

    df = _t(spark, sf_dir, "documents")
    return duplicate_chunk_stats(df, "doc_id", "text", chunk_words=5).select(
        "doc_id", "n_chunks", "n_shared_chunks",
        F.round("shared_chunk_frac", 6).alias("shared_chunk_frac"),
    )


def o_duplicate_chunks_documents():
    # the oracle groups by chunk TEXT; the engine groups by xxhash64 of
    # the chunk — identical results absent a 64-bit collision
    return r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\s+') END AS t
      FROM documents),
    ch AS (SELECT doc_id,
                  unnest(list_transform(range(len(t) // 5),
                         i -> array_to_string(t[i*5+1:i*5+5], ' '))) AS chunk
           FROM toks),
    pair AS (SELECT doc_id, chunk, count(*) AS n_in_doc FROM ch GROUP BY 1, 2),
    pc AS (SELECT chunk, count(*) AS n_docs FROM pair GROUP BY 1),
    roll AS (SELECT doc_id, sum(n_in_doc) AS n_chunks,
                    sum(CASE WHEN n_docs >= 2 THEN n_in_doc ELSE 0 END) AS n_shared
             FROM pair JOIN pc USING (chunk) GROUP BY 1)
    SELECT d.doc_id, coalesce(n_chunks, 0)::BIGINT AS n_chunks,
           coalesce(n_shared, 0)::BIGINT AS n_shared_chunks,
           round(CASE WHEN coalesce(n_chunks, 0) > 0
                      THEN n_shared / n_chunks::double ELSE 0 END, 6) AS shared_chunk_frac
    FROM documents d LEFT JOIN roll USING (doc_id)
    """


def q_embedding_cosine_topk(spark, sf_dir):
    from deepchecks_spark.pipeline.similarity import brute_force_topk

    df = _t(spark, sf_dir, "embeddings")
    queries = df.filter(F.col("vec_id") < 20)
    return brute_force_topk(queries, df, k=5, id_col="vec_id").select(
        "query_id", "neighbor_id", "rank"
    )


def o_embedding_cosine_topk():
    return """
    WITH q AS (SELECT vec_id qid, embedding::DOUBLE[] e FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id nid, embedding::DOUBLE[] e FROM embeddings),
         sims AS (SELECT q.qid, c.nid, list_cosine_similarity(q.e, c.e) s
                  FROM q CROSS JOIN c WHERE q.qid != c.nid),
         ranked AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid ASC) r
                    FROM sims)
    SELECT qid::BIGINT AS query_id, nid::BIGINT AS neighbor_id, r::BIGINT AS rank
    FROM ranked WHERE r <= 5
    """


# ---------------------------------------------------------------------------
# correlation checks (SQL-expressible)
# ---------------------------------------------------------------------------

def q_spearman_lineitem(spark, sf_dir):
    from deepchecks_spark.checks.ml import FeatureFeatureCorrelation

    df = _t(spark, sf_dir, "lineitem")
    r = FeatureFeatureCorrelation._spearman(df, "l_quantity", "l_extendedprice")
    return spark.createDataFrame([(round(float(r), 6),)], "spearman double")


def o_spearman_lineitem():
    return """
    WITH sub AS (SELECT l_quantity x, l_extendedprice y FROM lineitem
                 WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
         r AS (SELECT rank() OVER (ORDER BY x) + (count(*) OVER (PARTITION BY x) - 1) / 2.0 rx,
                      rank() OVER (ORDER BY y) + (count(*) OVER (PARTITION BY y) - 1) / 2.0 ry
               FROM sub)
    SELECT round(corr(rx, ry), 6) AS spearman FROM r
    """


def q_theil_u_orders(spark, sf_dir):
    from deepchecks_spark.checks.ml import FeatureFeatureCorrelation

    df = _t(spark, sf_dir, "orders")
    r = FeatureFeatureCorrelation._symmetric_theil_u(df, "o_orderpriority", "o_orderstatus")
    return spark.createDataFrame([(round(float(r), 6),)], "theil_u double")


def o_theil_u_orders():
    # symmetric Theil's U with natural-log entropies over the contingency
    return """
    WITH sub AS (SELECT o_orderpriority x, o_orderstatus y FROM orders
                 WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
         joint AS (SELECT x, y, count(*)::double n FROM sub GROUP BY x, y),
         tot AS (SELECT sum(n) t FROM joint),
         xc AS (SELECT x, sum(n) nx FROM joint GROUP BY x),
         yc AS (SELECT y, sum(n) ny FROM joint GROUP BY y),
         hx AS (SELECT -sum((nx / (SELECT t FROM tot)) * ln(nx / (SELECT t FROM tot))) h FROM xc),
         hy AS (SELECT -sum((ny / (SELECT t FROM tot)) * ln(ny / (SELECT t FROM tot))) h FROM yc),
         sxy AS (SELECT sum((n / (SELECT t FROM tot)) * ln((yc.ny / (SELECT t FROM tot)) / (n / (SELECT t FROM tot)))) s
                 FROM joint JOIN yc USING (y)),
         syx AS (SELECT sum((n / (SELECT t FROM tot)) * ln((xc.nx / (SELECT t FROM tot)) / (n / (SELECT t FROM tot)))) s
                 FROM joint JOIN xc USING (x))
    SELECT round((
        (SELECT h FROM hx) * (CASE WHEN (SELECT h FROM hx) = 0 THEN 1
                                   ELSE ((SELECT h FROM hx) - (SELECT s FROM sxy)) / (SELECT h FROM hx) END)
      + (SELECT h FROM hy) * (CASE WHEN (SELECT h FROM hy) = 0 THEN 1
                                   ELSE ((SELECT h FROM hy) - (SELECT s FROM syx)) / (SELECT h FROM hy) END)
    ) / ((SELECT h FROM hx) + (SELECT h FROM hy)), 6) AS theil_u
    """


def q_correlation_ratio_orders(spark, sf_dir):
    from deepchecks_spark.checks.ml import FeatureFeatureCorrelation

    df = _t(spark, sf_dir, "orders")
    r = FeatureFeatureCorrelation._correlation_ratio(df, "o_orderpriority", "o_totalprice")
    return spark.createDataFrame([(round(float(r), 6),)], "eta double")


def o_correlation_ratio_orders():
    return """
    WITH sub AS (SELECT o_orderpriority c, o_totalprice v FROM orders
                 WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
         g AS (SELECT c, count(*)::double n, avg(v) m FROM sub GROUP BY c),
         tot AS (SELECT sum(v) / count(*) ya, count(*)::double nt, sum(v * v) s2 FROM sub)
    SELECT round(sqrt(
        (SELECT sum(n * pow(m - (SELECT ya FROM tot), 2)) FROM g)
        / ((SELECT s2 FROM tot) - (SELECT nt FROM tot) * pow((SELECT ya FROM tot), 2))
    ), 6) AS eta
    """


# ---------------------------------------------------------------------------
# sampled ML kernels — oracle strategy (VERDICT r2 next-1): derive fixtures
# whose PROVABLE outcomes the kernels must reproduce exactly. The ppscore
# case table (reference ppscore.py:237-294) pins id-like → 0, constant → 0;
# a perfectly-predictive feature pins the FULL kernel path (sampling, CV,
# weighted-F1, baseline normalization) to exactly 1.0, because per-fold
# F1 = 1 ⇒ (1−b)/(1−b). The DuckDB oracle VERIFIES each premise on the
# actual data (uniqueness / determinism / disjointness) and emits the
# provable score — a broken fixture or a broken kernel both go red.
# ---------------------------------------------------------------------------

_SPARK_PPS_FEATS = [
    "cast(event_id as string) AS id_str",                      # feature_is_id → 0
    "'k' AS const_feat",                                        # constant → 0
    "concat('c_', event_type) AS cat_copy",                     # injective cat → 1
    # injective NUMERIC encoding of the label → numeric-path 1
    "CAST(ascii(substring(event_type, 1, 1)) * 100 + length(event_type) AS DOUBLE) AS num_code",
]
_DUCK_PPS_PREMISES = """
    prem AS (SELECT
        (SELECT count(DISTINCT event_id) = count(*) FROM events) AS id_ok,
        (SELECT count(DISTINCT event_type) FROM events) >= 2 AS multi,
        (SELECT max(c) = 1 FROM (
            SELECT count(DISTINCT event_type) c FROM events
            GROUP BY ascii(substring(event_type, 1, 1)) * 100 + length(event_type))) AS num_det)
"""


def q_pps_feature_label_events(spark, sf_dir):
    from deepchecks_spark.checks.ml import FeatureLabelCorrelation
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "events").selectExpr(*_SPARK_PPS_FEATS, "event_type")
    ds = Dataset(df, label="event_type", infer_categorical=False)
    value, _ = FeatureLabelCorrelation().compute(Context(train=ds), "train")
    rows = [(c, round(float(v), 6)) for c, v in sorted(value.items())]
    return spark.createDataFrame(rows, "feature string, pps double")


def o_pps_feature_label_events():
    return f"""
    WITH {_DUCK_PPS_PREMISES}
    SELECT feature, pps FROM (
        SELECT 'cat_copy' AS feature, CASE WHEN multi THEN 1.0 ELSE -1.0 END AS pps FROM prem
        UNION ALL SELECT 'const_feat', CASE WHEN multi THEN 0.0 ELSE -1.0 END FROM prem
        UNION ALL SELECT 'id_str', CASE WHEN id_ok THEN 0.0 ELSE -1.0 END FROM prem
        UNION ALL SELECT 'num_code', CASE WHEN num_det AND multi THEN 1.0 ELSE -1.0 END FROM prem
    )
    """


def q_outlier_detection_events(spark, sf_dir):
    """Planted single extreme outlier: every non-planted row lies in a
    tight 2-D lattice (x ∈ [0,100), y unique ascending), the planted row
    (event_id = 8) sits at x = 10^6 — its Gower distance to everything
    dwarfs all other pairwise distances, so the LoOP argmax must be the
    planted row (the oracle pins the argmax identity; probability values
    themselves are kernel-specific)."""
    from deepchecks_spark.checks.ml import OutlierSampleDetection
    from deepchecks_spark.core.context import Context

    # the id cap keeps the fixture ≤ 2000 rows at ANY scale factor: the
    # LoOP kernel is O(n²) driver-side by design (the reference's own
    # 5k sample cap), and the argmax identity must not depend on which
    # rows a Bernoulli sample happens to keep — so bound the input
    # deterministically instead of sampling.
    df = _t(spark, sf_dir, "events").filter(
        "event_id % 8 = 0 AND event_id < 16000").selectExpr(
        "CASE WHEN event_id = 8 THEN CAST(1000000 AS DOUBLE) "
        "ELSE CAST(event_id % 100 AS DOUBLE) END AS x",
        "CAST(event_id AS DOUBLE) AS y",
    )
    ds = Dataset(df, infer_categorical=False)
    value, violations = OutlierSampleDetection(n_samples=10_000_000).compute(
        Context(train=ds), "train")
    top = violations.orderBy(F.desc("outlier_probability")).limit(1).first()
    return spark.createDataFrame(
        [(int(value["n_samples"]), float(top["x"]))],
        "n_samples long, top_outlier_x double",
    )


def o_outlier_detection_events():
    return """
    SELECT (SELECT count(*) FROM events
            WHERE event_id % 8 = 0 AND event_id < 16000)::BIGINT AS n_samples,
           CASE WHEN EXISTS (SELECT 1 FROM events WHERE event_id = 8)
                THEN 1000000.0 ELSE -1.0 END AS top_outlier_x
    """


def q_multivariate_drift_orders(spark, sf_dir):
    """Separable fixture: train (even keys) and test (odd keys) live in
    disjoint ranges of the derived feature, so the domain classifier's
    eval predictions are perfectly ordered ⇒ AUC = 1.0 and drift score
    = max(2·AUC−1, 0) = 1.0 EXACTLY — through the full GBM path."""
    from deepchecks_spark.checks.ml import MultivariateDrift
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST((o_orderkey % 1000) + CASE WHEN o_orderkey % 2 = 1 THEN 100000 ELSE 0 END "
        "AS DOUBLE) AS sep",
    )
    mk = lambda d: Dataset(d.drop("o_orderkey"), infer_categorical=False)  # noqa: E731
    ctx = Context(train=mk(df.filter(F.col("o_orderkey") % 2 == 0)),
                  test=mk(df.filter(F.col("o_orderkey") % 2 == 1)))
    value, _ = MultivariateDrift().compute(ctx)
    return spark.createDataFrame(
        [(round(float(value["domain_classifier_auc"]), 4),
          round(float(value["domain_classifier_drift_score"]), 4))],
        "auc double, drift_score double",
    )


def o_multivariate_drift_orders():
    # premise: the two sides are separable (disjoint derived-feature
    # ranges) ⇒ AUC and drift score are provably exactly 1.0
    return """
    WITH s AS (SELECT o_orderkey % 2 AS side,
                      (o_orderkey % 1000) + CASE WHEN o_orderkey % 2 = 1 THEN 100000 ELSE 0 END v
               FROM orders)
    SELECT CASE WHEN (SELECT max(v) FROM s WHERE side = 0) < (SELECT min(v) FROM s WHERE side = 1)
                THEN 1.0 ELSE -1.0 END AS auc,
           CASE WHEN (SELECT max(v) FROM s WHERE side = 0) < (SELECT min(v) FROM s WHERE side = 1)
                THEN 1.0 ELSE -1.0 END AS drift_score
    """


# ---------------------------------------------------------------------------
# hash-based pipeline ops — planted-duplicate oracles (VERDICT r2 next-1a):
# rows with doc_id ≡ 7 (mod 10) are rewritten to one of three planted
# texts. Identical text ⇒ identical shingle set / signature / simhash /
# fingerprint ⇒ the banded bucket joins MUST surface every planted pair
# (recall = 1 by construction) — the queries return the pairs restricted
# to text-equality, which DuckDB reproduces with a plain self-join; a
# missed pair (broken recall) or a split group (nondeterministic hash)
# breaks the value-hash match.
# ---------------------------------------------------------------------------

_SPARK_PLANTED_DUP = (
    "CASE WHEN doc_id % 10 = 7 THEN concat('planted duplicate corpus segment alpha beta gamma "
    "delta epsilon zeta eta theta group ', CAST(CAST(FLOOR((doc_id % 30) / 10) AS INT) AS STRING)) "
    "ELSE text END"
)
_DUCK_PLANTED_DUP = (
    "CASE WHEN doc_id % 10 = 7 THEN 'planted duplicate corpus segment alpha beta gamma "
    "delta epsilon zeta eta theta group ' || CAST(CAST(FLOOR((doc_id % 30) / 10) AS INT) AS VARCHAR) "
    "ELSE text END"
)

_DUCK_PLANTED_PAIRS = f"""
    WITH d AS (SELECT doc_id, {_DUCK_PLANTED_DUP} AS text FROM documents)
    SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b
    FROM d a JOIN d b ON a.text = b.text AND a.doc_id < b.doc_id
"""


def _planted_docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_SPARK_PLANTED_DUP} AS text")


def _restrict_to_text_equal_pairs(pairs, docs):
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    return (
        pairs.join(ta, "id_a").join(tb, "id_b")
        .filter(F.col("__ta") == F.col("__tb"))
        .select("id_a", "id_b")
    )


def q_minhash_near_duplicates_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.dedup import minhash_near_duplicates

    docs = _planted_docs(spark, sf_dir)
    pairs = minhash_near_duplicates(docs, "doc_id", "text", threshold=0.999,
                                    verify="shingles")
    return _restrict_to_text_equal_pairs(pairs, docs)


def o_minhash_near_duplicates_documents():
    return _DUCK_PLANTED_PAIRS


def q_simhash_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.dedup import simhash_near_duplicates

    docs = _planted_docs(spark, sf_dir)
    pairs = simhash_near_duplicates(docs, "doc_id", "text", max_hamming=0)
    return _restrict_to_text_equal_pairs(pairs, docs)


def o_simhash_documents():
    return _DUCK_PLANTED_PAIRS


def q_fingerprint_documents(spark, sf_dir):
    """Winnowing fingerprints over the planted-duplicate corpus: every
    group of identical texts must collapse to exactly one distinct
    (fingerprint, fingerprint_exact) pair — DuckDB can't reproduce the
    xxhash values, but it CAN prove how many distinct values each group
    must have."""
    from deepchecks_spark.pipeline.textstats import document_fingerprint

    docs = _planted_docs(spark, sf_dir)
    fp = document_fingerprint(docs, "text")
    return (
        fp.groupBy("text")
        .agg(F.min("doc_id").alias("group_id"),
             F.count(F.lit(1)).alias("n_docs"),
             F.countDistinct("fingerprint", "fingerprint_exact").alias("n_distinct_fp"))
        .filter(F.col("n_docs") > 1)
        .select("group_id", "n_docs", "n_distinct_fp")
    )


def o_fingerprint_documents():
    return f"""
    WITH d AS (SELECT doc_id, {_DUCK_PLANTED_DUP} AS text FROM documents)
    SELECT min(doc_id)::BIGINT AS group_id, count(*)::BIGINT AS n_docs,
           1::BIGINT AS n_distinct_fp
    FROM d GROUP BY text HAVING count(*) > 1
    """


def q_lsh_topk_embeddings(spark, sf_dir):
    """Cross-engine-deterministic LSH top-k: embeddings are quantized to
    integers (floor(x·1000) — IEEE-exact in doubles on any engine) and
    bucketed with INTEGER hyperplanes from a closed-form LCG, so DuckDB
    reproduces the exact bucket assignment, candidate set, and cosine
    ordering — the approximate index itself is under the value-hash."""
    from deepchecks_spark.pipeline.similarity import (
        deterministic_int_hyperplanes,
        lsh_topk,
    )

    planes = deterministic_int_hyperplanes(n_tables=2, n_planes=6, dim=64)
    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) AS embedding",
    )
    queries = df.filter(F.col("vec_id") < 10)
    return lsh_topk(queries, df, dim=64, k=5, id_col="vec_id",
                    hyperplanes=planes).select("query_id", "neighbor_id", "rank")


def o_lsh_topk_embeddings():
    from deepchecks_spark.pipeline.similarity import deterministic_int_hyperplanes

    planes = deterministic_int_hyperplanes(n_tables=2, n_planes=6, dim=64)
    tables = []
    for t, tbl in enumerate(planes):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(e, CAST({list(plane)} AS DOUBLE[])) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p, plane in enumerate(tbl)
        )
        tables.append(f"SELECT vec_id, {t} AS tbl, {bits} AS bucket, e FROM v")
    buckets = " UNION ALL ".join(tables)
    return f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) e
               FROM embeddings),
         b AS ({buckets}),
         q AS (SELECT * FROM b WHERE vec_id < 10),
         cand AS (SELECT DISTINCT q.vec_id qid, c.vec_id nid
                  FROM q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
                  WHERE q.vec_id != c.vec_id),
         scored AS (SELECT qid, nid,
                           list_dot_product(a.e, c.e)
                           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))) s
                    FROM cand JOIN v a ON a.vec_id = cand.qid JOIN v c ON c.vec_id = cand.nid),
         ranked AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid ASC) r
                    FROM scored)
    SELECT qid::BIGINT AS query_id, nid::BIGINT AS neighbor_id, r::BIGINT AS rank
    FROM ranked WHERE r <= 5
    """


def q_ivf_topk_embeddings(spark, sf_dir):
    """Cross-engine-deterministic IVF top-k: embeddings quantized to
    integers (floor(x·1000)) and a coarse quantizer of INTEGER centroids
    from a closed-form LCG — dot products are IEEE-exact, so DuckDB
    reproduces the exact cell assignment, probe order, candidate set
    and cosine ranking. The approximate inverted-file index itself is
    under the value-hash."""
    from deepchecks_spark.pipeline.similarity import (
        deterministic_int_centroids,
        ivf_topk,
    )

    cents = deterministic_int_centroids(nlist=8, dim=64)
    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) AS embedding",
    )
    queries = df.filter(F.col("vec_id") < 10)
    return ivf_topk(queries, df, dim=64, k=5, nprobe=2, id_col="vec_id",
                    centroids=cents).select("query_id", "neighbor_id", "rank")


def o_ivf_topk_embeddings():
    from deepchecks_spark.pipeline.similarity import deterministic_int_centroids

    cents = deterministic_int_centroids(nlist=8, dim=64)
    cent_rows = " UNION ALL ".join(
        f"SELECT {c} AS cell, CAST({list(vals)} AS DOUBLE[]) AS ce"
        for c, vals in enumerate(cents)
    )
    return f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) e
               FROM embeddings),
         cent AS ({cent_rows}),
         scores AS (SELECT v.vec_id, cent.cell, list_dot_product(v.e, cent.ce) s
                    FROM v CROSS JOIN cent),
         assign AS (SELECT vec_id, cell FROM
                      (SELECT vec_id, cell,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY s DESC, cell ASC) r
                       FROM scores) WHERE r = 1),
         probes AS (SELECT vec_id, cell FROM
                      (SELECT vec_id, cell,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY s DESC, cell ASC) r
                       FROM scores WHERE vec_id < 10) WHERE r <= 2),
         cand AS (SELECT p.vec_id qid, a.vec_id nid
                  FROM probes p JOIN assign a ON p.cell = a.cell
                  WHERE p.vec_id != a.vec_id),
         scored AS (SELECT qid, nid,
                           list_dot_product(a.e, c.e)
                           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))) s
                    FROM cand JOIN v a ON a.vec_id = cand.qid
                              JOIN v c ON c.vec_id = cand.nid),
         ranked AS (SELECT qid, nid,
                           row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid ASC) r
                    FROM scored)
    SELECT qid::BIGINT AS query_id, nid::BIGINT AS neighbor_id, r::BIGINT AS rank
    FROM ranked WHERE r <= 5
    """


def q_pq_topk_embeddings(spark, sf_dir):
    """Cross-engine-deterministic PQ/ADC top-k: embeddings quantized to
    integers (floor(x·1000)) and INTEGER codebooks from a closed-form
    LCG — squared L2 distances and the m-term ADC sums are IEEE-exact in
    doubles, so DuckDB reproduces the exact code assignment, per-query
    lookup tables and approximate-distance ranking. The compressed
    product-quantization index itself is under the value-hash."""
    from deepchecks_spark.pipeline.similarity import (
        deterministic_int_codebooks,
        pq_topk,
    )

    books = deterministic_int_codebooks(m=4, ksub=8, dsub=16)
    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) AS embedding",
    )
    queries = df.filter(F.col("vec_id") < 10)
    return pq_topk(queries, df, dim=64, k=5, m=4, ksub=8, id_col="vec_id",
                   codebooks=books).select("query_id", "neighbor_id", "rank")


def o_pq_topk_embeddings():
    from deepchecks_spark.pipeline.similarity import deterministic_int_codebooks

    books = deterministic_int_codebooks(m=4, ksub=8, dsub=16)
    cw_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {c} AS c, CAST({list(w)} AS DOUBLE[]) AS w"
        for j, book in enumerate(books) for c, w in enumerate(book)
    )
    return f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) e
               FROM embeddings),
         cw AS ({cw_rows}),
         dists AS (SELECT v.vec_id, cw.j, cw.c,
                          e[(cw.j * 16 + 1):(cw.j * 16 + 16)] AS s,
                          list_dot_product(s, s) - 2 * list_dot_product(s, w)
                            + list_dot_product(w, w) AS d
                   FROM v CROSS JOIN cw),
         codes AS (SELECT vec_id, j, c FROM
                     (SELECT vec_id, j, c,
                             row_number() OVER (PARTITION BY vec_id, j
                                                ORDER BY d ASC, c ASC) r
                      FROM dists) WHERE r = 1),
         qd AS (SELECT vec_id AS qid, j, c, d FROM dists WHERE vec_id < 10),
         adist AS (SELECT qd.qid, codes.vec_id AS nid, SUM(qd.d) AS a
                   FROM codes JOIN qd ON codes.j = qd.j AND codes.c = qd.c
                   WHERE codes.vec_id != qd.qid
                   GROUP BY 1, 2),
         ranked AS (SELECT qid, nid,
                           row_number() OVER (PARTITION BY qid ORDER BY a ASC, nid ASC) r
                    FROM adist)
    SELECT qid::BIGINT AS query_id, nid::BIGINT AS neighbor_id, r::BIGINT AS rank
    FROM ranked WHERE r <= 5
    """



def q_ivfadc_topk_embeddings(spark, sf_dir):
    """Cross-engine-deterministic IVFADC top-k: integer LCG coarse
    centroids prune the scan to each query's nprobe nearest cells, and
    integer LCG PQ codebooks score the survivors through ADC lookup
    tables — every dot product, squared distance and m-term ADC sum is
    IEEE-exact in doubles, so DuckDB reproduces the exact cell
    assignment, probe order, code assignment and ranking. The composed
    two-level approximate index is under the value-hash."""
    from deepchecks_spark.pipeline.similarity import (
        deterministic_int_centroids,
        deterministic_int_codebooks,
        ivfadc_topk,
    )

    cents = deterministic_int_centroids(nlist=8, dim=64)
    books = deterministic_int_codebooks(m=4, ksub=8, dsub=16)
    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) AS embedding",
    )
    queries = df.filter(F.col("vec_id") < 10)
    return ivfadc_topk(queries, df, dim=64, k=5, nlist=8, nprobe=3,
                       m=4, ksub=8, id_col="vec_id", centroids=cents,
                       codebooks=books).select("query_id", "neighbor_id", "rank")


def o_ivfadc_topk_embeddings():
    from deepchecks_spark.pipeline.similarity import (
        deterministic_int_centroids,
        deterministic_int_codebooks,
    )

    cents = deterministic_int_centroids(nlist=8, dim=64)
    books = deterministic_int_codebooks(m=4, ksub=8, dsub=16)
    cent_rows = " UNION ALL ".join(
        f"SELECT {c} AS cell, CAST({list(vals)} AS DOUBLE[]) AS ce"
        for c, vals in enumerate(cents)
    )
    cw_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {c} AS c, CAST({list(w)} AS DOUBLE[]) AS w"
        for j, book in enumerate(books) for c, w in enumerate(book)
    )
    return f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) e
               FROM embeddings),
         cent AS ({cent_rows}),
         cscores AS (SELECT v.vec_id, cent.cell, list_dot_product(v.e, cent.ce) s
                     FROM v CROSS JOIN cent),
         assign AS (SELECT vec_id, cell FROM
                      (SELECT vec_id, cell,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY s DESC, cell ASC) r
                       FROM cscores) WHERE r = 1),
         probes AS (SELECT vec_id, cell FROM
                      (SELECT vec_id, cell,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY s DESC, cell ASC) r
                       FROM cscores WHERE vec_id < 10) WHERE r <= 3),
         cw AS ({cw_rows}),
         dists AS (SELECT v.vec_id, cw.j, cw.c,
                          e[(cw.j * 16 + 1):(cw.j * 16 + 16)] AS s,
                          list_dot_product(s, s) - 2 * list_dot_product(s, w)
                            + list_dot_product(w, w) AS d
                   FROM v CROSS JOIN cw),
         codes AS (SELECT vec_id, j, c FROM
                     (SELECT vec_id, j, c,
                             row_number() OVER (PARTITION BY vec_id, j
                                                ORDER BY d ASC, c ASC) r
                      FROM dists) WHERE r = 1),
         cand AS (SELECT p.vec_id AS qid, a.vec_id AS nid
                  FROM probes p JOIN assign a ON p.cell = a.cell
                  WHERE p.vec_id != a.vec_id),
         qd AS (SELECT vec_id AS qid, j, c, d FROM dists WHERE vec_id < 10),
         adist AS (SELECT cand.qid, cand.nid, SUM(qd.d) AS a
                   FROM cand
                   JOIN codes ON codes.vec_id = cand.nid
                   JOIN qd ON qd.qid = cand.qid AND qd.j = codes.j AND qd.c = codes.c
                   GROUP BY 1, 2),
         ranked AS (SELECT qid, nid,
                           row_number() OVER (PARTITION BY qid ORDER BY a ASC, nid ASC) r
                    FROM adist)
    SELECT qid::BIGINT AS query_id, nid::BIGINT AS neighbor_id, r::BIGINT AS rank
    FROM ranked WHERE r <= 5
    """



def q_language_id_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.textstats import language_id

    return language_id(_t(spark, sf_dir, "documents"), "text").select("doc_id", "lang_pred")


def o_language_id_documents():
    from deepchecks_spark.pipeline.textstats import LANG_MARKERS

    score_rows = []
    for lang, words in sorted(LANG_MARKERS.items()):
        arr = ", ".join(f"'{w}'" for w in words)
        score_rows.append(
            f"SELECT doc_id, '{lang}' AS lang, len(list_intersect(t, [{arr}])) AS s FROM toks"
        )
    scores = " UNION ALL ".join(score_rows)
    return f"""
    WITH toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) t FROM documents),
         scores AS ({scores}),
         ranked AS (SELECT doc_id, lang, s,
                           row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang ASC) r
                    FROM scores)
    SELECT doc_id, CASE WHEN s > 0 THEN lang ELSE 'unknown' END AS lang_pred
    FROM ranked WHERE r = 1
    """


def q_bpe_token_count_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.textstats import with_bpe_ish_token_count

    df = _t(spark, sf_dir, "documents")
    return with_bpe_ish_token_count(df, "text").select("doc_id", "n_subtokens")


def o_bpe_token_count_documents():
    return """
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS n_subtokens
    FROM documents
    """


# planted length distribution: lengths 20..118 (5 rows each) plus five
# 1000-char outliers — exercises the ordinal-rank percentile branch with
# a real detected outlier section (r1's run on raw text found 0 rows,
# asserting nothing; VERDICT r1 next-4)
_PLANTED_LEN_CASE = (
    "CAST(CASE WHEN doc_id % 100 = 99 THEN 1000 ELSE 20 + (doc_id % 100) END AS INT)"
)


def q_string_length_outliers_documents(spark, sf_dir):
    from deepchecks_spark.checks.integrity import StringLengthOutOfBounds

    df = _t(spark, sf_dir, "documents").selectExpr(f"repeat('x', {_PLANTED_LEN_CASE}) AS s")
    ds = Dataset(df, infer_categorical=False)
    value, _ = StringLengthOutOfBounds().compute(_ctx(ds), "train")
    rows = []
    for col, info in sorted(value.items()):
        for o in info.get("outliers", []):
            rows.append((col, float(o["range"]["min"]), float(o["range"]["max"]), int(o["n_samples"])))
    schema = "column string, range_min double, range_max double, n_samples long"
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)


def o_string_length_outliers_documents():
    # full SQL twin of the ordinal-rank outlier math for a single upper
    # section (this fixture's shape): nearest-rank percentiles at 6/50/94,
    # IQR*factor/2 outlier test, section = contiguous outlier ranks above
    # the median key, then the min-length-difference section filter
    # (reference string_length_out_of_bounds.py:150-213)
    return f"""
    WITH d AS (SELECT length(repeat('x', {_PLANTED_LEN_CASE})) AS len FROM documents),
         st AS (SELECT count(*)::BIGINT n FROM d),
         r AS (SELECT len, row_number() OVER (ORDER BY len) rnk FROM d),
         nr AS (SELECT n,
                CASE WHEN (6.0*n/100) - floor(6.0*n/100) <= 0.5
                     THEN floor(6.0*n/100) ELSE floor(6.0*n/100)+1 END AS r6,
                CASE WHEN (94.0*n/100) - floor(94.0*n/100) <= 0.5
                     THEN floor(94.0*n/100) ELSE floor(94.0*n/100)+1 END AS r94,
                CASE WHEN (50.0*n/100) - floor(50.0*n/100) <= 0.5
                     THEN floor(50.0*n/100) ELSE floor(50.0*n/100)+1 END AS r50
                FROM st),
         marks AS (SELECT n,
                (SELECT len FROM r WHERE rnk = least(greatest(r6, 1), n)) v6,
                (SELECT len FROM r WHERE rnk = least(greatest(r94, 1), n)) v94,
                (SELECT len FROM r WHERE rnk = least(greatest(r50, 1), n)) v50
                FROM nr),
         flag AS (SELECT rnk, len,
                abs(len - (SELECT v50 FROM marks))
                  > 4.0 * abs((SELECT v94 FROM marks) - (SELECT v6 FROM marks)) / 2.0 AS is_out
                FROM r),
         sec AS (SELECT min(rnk) a, max(rnk) b FROM flag
                 WHERE is_out AND rnk * 2 > (SELECT n FROM marks)),
         norm AS (SELECT min(len) nlo, max(len) nhi FROM flag
                  WHERE rnk < (SELECT a FROM sec) OR rnk > (SELECT b FROM sec)),
         bounds AS (SELECT
                (SELECT len FROM r WHERE rnk = (SELECT a FROM sec)) lo0,
                (SELECT len FROM r WHERE rnk = (SELECT b FROM sec)) hi0,
                (SELECT nlo FROM norm) nlo, (SELECT nhi FROM norm) nhi),
         adj AS (SELECT
                CASE WHEN (lo0 - nhi) > 0 AND (lo0 - nhi) < greatest(5, 0.5*(nhi+nlo)/2.0)
                     THEN lo0 + greatest(5, 0.5*(nhi+nlo)/2.0) - (lo0 - nhi) ELSE lo0 END lo,
                CASE WHEN (lo0 - nhi) <= 0 AND (nlo - hi0) > 0
                          AND (nlo - hi0) < greatest(5, 0.5*(nhi+nlo)/2.0)
                     THEN hi0 - (greatest(5, 0.5*(nhi+nlo)/2.0) - (nlo - hi0)) ELSE hi0 END hi
                FROM bounds)
    SELECT 's' AS column, lo::double AS range_min, hi::double AS range_max,
           (SELECT count(*) FROM d
            WHERE len BETWEEN (SELECT lo FROM adj) AND (SELECT hi FROM adj))::BIGINT AS n_samples
    FROM adj
    """


# ---------------------------------------------------------------------------
# round-2: driver-contract queries for the previously uncontracted
# SURVEY §2 operators (VERDICT r1 next-1). Fixtures that need specific
# pathologies (null reprs, type mixes, case variants) are DERIVED
# deterministically from the driver tables with dialect-shared CASE
# expressions, so Spark and DuckDB see byte-identical inputs.
# ---------------------------------------------------------------------------

_NULLISH_CASE = (
    "CASE doc_id % 9 WHEN 0 THEN 'null' WHEN 1 THEN 'None' WHEN 2 THEN 'N/A' "
    "WHEN 3 THEN '' WHEN 4 THEN NULL WHEN 5 THEN 'nan' ELSE lang END"
)


def q_mixed_nulls_documents(spark, sf_dir):
    from deepchecks_spark.checks.integrity import MixedNulls

    df = _t(spark, sf_dir, "documents").selectExpr(f"{_NULLISH_CASE} AS nullish", "lang")
    ds = Dataset(df, infer_categorical=False)
    value, _ = MixedNulls().compute(_ctx(ds), "train")
    rows = []
    for col, reprs in sorted(value["columns"].items()):
        for key, info in sorted(reprs.items()):
            rows.append((col, key, int(info["count"]), round(float(info["percent"]), 6)))
    return spark.createDataFrame(rows, "column string, null_repr string, count long, percent double")


def o_mixed_nulls_documents():
    # string null-reprs keyed repr-with-double-quotes (reference
    # mixed_nulls.py:126-131), real NULL keyed 'null'; baseform =
    # lowercase alnum-stripped (reference strings.py:279-303)
    return f"""
    WITH d AS (SELECT {_NULLISH_CASE} AS v FROM documents),
         n AS (SELECT count(*)::double c FROM documents)
    SELECT 'nullish' AS column, '"' || v || '"' AS null_repr, count(*)::BIGINT AS count,
           round(count(*) / (SELECT c FROM n), 6) AS percent
    FROM d
    WHERE v IS NOT NULL
      AND lower(regexp_replace(v, '[^a-zA-Z0-9]', '', 'g')) IN ('none', 'null', 'nan', 'na', '')
    GROUP BY v
    UNION ALL
    SELECT 'nullish', 'null', count(*)::BIGINT, round(count(*) / (SELECT c FROM n), 6)
    FROM d WHERE v IS NULL
    """


def q_mixed_data_types_orders(spark, sf_dir):
    from deepchecks_spark.checks.integrity import MixedDataTypes

    df = _t(spark, sf_dir, "orders").selectExpr(
        "CASE WHEN o_orderkey % 10 < 3 THEN CAST(o_totalprice AS STRING) "
        "ELSE o_orderpriority END AS v"
    )
    ds = Dataset(df, infer_categorical=False)
    value, _ = MixedDataTypes().compute(_ctx(ds), "train")
    rows = [(c, round(float(info["strings"]), 6), round(float(info["numbers"]), 6))
            for c, info in sorted(value.items()) if info]
    return spark.createDataFrame(rows, "column string, strings_ratio double, numbers_ratio double")


def o_mixed_data_types_orders():
    return """
    WITH d AS (SELECT CASE WHEN o_orderkey % 10 < 3 THEN CAST(o_totalprice AS VARCHAR)
                           ELSE o_orderpriority END AS v FROM orders),
         s AS (SELECT count(*)::double nn,
                      sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END)::double nu
               FROM d WHERE v IS NOT NULL)
    SELECT 'v' AS column, round((nn - nu) / nn, 6) AS strings_ratio,
           round(nu / nn, 6) AS numbers_ratio
    FROM s
    """


def q_conflicting_labels_customer(spark, sf_dir):
    from deepchecks_spark.checks.integrity import ConflictingLabels

    df = _t(spark, sf_dir, "customer").selectExpr(
        "c_nationkey", "c_mktsegment",
        "CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS label")
    ds = Dataset(df, label="label", infer_categorical=False)
    value, _ = ConflictingLabels().compute(_ctx(ds), "train")
    return spark.createDataFrame([(round(float(value["percent"]), 6),)], "percent double")


def o_conflicting_labels_customer():
    return """
    WITH d AS (SELECT c_nationkey f1, c_mktsegment f2,
                      CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS lbl FROM customer),
         g AS (SELECT f1, f2, count(*) n, count(DISTINCT lbl) k FROM d GROUP BY f1, f2)
    SELECT round((SELECT coalesce(sum(n), 0) FROM g WHERE k > 1)
                 / (SELECT sum(n) FROM g)::double, 6) AS percent
    """


_VARIANT_CASE = (
    "CASE doc_id % 5 WHEN 0 THEN upper(lang) WHEN 1 THEN concat(lang, '!') ELSE lang END"
)


def q_string_mismatch_documents(spark, sf_dir):
    from deepchecks_spark.checks.integrity import StringMismatch

    df = _t(spark, sf_dir, "documents").selectExpr(f"{_VARIANT_CASE} AS v")
    ds = Dataset(df, infer_categorical=False)
    value, _ = StringMismatch().compute(_ctx(ds), "train")
    rows = []
    for col, bases in sorted(value["columns"].items()):
        for base, variants_list in sorted(bases.items()):
            for info in variants_list:
                rows.append((col, base, info["variant"], int(info["count"]),
                             round(float(info["percent"]), 6)))
    return spark.createDataFrame(
        rows, "column string, base string, variant string, count long, percent double")


def o_string_mismatch_documents():
    return f"""
    WITH d AS (SELECT {_VARIANT_CASE} AS v FROM documents),
         per AS (SELECT lower(regexp_replace(v, '[^a-zA-Z0-9]', '', 'g')) base, v, count(*) c
                 FROM d WHERE v IS NOT NULL GROUP BY 1, 2),
         k AS (SELECT base FROM per GROUP BY base HAVING count(*) > 1)
    SELECT 'v' AS column, per.base, per.v AS variant, c::BIGINT AS count,
           round(c / (SELECT count(*) FROM documents)::double, 6) AS percent
    FROM per JOIN k USING (base)
    """


_TEST_ONLY_VARIANT_CASE = (
    "CASE WHEN doc_id % 2 = 1 AND doc_id % 7 = 0 THEN upper(lang) ELSE lang END"
)


def q_string_mismatch_comparison_documents(spark, sf_dir):
    from deepchecks_spark.checks.traintest import StringMismatchComparison
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "documents").selectExpr("doc_id", f"{_TEST_ONLY_VARIANT_CASE} AS v")
    mk = lambda d: Dataset(d.drop("doc_id"), infer_categorical=False)  # noqa: E731
    ctx = Context(train=mk(df.filter(F.col("doc_id") % 2 == 0)),
                  test=mk(df.filter(F.col("doc_id") % 2 == 1)))
    value, _ = StringMismatchComparison().compute(ctx)
    rows = []
    for col, bases in sorted(value.items()):
        for base, info in sorted(bases.items()):
            for variant in sorted(info["variants_only_in_test"]):
                rows.append((col, base, variant))
    return spark.createDataFrame(rows, "column string, base string, variant string")


def o_string_mismatch_comparison_documents():
    return f"""
    WITH d AS (SELECT doc_id, {_TEST_ONLY_VARIANT_CASE} AS v FROM documents),
         tr AS (SELECT DISTINCT lower(regexp_replace(v, '[^a-zA-Z0-9]', '', 'g')) base, v
                FROM d WHERE doc_id % 2 = 0 AND v IS NOT NULL),
         te AS (SELECT DISTINCT lower(regexp_replace(v, '[^a-zA-Z0-9]', '', 'g')) base, v
                FROM d WHERE doc_id % 2 = 1 AND v IS NOT NULL)
    SELECT 'v' AS column, te.base, te.v AS variant
    FROM te
    WHERE te.base IN (SELECT base FROM tr)
      AND NOT EXISTS (SELECT 1 FROM tr WHERE tr.base = te.base AND tr.v = te.v)
    """


def q_feature_drift_orders(spark, sf_dir):
    from deepchecks_spark.checks.traintest import FeatureDrift
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority")
    mk = lambda d: Dataset(d.drop("o_orderkey"), cat_features=["o_orderpriority"],  # noqa: E731
                           infer_categorical=False)
    ctx = Context(train=mk(df.filter(F.col("o_orderkey") % 2 == 0)),
                  test=mk(df.filter(F.col("o_orderkey") % 2 == 1)))
    value, _ = FeatureDrift().compute(ctx)
    rows = [(c, info["Method"], round(float(info["Drift score"]), 6))
            for c, info in sorted(value.items())]
    return spark.createDataFrame(rows, "column string, method string, drift_score double")


def o_feature_drift_orders():
    ks = _ks_sql("orders", "o_totalprice", "o_orderkey", out_name="drift_score",
                 extra_select="'o_totalprice' AS column, 'Kolmogorov-Smirnov' AS method")
    cv = _cramers_sql("orders", "o_orderpriority", "o_orderkey", out_name="drift_score",
                      extra_select="'o_orderpriority' AS column, 'Cramer''s V' AS method")
    return f"SELECT * FROM ({ks}) UNION ALL SELECT * FROM ({cv})"


def q_label_drift_embeddings(spark, sf_dir):
    from deepchecks_spark.checks.traintest import LabelDrift
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "embeddings")
    train, test = _split_ds(df, "vec_id", label="label")
    value, _ = LabelDrift().compute(Context(train=train, test=test))
    return spark.createDataFrame([(value["Method"], round(float(value["Drift score"]), 6))],
                                 "method string, drift_score double")


def o_label_drift_embeddings():
    return _cramers_sql("embeddings", "label", "vec_id", out_name="drift_score",
                        extra_select="'Cramer''s V' AS method")


def q_identifier_label_correlation_events(spark, sf_dir):
    """A string-typed unique identifier hits ppscore's feature_is_id
    case (reference ppscore.py:288-295) ⇒ PPS exactly 0 — the oracle
    verifies uniqueness on the data and pins the case decision."""
    from deepchecks_spark.checks.ml import IdentifierLabelCorrelation

    df = _t(spark, sf_dir, "events").selectExpr(
        "cast(event_id as string) AS ident", "event_type")
    ds = Dataset(df, label="event_type", index_name="ident", infer_categorical=False)
    value, _ = IdentifierLabelCorrelation().compute(_ctx(ds), "train")
    rows = [(c, round(float(v), 6)) for c, v in sorted(value.items())]
    return spark.createDataFrame(rows, "identifier string, pps double")


def o_identifier_label_correlation_events():
    return """
    SELECT 'ident' AS identifier,
           CASE WHEN (SELECT count(DISTINCT event_id) = count(*) FROM events)
                THEN 0.0 ELSE -1.0 END AS pps
    """


def q_feature_label_corr_change_events(spark, sf_dir):
    """Provable PPS-change fixture over the even/odd split: cat_copy is
    an injective label recode on BOTH sides (1 → 1, diff 0); switch is
    the label recode on train but CONSTANT on test (1 → 0, diff 1);
    const_feat is constant on both (0 → 0). The oracle verifies each
    premise per split and emits the provable scores."""
    from deepchecks_spark.checks.ml import FeatureLabelCorrelationChange
    from deepchecks_spark.core.context import Context

    df = _t(spark, sf_dir, "events").selectExpr(
        "event_id",
        "concat('c_', event_type) AS cat_copy",
        "CASE WHEN event_id % 2 = 0 THEN concat('s_', event_type) ELSE 'z' END AS switch",
        "'k' AS const_feat",
        "event_type",
    )
    mk = lambda d: Dataset(d.drop("event_id"), label="event_type",  # noqa: E731
                           infer_categorical=False)
    ctx = Context(train=mk(df.filter(F.col("event_id") % 2 == 0)),
                  test=mk(df.filter(F.col("event_id") % 2 == 1)))
    value, _ = FeatureLabelCorrelationChange().compute(ctx)
    rows = [(f, round(float(value["train"][f]), 6), round(float(value["test"][f]), 6),
             round(float(value["train-test difference"][f]), 6))
            for f in sorted(value["train"])]
    return spark.createDataFrame(
        rows, "feature string, train_pps double, test_pps double, pps_diff double")


def o_feature_label_corr_change_events():
    return """
    WITH prem AS (SELECT
        (SELECT count(DISTINCT event_type) FROM events WHERE event_id % 2 = 0) >= 2 AS multi_tr,
        (SELECT count(DISTINCT event_type) FROM events WHERE event_id % 2 = 1) >= 2 AS multi_te)
    SELECT feature, train_pps, test_pps, train_pps - test_pps AS pps_diff FROM (
        SELECT 'cat_copy' AS feature,
               CASE WHEN multi_tr THEN 1.0 ELSE -1.0 END AS train_pps,
               CASE WHEN multi_te THEN 1.0 ELSE -1.0 END AS test_pps FROM prem
        UNION ALL SELECT 'const_feat',
               CASE WHEN multi_tr THEN 0.0 ELSE -1.0 END,
               CASE WHEN multi_te THEN 0.0 ELSE -1.0 END FROM prem
        UNION ALL SELECT 'switch',
               CASE WHEN multi_tr THEN 1.0 ELSE -1.0 END,
               CASE WHEN multi_te THEN 0.0 ELSE -1.0 END FROM prem
    )
    """


def q_columns_info_orders(spark, sf_dir):
    from deepchecks_spark.checks.integrity import ColumnsInfo

    df = _t(spark, sf_dir, "orders")
    ds = Dataset(df, label="o_orderstatus", datetime_name="o_orderdate",
                 cat_features=["o_orderpriority"], infer_categorical=False)
    value, _ = ColumnsInfo().compute(_ctx(ds), "train")
    rows = sorted(value.items())
    return spark.createDataFrame(rows, "column string, role string")


def o_columns_info_orders():
    # golden roles for the declared spec — validates the engine's
    # role-assignment logic (reference dataset.py:754-781)
    expected = [
        ("o_custkey", "numerical feature"),
        ("o_orderdate", "date"),
        ("o_orderkey", "numerical feature"),
        ("o_orderpriority", "categorical feature"),
        ("o_orderstatus", "label"),
        ("o_totalprice", "numerical feature"),
    ]
    return " UNION ALL ".join(
        f"SELECT '{c}' AS column, '{r}' AS role" for c, r in expected
    )


# ---------------------------------------------------------------------------
# quantified near-dup / ANN recall (VERDICT r1 next-6). MinHash recall is
# measured against a brute-force shingle-Jaccard golden; LSH top-k runs on
# a derived INTEGER-VALUED clustered fixture (10 planted clusters), so
# every dot product is exact in IEEE doubles on both engines and the
# brute-force oracle is rounding-proof. Both oracles assert recall = 1.0:
# if the approximate path misses a pair, the hash check goes red.
# ---------------------------------------------------------------------------

def q_minhash_recall_documents(spark, sf_dir):
    from deepchecks_spark.pipeline.dedup import (
        brute_force_jaccard_pairs,
        minhash_near_duplicates,
    )

    df = _t(spark, sf_dir, "documents")
    truth = brute_force_jaccard_pairs(df, "doc_id", "text", threshold=0.7)
    found = minhash_near_duplicates(df, "doc_id", "text", threshold=0.7, verify="shingles")
    n_true = truth.count()
    n_found_true = found.join(truth.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi").count()
    recall = n_found_true / n_true if n_true else 1.0
    return spark.createDataFrame(
        [(int(n_true), int(n_found_true), round(float(recall), 6))],
        "n_true long, n_found long, recall double",
    )


def o_minhash_recall_documents():
    # n_true from brute-force shingle-Jaccard; recall asserted 1.0 — the
    # Spark side honestly intersects its MinHash output with the truth
    # set, so any missed pair breaks the value-hash match.
    return """
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') t FROM documents),
         sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
                  list_distinct(list_transform(generate_series(1, len(t) - 2),
                                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [array_to_string(t, ' ')] END s FROM toks),
         truth AS (SELECT a.doc_id ia, b.doc_id ib
                   FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                   WHERE len(list_intersect(a.s, b.s))
                         / len(list_distinct(list_concat(a.s, b.s)))::double >= 0.7)
    SELECT count(*)::BIGINT AS n_true, count(*)::BIGINT AS n_found, 1.0 AS recall FROM truth
    """


_SPARK_CLUSTER_VEC = (
    "transform(sequence(0, 15), d -> CAST((CASE WHEN d = CAST(vec_id % 10 AS INT) "
    "THEN 40 ELSE 2 END) + ((vec_id * 7 + d * 13) % 5) - 2 AS DOUBLE))"
)
_DUCK_CLUSTER_VEC = (
    "list_transform(generate_series(0, 15), d -> ((CASE WHEN d = vec_id % 10 "
    "THEN 40 ELSE 2 END) + ((vec_id * 7 + d * 13) % 5) - 2)::DOUBLE)"
)


def q_lsh_topk_clustered_embeddings(spark, sf_dir):
    from deepchecks_spark.pipeline.similarity import lsh_topk

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_SPARK_CLUSTER_VEC} AS embedding")
    queries = df.filter(F.col("vec_id") < 20)
    return lsh_topk(queries, df, dim=16, k=5, n_planes=8, n_tables=8,
                    id_col="vec_id").select("query_id", "neighbor_id", "rank")


def o_lsh_topk_clustered_embeddings():
    # exact brute-force top-5 over the same derived clustered vectors —
    # the LSH result must equal it exactly (recall@5 = 1.0 on clustered
    # data), deterministic because all dot products are integer-exact
    return f"""
    WITH v AS (SELECT vec_id, {_DUCK_CLUSTER_VEC} e FROM embeddings),
         q AS (SELECT vec_id qid, e FROM v WHERE vec_id < 20),
         sims AS (SELECT q.qid, c.vec_id nid, list_cosine_similarity(q.e, c.e) s
                  FROM q CROSS JOIN v c WHERE q.qid != c.vec_id),
         ranked AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid ASC) r
                    FROM sims)
    SELECT qid::BIGINT AS query_id, nid::BIGINT AS neighbor_id, r::BIGINT AS rank
    FROM ranked WHERE r <= 5
    """


def q_streaming_psi_events(spark, sf_dir):
    """Structured Streaming in the correctness gate: daily event-time
    windows of event_type (watermarked), PSI per window against the
    even-key reference histogram, drained synchronously; the final
    streaming scores must equal the batch SQL oracle per window."""
    from deepchecks_spark.drift.spark import categorical_histograms
    from deepchecks_spark.streaming import StreamingPsiMonitor

    import os

    batch = _t(spark, sf_dir, "events")
    ref = categorical_histograms(
        batch.filter(F.col("event_id") % 2 == 0), ["event_type"])["event_type"]
    mon = StreamingPsiMonitor(ref)
    # the sf tables are single parquet FILES; the streaming file source
    # needs a directory → stage a multi-file copy once (deterministic)
    import hashlib

    stage_dir = "/tmp/spark_graft_stream/events_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        batch.repartition(8).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage_dir)
        # watermarks need TIMESTAMP (tz-aware); parquet stores NTZ —
        # session TZ is pinned UTC so the cast is value-preserving
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    # staged files replay in arbitrary time order, so the lateness bound
    # must cover the whole corpus span (30 days) or early windows would
    # be evicted mid-replay; a live pipeline with in-order arrival would
    # use hours here
    q = mon.start(stream, "event_type", time_col="ts",
                  window_duration="1 day", watermark="40 days")
    q.processAllAvailable()
    q.stop()
    rows = [
        (start.strftime("%Y-%m-%d"), round(float(v["psi"]), 6), int(v["n"]))
        for start, v in sorted(mon.scores.items())
    ]
    return spark.createDataFrame(rows, "window_start string, psi double, n long")


def o_streaming_psi_events():
    # batch twin of the streaming windows: daily histograms vs the
    # even-key reference, PSI with the 0.01 floor. All 5 event types are
    # ≥1% on both sides in every window, so the Other roll-up never
    # triggers and the plain floor formula is exact.
    return """
    WITH ref AS (SELECT event_type v, count(*)::double n FROM events
                 WHERE event_id % 2 = 0 AND event_type IS NOT NULL GROUP BY v),
         h AS (SELECT date_trunc('day', ts) w, event_type v, count(*)::double n
               FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
         wins AS (SELECT DISTINCT w FROM h),
         cats AS (SELECT DISTINCT v FROM ref),
         grid AS (SELECT w, v FROM wins CROSS JOIN cats),
         cells AS (SELECT g.w, g.v, coalesce(ref.n, 0) rn, coalesce(h.n, 0) hn
                   FROM grid g LEFT JOIN ref ON ref.v = g.v
                   LEFT JOIN h ON h.w = g.w AND h.v = g.v),
         tots AS (SELECT w, sum(rn) rt, sum(hn) ht FROM cells GROUP BY w)
    SELECT strftime(c.w, '%Y-%m-%d') AS window_start,
           round(sum((greatest(rn / t.rt, 0.01) - greatest(hn / t.ht, 0.01))
                     * ln(greatest(rn / t.rt, 0.01) / greatest(hn / t.ht, 0.01))), 6) AS psi,
           cast(sum(hn) AS BIGINT) AS n
    FROM cells c JOIN tots t ON c.w = t.w
    GROUP BY c.w
    """


def q_multimodal_features_documents(spark, sf_dir):
    """Multimodal plumbing in the correctness gate: documents.text cast to
    an opaque binary payload, typed metadata JVM-side, and the
    deterministic fake decode→feature-extract through the REAL
    mapInPandas Arrow path. The fake features are sha256-derived, which
    DuckDB reproduces exactly — so the whole binary-column pipeline
    (schema, batching, null propagation) is oracle-verified."""
    from deepchecks_spark.pipeline.multimodal import decode_features, with_media_metadata

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "CAST(text AS BINARY) AS payload")
    df = with_media_metadata(df, "payload")
    df = decode_features(df, "payload", decoder="fake")
    return df.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.magic").alias("magic"),
        F.round(F.col("features")[0], 6).alias("f0"),
        F.round(F.col("features")[7], 6).alias("f7"),
    )


def o_multimodal_features_documents():
    # fake feature i = little-endian uint32 of sha256(payload) bytes
    # [4i..4i+3] / 2^32; DuckDB's sha256(VARCHAR) hashes the utf-8 bytes,
    # identical to the payload (CAST(text AS BINARY) is utf-8)
    def feat(i):
        terms = " + ".join(
            f"CAST(concat('0x', substr(h, {8 * i + 2 * j + 1}, 2)) AS BIGINT) * {256 ** j}"
            for j in range(4)
        )
        return f"round(({terms}) / 4294967296.0, 6)"

    return f"""
    WITH d AS (SELECT doc_id, text, sha256(text) AS h FROM documents)
    SELECT doc_id,
           octet_length(text::BLOB)::BIGINT AS n_bytes,
           substr(hex(text::BLOB), 1, 8) AS magic,
           {feat(0)} AS f0,
           {feat(7)} AS f7
    FROM d
    """


def q_referential_integrity_orders(spark, sf_dir):
    """Referential check over the TPC-H FK pair orders.o_custkey →
    customer.c_custkey, with planted orphans (every 100th order key is
    shifted out of range) so the anti-join path is exercised
    non-vacuously. The oracle is the plain SQL NOT-IN twin."""
    from deepchecks_spark.checks.traintest import ReferentialIntegrity
    from deepchecks_spark.core.context import Context

    fact = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CASE WHEN o_orderkey % 100 = 0 THEN o_custkey + 100000000 "
        "ELSE o_custkey END AS o_custkey",
    )
    dim = _t(spark, sf_dir, "customer")
    ds_fact = Dataset(fact, infer_categorical=False)
    ds_dim = Dataset(dim, infer_categorical=False)
    check = ReferentialIntegrity(column="o_custkey", dim_column="c_custkey")
    value, _ = check.compute(
        Context(train=ds_fact, test=ds_dim, require_same_schema=False))
    return spark.createDataFrame(
        [(int(value["n_rows"]), int(value["n_orphans"]),
          round(float(value["orphan_ratio"]), 6),
          int(value["sample_orphans"][0]) if value["sample_orphans"] else -1)],
        "n_rows long, n_orphans long, orphan_ratio double, first_orphan long",
    )


def o_referential_integrity_orders():
    return """
    WITH f AS (SELECT CASE WHEN o_orderkey % 100 = 0 THEN o_custkey + 100000000
                           ELSE o_custkey END AS k FROM orders),
         orph AS (SELECT k FROM f WHERE k IS NOT NULL
                  AND k NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
    SELECT (SELECT count(*) FROM orders)::BIGINT AS n_rows,
           (SELECT count(*) FROM orph)::BIGINT AS n_orphans,
           round((SELECT count(*) FROM orph) / (SELECT count(*) FROM orders)::DOUBLE, 6)
               AS orphan_ratio,
           (SELECT min(k) FROM orph)::BIGINT AS first_orphan
    """


def q_performance_embeddings(spark, sf_dir):
    """Predictions-column performance: plant a deterministic 10%
    mislabeling (every 10th vector predicts the next class, mod the
    class count) and score accuracy + weighted F1 from the distributed
    confusion matrix; the oracle recomputes both from the same joint
    counts in SQL."""
    from deepchecks_spark.checks.performance import SingleDatasetPerformance

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "label",
        "CASE WHEN vec_id % 10 = 0 THEN CAST((label + 1) % 10 AS INT) "
        "ELSE label END AS pred",
    )
    ds = Dataset(df, label="label", infer_categorical=False)
    value, _ = SingleDatasetPerformance("pred").compute(_ctx(ds), "train")
    return spark.createDataFrame(
        [(round(float(value["accuracy"]), 6), round(float(value["f1_weighted"]), 6))],
        "accuracy double, f1_weighted double",
    )


def o_performance_embeddings():
    return """
    WITH d AS (SELECT label AS y,
                      CASE WHEN vec_id % 10 = 0 THEN CAST((label + 1) % 10 AS INT)
                           ELSE label END AS p
               FROM embeddings WHERE label IS NOT NULL),
         cells AS (SELECT y, p, count(*) AS n FROM d GROUP BY 1, 2),
         classes AS (SELECT DISTINCT y AS c FROM d UNION SELECT DISTINCT p FROM d),
         stats AS (SELECT c,
                          coalesce((SELECT sum(n) FROM cells WHERE y = c AND p = c), 0) AS tp,
                          coalesce((SELECT sum(n) FROM cells WHERE p = c), 0) AS pred_n,
                          coalesce((SELECT sum(n) FROM cells WHERE y = c), 0) AS true_n
                   FROM classes),
         f1 AS (SELECT c, true_n,
                       CASE WHEN tp = 0 OR pred_n = 0 OR true_n = 0 THEN 0.0
                            ELSE 2.0 * (tp / pred_n) * (tp / true_n)
                                 / ((tp / pred_n) + (tp / true_n)) END AS f
                FROM stats)
    SELECT round((SELECT sum(CASE WHEN y = p THEN n ELSE 0 END)::DOUBLE / sum(n) FROM cells), 6)
               AS accuracy,
           round((SELECT sum(f * true_n) / sum(true_n) FROM f1), 6) AS f1_weighted
    """


def q_streaming_dedup_events(spark, sf_dir):
    """Second streaming contract row (VERDICT r2 next-7): within-
    watermark duplicate detection per daily event-time window. The key
    contains the window day, so the drained streaming counts equal the
    batch GROUP BY regardless of file-replay order."""
    import hashlib
    import os

    from deepchecks_spark.streaming import StreamingDedupMonitor

    batch = _t(spark, sf_dir, "events")
    stage_dir = "/tmp/spark_graft_stream/events_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        batch.repartition(8).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    mon = StreamingDedupMonitor()
    q = mon.start(stream, ["user_id", "event_type"], time_col="ts",
                  window_duration="1 day", watermark="40 days")
    q.processAllAvailable()
    q.stop()
    rows = [
        (start.strftime("%Y-%m-%d"), v["n"], v["n_distinct"], v["n_dup"])
        for start, v in sorted(mon.counts.items())
    ]
    return spark.createDataFrame(
        rows, "window_start string, n_rows long, n_distinct long, n_dup long")


def o_streaming_dedup_events():
    return """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
           count(*)::BIGINT AS n_rows,
           count(DISTINCT (user_id, event_type))::BIGINT AS n_distinct,
           (count(*) - count(DISTINCT (user_id, event_type)))::BIGINT AS n_dup
    FROM events GROUP BY 1
    """


def q_streaming_constraints_events(spark, sf_dir):
    """Streaming Deequ-style contract monitoring
    (streaming.py::StreamingConstraintsMonitor): per daily event-time
    window, violation counts for a not_null + in_range contract from
    the windowed streaming aggregation — the window key makes the
    drained counts equal the batch GROUP BY regardless of file-replay
    order (the streaming_dedup convention)."""
    import hashlib
    import os

    from deepchecks_spark.checks.constraints import in_range, not_null
    from deepchecks_spark.streaming import StreamingConstraintsMonitor

    batch = _t(spark, sf_dir, "events")
    stage_dir = ("/tmp/spark_graft_stream/events_"
                 + hashlib.md5(sf_dir.encode()).hexdigest()[:8])
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        batch.repartition(8).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    mon = StreamingConstraintsMonitor(
        [not_null("props"), in_range("value", 0.0, 50.0)])
    q = mon.start(stream, time_col="ts", window_duration="1 day",
                  watermark="40 days")
    q.processAllAvailable()
    q.stop()
    rows = [
        (start.strftime("%Y-%m-%d"), v["n"],
         v["violations"]["not_null(props)"],
         v["violations"]["in_range[0.0, 50.0](value)"])
        for start, v in sorted(mon.counts.items())
    ]
    return spark.createDataFrame(
        rows, "window_start string, n_rows long, n_null_props long, "
              "n_value_oob long")


def o_streaming_constraints_events():
    return """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
           count(*)::BIGINT AS n_rows,
           sum((props IS NULL)::INT)::BIGINT AS n_null_props,
           sum((value IS NOT NULL AND (value < 0.0 OR value > 50.0))::INT)::BIGINT
             AS n_value_oob
    FROM events GROUP BY 1 ORDER BY 1
    """


def q_dedup_clusters_documents(spark, sf_dir):
    """Connected-components dedup clustering: CHAIN pairs only —
    (id, id+1) within each 4-id group, plus a bridge to the next group
    for every 5th group — so the transitive closure (4- and 8-element
    clusters) is only reachable through min-label propagation, never
    from any single pair. The oracle computes each id's component
    arithmetically: comp = 4·(g − 1{g mod 5 = 1}), g = id div 4."""
    from deepchecks_spark.pipeline.dedup import connected_components

    ids = _t(spark, sf_dir, "documents").select("doc_id").filter("doc_id < 480")
    pairs = ids.filter(
        "doc_id < 479 AND (doc_id % 4 < 3 OR (doc_id % 4 = 3 AND (doc_id div 4) % 5 = 0))"
    ).selectExpr("doc_id AS id_a", "doc_id + 1 AS id_b")
    comps = connected_components(pairs)
    return comps.selectExpr("id AS doc_id", "component")


def o_dedup_clusters_documents():
    return """
    SELECT doc_id,
           (4 * ((doc_id // 4) - CASE WHEN (doc_id // 4) % 5 = 1 THEN 1 ELSE 0 END))::BIGINT
               AS component
    FROM documents WHERE doc_id < 480
    """


def q_streaming_newcat_events(spark, sf_dir):
    """Third streaming contract row: continuous new-category detection —
    the reference value set is every event_type except the
    lexicographically-last one, so that type's rows count as "new" per
    daily window; the drained streaming counts must equal the batch SQL
    twin regardless of file-replay order (absolute update-mode counts,
    idempotent fold)."""
    import hashlib
    import os

    from deepchecks_spark.streaming import StreamingNewCategoryMonitor

    batch = _t(spark, sf_dir, "events")
    types = sorted(r["event_type"] for r in
                   batch.select("event_type").distinct().collect()
                   if r["event_type"] is not None)
    mon = StreamingNewCategoryMonitor({"event_type": types[:-1]})
    stage_dir = "/tmp/spark_graft_stream/events_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        batch.repartition(8).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = mon.start(stream, ["event_type"], time_col="ts",
                  window_duration="1 day", watermark="40 days")
    q.processAllAvailable()
    q.stop()
    rows = [
        (start.strftime("%Y-%m-%d"), v["event_type"]["n_new"], v["event_type"]["n_rows"])
        for start, v in sorted(mon.counts.items())
    ]
    return spark.createDataFrame(rows, "window_start string, n_new long, n_rows long")


def o_streaming_newcat_events():
    return """
    WITH last_t AS (SELECT max(event_type) AS t FROM events)
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
           sum(CASE WHEN event_type = (SELECT t FROM last_t) THEN 1 ELSE 0 END)::BIGINT AS n_new,
           count(event_type)::BIGINT AS n_rows
    FROM events GROUP BY 1
    """


def q_streaming_performance_events(spark, sf_dir):
    """Fourth streaming contract row: continuous model-performance
    monitoring — label/prediction columns derived from event_id (every
    5th prediction flipped to the next class mod 3), daily windows; the
    drained per-window accuracy and macro-F1 must equal the batch
    confusion arithmetic recomputed in SQL, regardless of file-replay
    order (absolute update-mode cells, idempotent fold)."""
    import hashlib
    import os

    from deepchecks_spark.streaming import StreamingPerformanceMonitor

    batch = _t(spark, sf_dir, "events")
    stage_dir = "/tmp/spark_graft_stream/events_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        batch.repartition(8).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .selectExpr(
            "ts",
            "CAST(event_id % 3 AS INT) AS lbl",
            "CAST(CASE WHEN event_id % 5 = 0 THEN (event_id + 1) % 3 "
            "ELSE event_id % 3 END AS INT) AS pred",
        )
    )
    mon = StreamingPerformanceMonitor("lbl", "pred")
    q = mon.start(stream, time_col="ts", window_duration="1 day",
                  watermark="40 days")
    q.processAllAvailable()
    q.stop()
    rows = [
        (start.strftime("%Y-%m-%d"), round(float(v["accuracy"]), 6),
         round(float(v["macro_f1"]), 6), int(v["n"]))
        for start, v in sorted(mon.scores.items())
    ]
    return spark.createDataFrame(
        rows, "window_start string, accuracy double, macro_f1 double, n long")


def o_streaming_performance_events():
    return """
    WITH d AS (SELECT date_trunc('day', ts) w,
                      (event_id % 3) y,
                      CASE WHEN event_id % 5 = 0 THEN (event_id + 1) % 3
                           ELSE event_id % 3 END p
               FROM events),
         cells AS (SELECT w, y, p, count(*) n FROM d GROUP BY 1, 2, 3),
         cls AS (SELECT DISTINCT w, y AS c FROM d
                 UNION SELECT DISTINCT w, p FROM d),
         st AS (SELECT cls.w, cls.c,
                       coalesce(sum(CASE WHEN ce.y = cls.c AND ce.p = cls.c THEN ce.n END), 0) tp,
                       coalesce(sum(CASE WHEN ce.p = cls.c THEN ce.n END), 0) pn,
                       coalesce(sum(CASE WHEN ce.y = cls.c THEN ce.n END), 0) tn
                FROM cls LEFT JOIN cells ce ON ce.w = cls.w GROUP BY 1, 2),
         f1 AS (SELECT w, avg(CASE WHEN tp = 0 OR pn = 0 OR tn = 0 THEN 0.0
                                   ELSE 2.0 * (tp / pn) * (tp / tn)
                                        / ((tp / pn) + (tp / tn)) END) macro_f1
                FROM st GROUP BY w),
         acc AS (SELECT w, sum(CASE WHEN y = p THEN n ELSE 0 END)::DOUBLE
                            / sum(n) a,
                        sum(n) nt
                 FROM cells GROUP BY w)
    SELECT strftime(acc.w, '%Y-%m-%d') AS window_start,
           round(a, 6) AS accuracy, round(macro_f1, 6) AS macro_f1,
           nt::BIGINT AS n
    FROM acc JOIN f1 ON acc.w = f1.w
    """


def q_multimodal_dims_documents(spark, sf_dir):
    """REAL header parsing in the correctness gate (VERDICT r2 next-6):
    valid PNG / GIF / JPEG header bytes are constructed in Spark SQL
    from doc_id arithmetic (unhex of the spec'd magic + dimension
    fields, including a JPEG APP0 segment the SOF scan must skip), then
    parsed back by the stdlib-struct parser through the Arrow
    mapInPandas path. The oracle recomputes the planted dimensions
    arithmetically — a parser endianness/offset bug goes red."""
    from deepchecks_spark.pipeline.multimodal import with_media_dimensions

    w = "16 + doc_id % 800"
    h = "16 + (doc_id * 7) % 600"
    payload = f"""
    CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN unhex(concat('89504E470D0A1A0A', '0000000D', '49484452',
                               lpad(hex({w}), 8, '0'), lpad(hex({h}), 8, '0'),
                               '0806000000'))
      WHEN 1 THEN unhex(concat('474946383961',
                               lpad(hex(({w}) % 256), 2, '0'),
                               lpad(hex(CAST(({w}) / 256 AS INT)), 2, '0'),
                               lpad(hex(({h}) % 256), 2, '0'),
                               lpad(hex(CAST(({h}) / 256 AS INT)), 2, '0'),
                               'F70000'))
      ELSE unhex(concat('FFD8', 'FFE000104A46494600010100000100010000',
                        'FFC00011', '08',
                        lpad(hex({h}), 4, '0'), lpad(hex({w}), 4, '0'), '03'))
    END
    """
    df = _t(spark, sf_dir, "documents").selectExpr("doc_id", f"{payload} AS payload")
    return with_media_dimensions(df, "payload").select(
        "doc_id", "media_width", "media_height", "media_format")


def o_multimodal_dims_documents():
    return """
    SELECT doc_id,
           (16 + doc_id % 800)::INT AS media_width,
           (16 + (doc_id * 7) % 600)::INT AS media_height,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                ELSE 'jpeg' END AS media_format
    FROM documents
    """


def q_confusion_matrix_embeddings(spark, sf_dir):
    """ConfusionMatrixReport from a predictions column: every 7th vector
    predicts (label+2) mod 10, so exactly one off-diagonal band per class
    is populated. The full n_classes² matrix (zeros included) is
    flattened to (y, p, n) rows; the oracle rebuilds it from a classes
    grid LEFT JOINed to the joint counts."""
    from deepchecks_spark.checks.performance import ConfusionMatrixReport

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "label",
        "CASE WHEN vec_id % 7 = 0 THEN CAST((label + 2) % 10 AS INT) "
        "ELSE label END AS pred",
    )
    ds = Dataset(df, label="label", infer_categorical=False)
    value, _ = ConfusionMatrixReport("pred").compute(_ctx(ds), "train")
    classes, matrix = value["classes"], value["matrix"]
    rows = [(int(classes[i]), int(classes[j]), int(matrix[i][j]))
            for i in range(len(classes)) for j in range(len(classes))]
    return spark.createDataFrame(rows, "y int, p int, n long")


def o_confusion_matrix_embeddings():
    return """
    WITH d AS (SELECT label AS y,
                      CASE WHEN vec_id % 7 = 0 THEN CAST((label + 2) % 10 AS INT)
                           ELSE label END AS p
               FROM embeddings WHERE label IS NOT NULL),
         cells AS (SELECT y, p, count(*) AS n FROM d GROUP BY 1, 2),
         classes AS (SELECT DISTINCT y AS c FROM d UNION SELECT DISTINCT p FROM d)
    SELECT a.c AS y, b.c AS p, coalesce(ce.n, 0)::BIGINT AS n
    FROM classes a CROSS JOIN classes b
    LEFT JOIN cells ce ON ce.y = a.c AND ce.p = b.c
    """


def q_train_test_performance_embeddings(spark, sf_dir):
    """TrainTestPerformance from predictions columns: parity split, every
    5th vector mispredicts (+1 mod 10) — the union-tagged single
    groupBy computes both confusion matrices in one job; accuracy and
    weighted F1 per side must match the SQL recomputation."""
    from deepchecks_spark.checks.performance import TrainTestPerformance
    from deepchecks_spark.core.context import Context

    base = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label",
        "CASE WHEN vec_id % 5 = 0 THEN CAST((label + 1) % 10 AS INT) "
        "ELSE label END AS pred",
    )
    train = Dataset(base.filter("vec_id % 2 = 0").drop("vec_id"),
                    label="label", infer_categorical=False)
    test = Dataset(base.filter("vec_id % 2 = 1").drop("vec_id"),
                   label="label", infer_categorical=False)
    check = TrainTestPerformance("pred", scorers=["accuracy", "f1_weighted"])
    value, _ = check.compute(Context(train=train, test=test))
    rows = [(r["Dataset"], r["Metric"], round(float(r["Value"]), 6),
             int(r["Number of samples"])) for r in value]
    return spark.createDataFrame(rows, "dataset string, metric string, value double, n long")


def o_train_test_performance_embeddings():
    return """
    WITH d AS (SELECT CASE WHEN vec_id % 2 = 0 THEN 'Train' ELSE 'Test' END AS ds,
                      label AS y,
                      CASE WHEN vec_id % 5 = 0 THEN CAST((label + 1) % 10 AS INT)
                           ELSE label END AS p
               FROM embeddings WHERE label IS NOT NULL),
         cells AS (SELECT ds, y, p, count(*) AS n FROM d GROUP BY 1, 2, 3),
         classes AS (SELECT DISTINCT ds, y AS c FROM d
                     UNION SELECT DISTINCT ds, p FROM d),
         stats AS (SELECT cl.ds, cl.c,
                          coalesce(sum(CASE WHEN ce.y = cl.c AND ce.p = cl.c THEN ce.n END), 0) AS tp,
                          coalesce(sum(CASE WHEN ce.p = cl.c THEN ce.n END), 0) AS pred_n,
                          coalesce(sum(CASE WHEN ce.y = cl.c THEN ce.n END), 0) AS true_n
                   FROM classes cl LEFT JOIN cells ce ON ce.ds = cl.ds
                   GROUP BY 1, 2),
         f1 AS (SELECT ds, c, true_n,
                       CASE WHEN tp = 0 OR pred_n = 0 OR true_n = 0 THEN 0.0
                            ELSE 2.0 * (tp / pred_n) * (tp / true_n)
                                 / ((tp / pred_n) + (tp / true_n)) END AS f
                FROM stats),
         acc AS (SELECT ds, sum(CASE WHEN y = p THEN n ELSE 0 END)::DOUBLE / sum(n) AS v,
                        sum(n)::BIGINT AS nt FROM cells GROUP BY ds),
         fw AS (SELECT ds, sum(f * true_n) / sum(true_n) AS v FROM f1 GROUP BY ds)
    SELECT acc.ds AS dataset, 'accuracy' AS metric, round(acc.v, 6) AS value, acc.nt AS n
    FROM acc
    UNION ALL
    SELECT fw.ds, 'f1_weighted', round(fw.v, 6), acc.nt
    FROM fw JOIN acc ON acc.ds = fw.ds
    """


def q_regression_performance_lineitem(spark, sf_dir):
    """Regression scorers from ONE distributive agg: label = l_quantity
    (integer-valued), pred = quantity + (l_orderkey % 7 − 3). All sums
    are integer-exact in doubles, so MAE/MSE/RMSE/R² are bit-identical
    across engines when the oracle uses the same sum formulas
    (ss_tot = Σy² − (Σy)²/n)."""
    from deepchecks_spark.checks.performance import SingleDatasetPerformance

    df = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_quantity AS y",
        "l_quantity + CAST(l_orderkey % 7 AS DOUBLE) - 3.0 AS pred",
    )
    ds = Dataset(df, label="y", infer_categorical=False)
    check = SingleDatasetPerformance("pred", scorers=["mae", "mse", "rmse", "r2"])
    value, _ = check.compute(_ctx(ds), "train")
    return spark.createDataFrame(
        [(round(value["mae"], 6), round(value["mse"], 6),
          round(value["rmse"], 6), round(value["r2"], 6))],
        "mae double, mse double, rmse double, r2 double",
    )


def o_regression_performance_lineitem():
    return """
    WITH d AS (SELECT l_quantity AS y,
                      (l_orderkey % 7)::DOUBLE - 3.0 AS r
               FROM lineitem WHERE l_quantity IS NOT NULL),
         s AS (SELECT count(*)::DOUBLE AS n, sum(abs(r)) AS sum_abs,
                      sum(r * r) AS sum_sq, sum(y) AS sum_y, sum(y * y) AS sum_yy
               FROM d)
    SELECT round(sum_abs / n, 6) AS mae,
           round(sum_sq / n, 6) AS mse,
           round(sqrt(sum_sq / n), 6) AS rmse,
           round(1.0 - sum_sq / (sum_yy - sum_y * sum_y / n), 6) AS r2
    FROM s
    """


# mid-similarity planted fixture for LSH auto-tuning: even id 2k carries
# an integer LCG vector u(k); odd 2k+1 carries u(k)+g(k) where g is the
# pairwise rotation (u1,−u0,u3,−u2,…) — exactly orthogonal with |g|=|u|,
# so cos(u, u+g) = 1/√2 ≈ 0.7071 by construction (integer-exact in both
# engines); unrelated vectors sit near cosine 0 in 16 dims.
_U = "((1103515245 * (({k}) * 31 + {d}) + 12345) % 33) - 16"


def _midsim_vec_spark():
    k = "(vec_id div 2)"
    u = _U.format(k=k, d="d")
    u_next = _U.format(k=k, d="(d + 1)")
    u_prev = _U.format(k=k, d="(d - 1)")
    return (
        "transform(sequence(0, 15), d -> CAST(CASE WHEN vec_id % 2 = 0 THEN " + u +
        " ELSE " + u + " + (CASE WHEN d % 2 = 0 THEN " + u_next +
        " ELSE -(" + u_prev + ") END) END AS DOUBLE))"
    )


def _midsim_vec_duck():
    k = "(vec_id // 2)"
    # DuckDB list indices are 1-based; generate d = 0..15 directly
    u = _U.format(k=k, d="d")
    u_next = _U.format(k=k, d="(d + 1)")
    u_prev = _U.format(k=k, d="(d - 1)")
    return (
        "list_transform(generate_series(0, 15), d -> (CASE WHEN vec_id % 2 = 0 THEN " + u +
        " ELSE " + u + " + (CASE WHEN d % 2 = 0 THEN " + u_next +
        " ELSE -(" + u_prev + ") END) END)::DOUBLE)"
    )


def q_lsh_autotune_recall_embeddings(spark, sf_dir):
    """LSH auto-tuning (ROADMAP #8): on the planted mid-similarity
    corpus (pairs at cosine 1/√2), autotune_lsh_params picks
    (n_planes, n_tables) from the closed-form collision model + a
    sampled background-similarity histogram; the OR-amplified
    near-duplicate join must then recover ≥ the target recall of the
    brute-force truth set. The oracle recomputes the truth count
    exactly and pins recall_ge_target TRUE — a mistuned configuration
    (recall < 0.95) breaks the value-hash."""
    from deepchecks_spark.pipeline.similarity import (
        autotune_lsh_params,
        embedding_near_duplicates,
    )

    df = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 2000).selectExpr(
        "vec_id", f"{_midsim_vec_spark()} AS embedding")
    params = autotune_lsh_params(df, threshold=0.65, target_recall=0.95,
                                 max_planes=16, max_tables=32,
                                 id_col="vec_id", vec_col="embedding")
    found = embedding_near_duplicates(
        df, dim=16, threshold=0.65, n_planes=params["n_planes"],
        n_tables=params["n_tables"], id_col="vec_id", vec_col="embedding",
    ).select("id_a", "id_b")
    # brute-force truth over the same derived vectors (exact integer dots)
    v = df.selectExpr("vec_id AS id", "embedding AS v")
    a, b = v.alias("a"), v.alias("b")
    truth = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "cos",
            F.aggregate(F.zip_with("a.v", "b.v", lambda x, y: x * y),
                        F.lit(0.0), lambda acc, x: acc + x)
            / (F.sqrt(F.aggregate(F.transform("a.v", lambda x: x * x),
                                  F.lit(0.0), lambda acc, x: acc + x))
               * F.sqrt(F.aggregate(F.transform("b.v", lambda x: x * x),
                                    F.lit(0.0), lambda acc, x: acc + x))),
        )
        .filter(F.col("cos") >= 0.65)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    n_true = truth.count()
    n_hit = found.join(truth, ["id_a", "id_b"], "left_semi").count()
    recall = n_hit / n_true if n_true else 1.0
    return spark.createDataFrame(
        [(int(n_true), bool(recall >= 0.95), bool(params["expected_recall"] >= 0.95))],
        "n_true long, recall_ge_target boolean, model_feasible boolean",
    )


def o_lsh_autotune_recall_embeddings():
    return f"""
    WITH v AS (SELECT vec_id AS id, {_midsim_vec_duck()} AS e
               FROM embeddings WHERE vec_id < 2000),
         truth AS (SELECT a.id ia, b.id ib
                   FROM v a JOIN v b ON a.id < b.id
                   WHERE list_cosine_similarity(a.e, b.e) >= 0.65)
    SELECT count(*)::BIGINT AS n_true, TRUE AS recall_ge_target, TRUE AS model_feasible
    FROM truth
    """


def q_roc_auc_embeddings(spark, sf_dir):
    """RocReport from a probability column: integer scores (heavy ties
    across both classes) divided by a common constant — the engine's
    tie-corrected Mann-Whitney over the distributed score histogram must
    equal the SQL window-cumulative computation exactly (integer U
    arithmetic is IEEE-exact in doubles)."""
    from deepchecks_spark.checks.performance import RocReport

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "CAST(label % 2 AS INT) AS y",
        "(CASE WHEN label % 2 = 1 THEN (vec_id * 37) % 1000 + 300 "
        "ELSE (vec_id * 41) % 1000 END) / 1300.0 AS p",
    )
    ds = Dataset(df, label="y", infer_categorical=False)
    value, _ = RocReport({1: "p"}).compute(_ctx(ds), "train")
    return spark.createDataFrame([(round(float(value[1]), 6),)], "auc double")


def o_roc_auc_embeddings():
    return """
    WITH d AS (SELECT label % 2 AS y,
                      CASE WHEN label % 2 = 1 THEN (vec_id * 37) % 1000 + 300
                           ELSE (vec_id * 41) % 1000 END AS s
               FROM embeddings WHERE label IS NOT NULL),
         g AS (SELECT s, sum(y)::BIGINT AS np, (count(*) - sum(y))::BIGINT AS nn
               FROM d GROUP BY s),
         o AS (SELECT s, np, nn,
                      coalesce(sum(nn) OVER (ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
               FROM g)
    SELECT round(sum(np * (cum_nn + 0.5 * nn))
                 / ((SELECT sum(np) FROM g)::DOUBLE * (SELECT sum(nn) FROM g)), 6) AS auc
    FROM o
    """


def q_calibration_embeddings(spark, sf_dir):
    """CalibrationScore from probability columns: p is a multiple of
    2^-10, so (p − y)² is an exact multiple of 2^-20 and the Brier mean
    is bit-identical across engines. Binary labels → the reference's
    {0: brier of the positive class} shape."""
    from deepchecks_spark.checks.performance import CalibrationScore

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "CAST(label % 2 AS INT) AS y",
        "(CASE WHEN label % 2 = 1 THEN 512 + (vec_id * 13) % 512 "
        "ELSE (vec_id * 13) % 512 END) / 1024.0 AS p1",
        "1.0 - (CASE WHEN label % 2 = 1 THEN 512 + (vec_id * 13) % 512 "
        "ELSE (vec_id * 13) % 512 END) / 1024.0 AS p0",
    )
    ds = Dataset(df, label="y", infer_categorical=False)
    value, _ = CalibrationScore({0: "p0", 1: "p1"}).compute(_ctx(ds), "train")
    return spark.createDataFrame([(round(float(value[0]), 6),)], "brier double")


def o_calibration_embeddings():
    return """
    WITH d AS (SELECT label % 2 AS y,
                      (CASE WHEN label % 2 = 1 THEN 512 + (vec_id * 13) % 512
                            ELSE (vec_id * 13) % 512 END) / 1024.0 AS p1
               FROM embeddings WHERE label IS NOT NULL)
    SELECT round(avg(pow(p1 - y, 2)), 6) AS brier FROM d
    """


def q_regression_error_dist_lineitem(spark, sf_dir):
    """RegressionErrorDistribution from ONE distributive agg: residual
    d = (l_orderkey % 5) − 1 is asymmetric (mean ≈ 1), so the
    systematic-error surface is non-vacuous; kurtosis comes from the
    raw-moment identities over integer-exact sums, the median from the
    exact percentile — both reproduced arithmetically in SQL."""
    from deepchecks_spark.checks.performance import RegressionErrorDistribution

    df = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_quantity AS y",
        "l_quantity - ((l_orderkey % 5) - 1.0) AS pred",
    )
    ds = Dataset(df, label="y", infer_categorical=False)
    value, _ = RegressionErrorDistribution("pred").compute(_ctx(ds), "train")
    return spark.createDataFrame(
        [(round(value["Mean Prediction Error"], 6),
          round(value["Median Prediction Error"], 6),
          round(value["Kurtosis Value"], 6),
          round(value["RMSE"], 6))],
        "mean_err double, median_err double, kurtosis double, rmse double",
    )


def o_regression_error_dist_lineitem():
    return """
    WITH d AS (SELECT (l_orderkey % 5)::DOUBLE - 1.0 AS d
               FROM lineitem WHERE l_quantity IS NOT NULL),
         s AS (SELECT count(*)::DOUBLE AS n, sum(d) AS s1, sum(d*d) AS s2,
                      sum(d*d*d) AS s3, sum(d*d*d*d) AS s4, median(d) AS med
               FROM d),
         m AS (SELECT s.*, s1 / n AS mean FROM s)
    SELECT round(mean, 6) AS mean_err,
           round(med, 6) AS median_err,
           round(((s4 - 4 * mean * s3 + 6 * mean * mean * s2) / n - 3 * mean * mean * mean * mean)
                 / ((s2 / n - mean * mean) * (s2 / n - mean * mean)) - 3.0, 6) AS kurtosis,
           round(sqrt(s2 / n), 6) AS rmse
    FROM m
    """


def q_simple_model_comparison_embeddings(spark, sf_dir):
    """SimpleModelComparison without a model: the 'most_frequent'
    baseline's per-class F1 is closed-form from the label histograms
    (majority class scores 2r/(1+r), others 0); gains vs the scored
    predictions column come from the same confusion-cell pass. The
    oracle recomputes all three columns per class in SQL."""
    from deepchecks_spark.checks.performance import SimpleModelComparison, get_gain
    from deepchecks_spark.core.context import Context

    base = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label",
        "CASE WHEN vec_id % 5 = 0 THEN CAST((label + 1) % 10 AS INT) "
        "ELSE label END AS pred",
    )
    train = Dataset(base.filter("vec_id % 2 = 0").drop("vec_id"),
                    label="label", infer_categorical=False)
    test = Dataset(base.filter("vec_id % 2 = 1").drop("vec_id"),
                   label="label", infer_categorical=False)
    check = SimpleModelComparison("pred")
    value, _ = check.compute(Context(train=train, test=test))
    rows = []
    for c, ms in value["scores"]["F1"].items():
        gain = get_gain(ms["Simple"], ms["Origin"], 1.0, check.max_gain)
        rows.append((int(c), round(ms["Origin"], 6), round(ms["Simple"], 6),
                     round(gain, 6)))
    return spark.createDataFrame(
        rows, "class int, f1_origin double, f1_simple double, gain double")


def o_simple_model_comparison_embeddings():
    return """
    WITH tr AS (SELECT label AS y, count(*) AS n FROM embeddings
                WHERE vec_id % 2 = 0 AND label IS NOT NULL GROUP BY 1),
         maj AS (SELECT y FROM tr ORDER BY n DESC, CAST(y AS VARCHAR) LIMIT 1),
         d AS (SELECT label AS y,
                      CASE WHEN vec_id % 5 = 0 THEN CAST((label + 1) % 10 AS INT)
                           ELSE label END AS p
               FROM embeddings WHERE vec_id % 2 = 1 AND label IS NOT NULL),
         cells AS (SELECT y, p, count(*) AS n FROM d GROUP BY 1, 2),
         classes AS (SELECT DISTINCT y AS c FROM d UNION SELECT DISTINCT p FROM d),
         stats AS (SELECT cl.c,
                          coalesce(sum(CASE WHEN ce.y = cl.c AND ce.p = cl.c THEN ce.n END), 0) AS tp,
                          coalesce(sum(CASE WHEN ce.p = cl.c THEN ce.n END), 0) AS pred_n,
                          coalesce(sum(CASE WHEN ce.y = cl.c THEN ce.n END), 0) AS true_n
                   FROM classes cl LEFT JOIN cells ce ON TRUE GROUP BY 1),
         tot AS (SELECT sum(n)::DOUBLE AS nt FROM cells),
         f AS (SELECT c,
                      CASE WHEN tp = 0 OR pred_n = 0 OR true_n = 0 THEN 0.0
                           ELSE 2.0 * (tp / pred_n) * (tp / true_n)
                                / ((tp / pred_n) + (tp / true_n)) END AS origin,
                      CASE WHEN c = (SELECT y FROM maj)
                           THEN 2.0 * (true_n / (SELECT nt FROM tot))
                                / (1.0 + true_n / (SELECT nt FROM tot))
                           ELSE 0.0 END AS simple
               FROM stats)
    SELECT c AS class, round(origin, 6) AS f1_origin, round(simple, 6) AS f1_simple,
           round((origin - simple) / (1.0 - simple), 6) AS gain
    FROM f
    """


def q_simple_model_comparison_strategies_embeddings(spark, sf_dir):
    """SimpleModelComparison 'stratified' and 'uniform' baselines: both
    are closed-form per-class F1 expectations from the train/test label
    histograms (stratified: E[prec]=p_c test freq, E[rec]=q_c train
    freq; uniform: E[rec]=1/|K|), so the oracle recomputes the exact
    same numbers from two GROUP BYs — no model, no randomness."""
    from deepchecks_spark.checks.performance import SimpleModelComparison
    from deepchecks_spark.core.context import Context

    base = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label", "label AS pred")
    train = Dataset(base.filter("vec_id % 2 = 0").drop("vec_id"),
                    label="label", infer_categorical=False)
    test = Dataset(base.filter("vec_id % 2 = 1").drop("vec_id"),
                   label="label", infer_categorical=False)
    rows = []
    for strategy in ("stratified", "uniform"):
        value, _ = SimpleModelComparison("pred", strategy=strategy) \
            .compute(Context(train=train, test=test))
        for c, ms in value["scores"]["F1"].items():
            rows.append((int(c), strategy, round(ms["Simple"], 6)))
    return spark.createDataFrame(
        rows, "class int, strategy string, f1_simple double")


def o_simple_model_comparison_strategies_embeddings():
    return """
    WITH tr AS (SELECT label AS c, count(*) AS n FROM embeddings
                WHERE vec_id % 2 = 0 AND label IS NOT NULL GROUP BY 1),
         te AS (SELECT label AS c, count(*) AS n FROM embeddings
                WHERE vec_id % 2 = 1 AND label IS NOT NULL GROUP BY 1),
         trt AS (SELECT sum(n)::DOUBLE AS n FROM tr),
         tet AS (SELECT sum(n)::DOUBLE AS n FROM te),
         k AS (SELECT count(*)::DOUBLE AS k FROM tr),
         cls AS (SELECT c FROM te),
         f AS (SELECT cls.c,
                      coalesce(te.n, 0) / (SELECT n FROM tet) AS p,
                      coalesce(tr.n, 0) / (SELECT n FROM trt) AS q,
                      CASE WHEN tr.n IS NOT NULL
                           THEN 1.0 / (SELECT k FROM k) ELSE 0.0 END AS r
               FROM cls LEFT JOIN tr ON tr.c = cls.c
                        LEFT JOIN te ON te.c = cls.c)
    SELECT c AS class, 'stratified' AS strategy,
           round(CASE WHEN p + q = 0 THEN 0.0
                      ELSE 2.0 * p * q / (p + q) END, 6) AS f1_simple
    FROM f
    UNION ALL
    SELECT c, 'uniform',
           round(CASE WHEN p + r = 0 THEN 0.0
                      ELSE 2.0 * p * r / (p + r) END, 6)
    FROM f
    """


def q_performance_bias_orders(spark, sf_dir):
    """PerformanceBias over a protected categorical feature: the
    '1-URGENT' subgroup mispredicts every 3rd row, the rest are
    perfect; subgroup scores and the shared baseline come from one
    grouped cell pass, all recomputed in SQL."""
    from deepchecks_spark.checks.performance import PerformanceBias

    df = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority",
        "CAST(o_orderkey % 2 AS INT) AS lbl",
        "CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0 "
        "THEN CAST(1 - o_orderkey % 2 AS INT) ELSE CAST(o_orderkey % 2 AS INT) END AS pred",
    )
    ds = Dataset(df, label="lbl", cat_features=["o_orderpriority"],
                 infer_categorical=False)
    value, _ = PerformanceBias("pred", protected_feature="o_orderpriority") \
        .compute(_ctx(ds), "train")
    rows = [(r["o_orderpriority"], round(float(r["_score"]), 6),
             round(float(r["_baseline"]), 6), int(r["_count"]))
            for r in value["scores_df"]]
    return spark.createDataFrame(
        rows, "subgroup string, score double, baseline double, n long")


def o_performance_bias_orders():
    return """
    WITH d AS (SELECT o_orderpriority AS g,
                      CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0
                           THEN 1 ELSE 0 END AS wrong
               FROM orders),
         seg AS (SELECT g, count(*) AS n, sum(wrong) AS w FROM d GROUP BY 1),
         tot AS (SELECT sum(n)::DOUBLE AS tn, sum(w)::DOUBLE AS tw FROM seg)
    SELECT g AS subgroup,
           round((n - w) / n::DOUBLE, 6) AS score,
           round((SELECT (tn - tw) / tn FROM tot), 6) AS baseline,
           n::BIGINT AS n
    FROM seg
    """


def q_multi_model_embeddings(spark, sf_dir):
    """MultiModelPerformanceReport: two scored prediction columns (A
    flips every 5th row by +1, B every 3rd by +2) evaluated per class
    in ONE melted groupBy; the F1 rows must match the SQL recomputation
    over the same union of (model, label, pred) triples."""
    from deepchecks_spark.checks.performance import MultiModelPerformanceReport

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "label",
        "CASE WHEN vec_id % 5 = 0 THEN CAST((label + 1) % 10 AS INT) "
        "ELSE label END AS pa",
        "CASE WHEN vec_id % 3 = 0 THEN CAST((label + 2) % 10 AS INT) "
        "ELSE label END AS pb",
    )
    ds = Dataset(df, label="label", infer_categorical=False)
    value, _ = MultiModelPerformanceReport({"A": "pa", "B": "pb"}) \
        .compute(_ctx(ds), "train")
    rows = [(r["Model"], int(r["Class"]), round(float(r["Value"]), 6),
             int(r["Number of samples"]))
            for r in value if r["Metric"] == "F1"]
    return spark.createDataFrame(rows, "model string, class int, f1 double, n long")


def o_multi_model_embeddings():
    return """
    WITH d AS (
        SELECT 'A' AS m, label AS y,
               CASE WHEN vec_id % 5 = 0 THEN CAST((label + 1) % 10 AS INT)
                    ELSE label END AS p
        FROM embeddings WHERE label IS NOT NULL
        UNION ALL
        SELECT 'B', label,
               CASE WHEN vec_id % 3 = 0 THEN CAST((label + 2) % 10 AS INT)
                    ELSE label END
        FROM embeddings WHERE label IS NOT NULL),
         cells AS (SELECT m, y, p, count(*) AS n FROM d GROUP BY 1, 2, 3),
         classes AS (SELECT DISTINCT m, y AS c FROM d
                     UNION SELECT DISTINCT m, p FROM d),
         stats AS (SELECT cl.m, cl.c,
                          coalesce(sum(CASE WHEN ce.y = cl.c AND ce.p = cl.c THEN ce.n END), 0) AS tp,
                          coalesce(sum(CASE WHEN ce.p = cl.c THEN ce.n END), 0) AS pred_n,
                          coalesce(sum(CASE WHEN ce.y = cl.c THEN ce.n END), 0) AS true_n
                   FROM classes cl LEFT JOIN cells ce ON ce.m = cl.m
                   GROUP BY 1, 2)
    SELECT m AS model, c AS class,
           round(CASE WHEN tp = 0 OR pred_n = 0 OR true_n = 0 THEN 0.0
                      ELSE 2.0 * (tp / pred_n) * (tp / true_n)
                           / ((tp / pred_n) + (tp / true_n)) END, 6) AS f1,
           true_n::BIGINT AS n
    FROM stats
    """


def q_weak_segments_orders(spark, sf_dir):
    """WeakSegmentsPerformance over categorical segment grid
    (o_orderpriority × o_orderstatus): the planted segment
    ('1-URGENT', 'F') predicts every label wrong, all other segments are
    perfect — the single GROUPING SETS pass must surface exactly that
    segment as the weakest, with its size and the global accuracy."""
    from deepchecks_spark.checks.performance import WeakSegmentsPerformance

    df = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority", "o_orderstatus",
        "CAST(o_orderkey % 2 AS INT) AS lbl",
        "CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus = 'F' "
        "THEN CAST(1 - o_orderkey % 2 AS INT) ELSE CAST(o_orderkey % 2 AS INT) END AS pred",
    )
    ds = Dataset(df, label="lbl", cat_features=["o_orderpriority", "o_orderstatus"],
                 infer_categorical=False)
    check = WeakSegmentsPerformance(
        "pred", columns=["o_orderpriority", "o_orderstatus"],
        segment_minimum_size_ratio=0.03)
    value, _ = check.compute(_ctx(ds), "train")
    worst = value["weak_segments_list"][0]
    return spark.createDataFrame(
        [(worst["Feature1 Range"], worst["Feature2 Range"],
          round(float(worst["Score"]), 6), int(worst["n_samples"]),
          round(float(value["avg_score"]), 6))],
        "range1 string, range2 string, score double, n_samples long, avg_score double",
    )


def o_weak_segments_orders():
    return """
    WITH d AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                      o_orderkey % 2 AS y,
                      CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
                           THEN 1 - o_orderkey % 2 ELSE o_orderkey % 2 END AS p
               FROM orders),
         seg AS (SELECT a, b, count(*) AS n,
                        sum(CASE WHEN y = p THEN 1 ELSE 0 END) AS n_correct
                 FROM d GROUP BY 1, 2),
         tot AS (SELECT sum(n)::DOUBLE AS total, sum(n_correct)::DOUBLE AS correct FROM seg),
         ok AS (SELECT a, b, n, n_correct / n::DOUBLE AS score FROM seg, tot
                WHERE n >= 0.03 * total)
    SELECT a AS range1, b AS range2, round(score, 6) AS score,
           n::BIGINT AS n_samples,
           round((SELECT correct / total FROM tot), 6) AS avg_score
    FROM ok ORDER BY score, a, b LIMIT 1
    """


# ---------------------------------------------------------------------------
# round-5 training-data-pipeline operators: Gopher rule filter, self-trained
# unigram LM scoring, benchmark decontamination, SemDeDup semantic dedup
# ---------------------------------------------------------------------------

# derived multi-line fixture: the synthetic corpus is single-line, so inject
# deterministic line structure — every ' row ' ends a line with an ellipsis,
# every ' agg ' starts a bullet line. Plain substring replace is semantically
# identical in Spark and DuckDB.
_GOPHER_FIXTURE_SQL = (
    "replace(replace(text, ' row ', ' row...\n'), ' agg ', '\n• agg ')"
)


def q_gopher_quality_documents(spark, sf_dir):
    """Gopher/MassiveText rule filter (Rae et al. 2021 A1.1) over a
    derived multi-line corpus: per-document word/line signals, the
    comma-joined failed-rule list, and the keep verdict — all from one
    shuffle-free projection. The oracle recomputes every signal with
    DuckDB list lambdas; the rule thresholds are chosen so each rule
    fires on part of the corpus (value-hash covers the rule logic, not
    just the signals)."""
    from deepchecks_spark.pipeline.textstats import gopher_quality_rules

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _GOPHER_FIXTURE_SQL + " AS text")
    out = gopher_quality_rules(
        df, "text", min_words=40, max_words=100_000,
        min_avg_word_len=3.0, max_avg_word_len=10.0,
        max_symbol_word_ratio=0.02, max_bullet_line_frac=0.15,
        max_ellipsis_line_frac=0.15, min_alpha_word_frac=0.97,
        min_stopword_hits=1)
    return out.select(
        "doc_id", "n_words", "avg_word_len", "symbol_word_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "stopword_hits", "failed_rules", "quality_keep",
    )


def o_gopher_quality_documents():
    return r"""
    WITH f AS (SELECT doc_id, """ + _GOPHER_FIXTURE_SQL + r""" AS text FROM documents),
    toks AS (
      SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\s+') END AS t,
             string_split(text, chr(10)) AS lines
      FROM f),
    sig AS (
      SELECT doc_id, len(t) AS n, greatest(len(t), 1)::DOUBLE AS nd,
             coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS total_len,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell3,
             length(text) - length(replace(text, '…', '')) AS n_ellu,
             greatest(len(lines), 1)::DOUBLE AS nlines,
             len(list_filter(lines, x -> list_contains(['•','‣','▪','◦','-','*'],
                                                       substr(ltrim(x), 1, 1)))) AS n_bullet,
             len(list_filter(lines, x -> ends_with(rtrim(x), '...')
                                          OR ends_with(rtrim(x), '…'))) AS n_ellline,
             len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
             len(list_intersect(list_distinct(list_transform(t, x -> lower(x))),
                                ['the','be','to','of','and','that','have','with'])) AS stop_hits
      FROM toks),
    r AS (
      SELECT doc_id, n::BIGINT AS n_words,
             round(CASE WHEN n > 0 THEN total_len / nd ELSE 0.0 END, 6) AS avg_word_len,
             round((n_hash + n_ell3 + n_ellu) / nd, 6) AS symbol_word_ratio,
             round(n_bullet / nlines, 6) AS bullet_line_frac,
             round(n_ellline / nlines, 6) AS ellipsis_line_frac,
             round(CASE WHEN n > 0 THEN n_alpha / nd ELSE 0.0 END, 6) AS alpha_word_frac,
             stop_hits::BIGINT AS stopword_hits
      FROM sig)
    SELECT *,
           concat_ws(',',
             CASE WHEN n_words < 40 OR n_words > 100000 THEN 'word_count' END,
             CASE WHEN avg_word_len < 3.0 OR avg_word_len > 10.0 THEN 'avg_word_length' END,
             CASE WHEN symbol_word_ratio > 0.02 THEN 'symbol_ratio' END,
             CASE WHEN bullet_line_frac > 0.15 THEN 'bullet_lines' END,
             CASE WHEN ellipsis_line_frac > 0.15 THEN 'ellipsis_lines' END,
             CASE WHEN alpha_word_frac < 0.97 THEN 'alpha_words' END,
             CASE WHEN stopword_hits < 1 THEN 'stopwords' END) AS failed_rules,
           concat_ws(',',
             CASE WHEN n_words < 40 OR n_words > 100000 THEN 'word_count' END,
             CASE WHEN avg_word_len < 3.0 OR avg_word_len > 10.0 THEN 'avg_word_length' END,
             CASE WHEN symbol_word_ratio > 0.02 THEN 'symbol_ratio' END,
             CASE WHEN bullet_line_frac > 0.15 THEN 'bullet_lines' END,
             CASE WHEN ellipsis_line_frac > 0.15 THEN 'ellipsis_lines' END,
             CASE WHEN alpha_word_frac < 0.97 THEN 'alpha_words' END,
             CASE WHEN stopword_hits < 1 THEN 'stopwords' END) = '' AS quality_keep
    FROM r
    """


def q_filter_funnel_documents(spark, sf_dir):
    """Gopher filter survival funnel (pipeline/textstats.py::
    filter_funnel — ONE distributive agg over the same shuffle-free
    rule projection as gopher_quality_documents): per rule in
    application order, docs failing it outright and docs surviving the
    rule prefix. The oracle recomputes both sums from the gopher
    oracle's own failed_rules string."""
    from deepchecks_spark.pipeline.textstats import filter_funnel

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _GOPHER_FIXTURE_SQL + " AS text")
    return filter_funnel(
        df, "text", min_words=40, max_words=100_000,
        min_avg_word_len=3.0, max_avg_word_len=10.0,
        max_symbol_word_ratio=0.02, max_bullet_line_frac=0.15,
        max_ellipsis_line_frac=0.15, min_alpha_word_frac=0.97,
        min_stopword_hits=1)


def o_filter_funnel_documents():
    from deepchecks_spark.pipeline.textstats import GOPHER_RULE_NAMES

    branches = ["SELECT 'input' AS stage, 0::BIGINT AS n_fail, "
                "count(*)::BIGINT AS n_surviving FROM fl"]
    for i, name in enumerate(GOPHER_RULE_NAMES):
        prefix = " AND ".join(
            f"NOT list_contains(fr, '{p}')"
            for p in GOPHER_RULE_NAMES[:i + 1])
        branches.append(
            f"SELECT '{name}', sum(list_contains(fr, '{name}')::INT)::BIGINT, "
            f"sum(({prefix})::INT)::BIGINT FROM fl")
    return (
        "WITH g AS (" + o_gopher_quality_documents() + "),\n"
        "     fl AS (SELECT string_split(failed_rules, ',') AS fr FROM g)\n"
        + "\nUNION ALL ".join(branches)
    )


def q_unigram_logprob_documents(spark, sf_dir):
    """CCNet-style self-trained unigram LM scoring: the corpus trains
    its own smoothed unigram model (vocab_size exceeds the synthetic
    vocabulary, so the top-V cut is a no-op and the oracle needs no
    tie-break); every document is scored by mean token negative
    log-probability. avg_nll is a mean of ≤ ~100 IEEE-exact terms, so
    6-decimal rounding absorbs engine-order float noise."""
    from deepchecks_spark.pipeline.textstats import unigram_logprob

    df = _t(spark, sf_dir, "documents")
    out = unigram_logprob(df, "doc_id", "text", vocab_size=1000)
    return out.select(
        "doc_id", "n_tokens", F.round("avg_nll", 6).alias("avg_nll"))


def o_unigram_logprob_documents():
    return r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0),
    tok2 AS (SELECT * FROM tok WHERE token <> ''),
    cnt AS (SELECT token, count(*) AS c FROM tok2 GROUP BY 1),
    tot AS (SELECT sum(c) AS n_total, least(count(*), 1000) AS v_kept FROM cnt),
    sc AS (SELECT doc_id, -ln((c + 1) / (n_total + v_kept + 1)::DOUBLE) AS nll
           FROM tok2 JOIN cnt USING (token), tot),
    p AS (SELECT doc_id, count(*) AS n_tokens, avg(nll) AS avg_nll
          FROM sc GROUP BY 1)
    SELECT d.doc_id, coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
           round(p.avg_nll, 6) AS avg_nll
    FROM documents d LEFT JOIN p USING (doc_id)
    """


def q_decontamination_documents(spark, sf_dir):
    """GPT-3-style benchmark decontamination: every 37th document plays
    the benchmark set, so those documents are fully contaminated
    (frac = 1.0) and any other overlap is a genuine shared 13-gram.
    The engine compares xxhash64 gram hashes; the oracle compares the
    gram STRINGS — identical absent a 64-bit collision. The benchmark
    gram count at test scale keeps the literal zero-shuffle path on;
    the join path is unit-locked separately."""
    from deepchecks_spark.pipeline.decontam import ngram_decontamination

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0).select("text")
    out = ngram_decontamination(docs, bench, "doc_id", "text", ngram=13)
    return out.select(
        "doc_id", "n_grams", "n_contaminated",
        F.round("contaminated_frac", 6).alias("contaminated_frac"),
        "is_contaminated",
    )


def o_decontamination_documents():
    return r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\s+') END AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 13
                  THEN list_distinct(list_transform(range(1, len(t) - 11),
                                                    i -> array_to_string(t[i:i+12], ' ')))
                  ELSE [] END AS grams
      FROM toks),
    bg AS (SELECT DISTINCT unnest(grams) AS h FROM g WHERE doc_id % 37 = 0),
    e AS (SELECT doc_id, unnest(grams) AS h FROM g),
    hits AS (SELECT doc_id, count(*) AS c FROM e JOIN bg USING (h) GROUP BY 1)
    SELECT g.doc_id, len(grams)::BIGINT AS n_grams,
           coalesce(c, 0)::BIGINT AS n_contaminated,
           round(coalesce(c, 0) / greatest(len(grams), 1)::DOUBLE, 6) AS contaminated_frac,
           coalesce(c, 0) / greatest(len(grams), 1)::DOUBLE > 0.0 AS is_contaminated
    FROM g LEFT JOIN hits USING (doc_id)
    """


# planted-clone fixture for semantic dedup: group g = vec_id % 83 maps to a
# deterministic 32-dim integer vector via a NONLINEAR polynomial mod 97
# (linear LCGs are periodic in g and collide); within a group vectors are
# exact clones (cosine 1), across groups max cosine = 0.549 (verified
# numerically) — so at threshold 0.8 the semantic components are exactly the
# residue classes and the representative is the min id.
_SEMDEDUP_VEC_SPARK = (
    "transform(sequence(0, 31), d -> CAST("
    "(( (vec_id % 83) * (vec_id % 83) * (d + 7) + (vec_id % 83) * (d * d + 11)"
    " + d * d * d) % 97) - 48 AS DOUBLE))"
)


def q_semantic_dedup_embeddings(spark, sf_dir):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023) on the
    planted-clone corpus: IVF cell-join pairs (nprobe = nlist ⇒ exact)
    → connected components → min-id representative. The oracle derives
    the same clusters arithmetically (component = min vec_id of the
    mod-83 residue class), so a missed pair, an under-merged component,
    or a wrong representative all break the value-hash."""
    from deepchecks_spark.pipeline.similarity import semantic_dedup

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", _SEMDEDUP_VEC_SPARK + " AS embedding")
    return semantic_dedup(df, dim=32, threshold=0.8, nlist=8, nprobe=8,
                          id_col="vec_id", vec_col="embedding")


def o_semantic_dedup_embeddings():
    return """
    SELECT vec_id AS id,
           min(vec_id) OVER (PARTITION BY vec_id % 83) AS component,
           vec_id = min(vec_id) OVER (PARTITION BY vec_id % 83) AS is_representative
    FROM embeddings
    """


# ---------------------------------------------------------------------------
# round-5 web-corpus cleaning operators: C4 rules, PII redaction, URL
# normalization/dedup, cross-corpus line dedup, domain mixture
# ---------------------------------------------------------------------------

# derived multi-line fixture shared by the Spark query and the DuckDB
# oracle (chr(10) keeps the snippet dialect-portable): every ' row '
# terminates a sentence/line; selected docs gain C4 page-drop markers.
_C4_FIXTURE_SQL = (
    "concat(replace(text, ' row ', concat('.', chr(10))),"
    " CASE WHEN doc_id % 11 = 0 THEN ' extra Lorem Ipsum filler' ELSE '' END,"
    " CASE WHEN doc_id % 13 = 0 THEN ' brace {' ELSE '' END,"
    " CASE WHEN doc_id % 17 = 0 THEN concat(chr(10), 'calls javascript init now.')"
    " ELSE '' END)"
)


def q_c4_clean_documents(spark, sf_dir):
    """C4 cleaning rule set (Raffel et al. 2020 §2.2) over a derived
    multi-line corpus with planted page-drop markers (lorem ipsum on
    doc_id%11, '{' on %13, a javascript line on %17): line filters,
    sentence counting on the KEPT text, rebuilt cleaned_text, and the
    page verdict — one shuffle-free projection. The oracle recomputes
    every rule with DuckDB list lambdas."""
    from deepchecks_spark.pipeline.webclean import c4_clean

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _C4_FIXTURE_SQL + " AS text")
    out = c4_clean(df, "text", min_words_per_line=3, min_sentences=5)
    return out.select("doc_id", "n_lines", "n_lines_kept", "n_sentences",
                      "cleaned_text", "drop_reasons", "page_keep")


def o_c4_clean_documents():
    return r"""
    WITH f AS (SELECT doc_id, """ + _C4_FIXTURE_SQL + r""" AS text FROM documents),
    l AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM f),
    k AS (
      SELECT doc_id, text, lines,
             list_filter(lines, x ->
               list_contains(['.','!','?','"'], right(rtrim(x), 1))
               AND (CASE WHEN length(trim(x)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(x), '\s+')) END) >= 3
               AND NOT contains(lower(x), 'javascript')) AS kept
      FROM l),
    c AS (
      SELECT doc_id, text, lines, kept,
             -- DuckDB array_to_string([]) is NULL; Spark gives ''
             coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text
      FROM k),
    s AS (
      SELECT doc_id, text, lines, kept, cleaned_text,
             CASE WHEN length(cleaned_text) = 0 THEN 0
                  ELSE len(regexp_extract_all(cleaned_text, '[.!?"]+')) END
               AS n_sentences
      FROM c)
    SELECT doc_id, len(lines)::BIGINT AS n_lines,
           len(kept)::BIGINT AS n_lines_kept,
           n_sentences::BIGINT AS n_sentences, cleaned_text,
           concat_ws(',',
             CASE WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem_ipsum' END,
             CASE WHEN contains(text, '{') THEN 'curly_brace' END,
             CASE WHEN n_sentences < 5 THEN 'too_few_sentences' END) AS drop_reasons,
           concat_ws(',',
             CASE WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem_ipsum' END,
             CASE WHEN contains(text, '{') THEN 'curly_brace' END,
             CASE WHEN n_sentences < 5 THEN 'too_few_sentences' END) = '' AS page_keep
    FROM s
    """


# PII fixture: deterministic emails / IPv4s / phone numbers planted on
# common corpus tokens (portable SQL, used verbatim by both engines)
_PII_FIXTURE_SQL = (
    "replace(replace(replace(text,"
    " ' hash ', concat(' user', CAST(doc_id % 50 AS STRING), '@example.com ')),"
    " ' merge ', concat(' 10.0.', CAST(doc_id % 20 AS STRING), '.7 ')),"
    " ' sort ', ' +1 555-123-4567 ')"
)


def q_pii_redaction_documents(spark, sf_dir):
    """Regex PII pass over a corpus with planted emails, IPv4s and
    phone numbers: per-document match counts and the rewritten text.
    The oracle replays the same three patterns in DuckDB (RE2) in the
    same order — a dialect divergence in any pattern breaks the
    value-hash on the rewritten text itself."""
    from deepchecks_spark.pipeline.webclean import pii_redaction

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _PII_FIXTURE_SQL + " AS text")
    out = pii_redaction(df, "text")
    return out.select("doc_id", "n_email", "n_ip", "n_phone", "redacted_text")


def o_pii_redaction_documents():
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
    phone = r"\+?\d[\d\- ]{7,}\d"
    return f"""
    WITH f AS (SELECT doc_id, {_PII_FIXTURE_SQL} AS text FROM documents),
    s1 AS (SELECT doc_id, text,
                  len(regexp_extract_all(text, '{email}')) AS n_email,
                  regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
           FROM f),
    s2 AS (SELECT doc_id, n_email,
                  len(regexp_extract_all(t1, '{ip}')) AS n_ip,
                  regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2
           FROM s1),
    s3 AS (SELECT doc_id, n_email, n_ip,
                  len(regexp_extract_all(t2, '{phone}')) AS n_phone,
                  regexp_replace(t2, '{phone}', '<PHONE>', 'g') AS redacted_text
           FROM s2)
    SELECT doc_id, n_email::BIGINT AS n_email, n_ip::BIGINT AS n_ip,
           n_phone::BIGINT AS n_phone, redacted_text
    FROM s3
    """


# URL fixture: raw URLs that differ only in case / default port /
# tracking params / fragment, collapsing onto (doc_id%5, doc_id%7) forms
_URL_FIXTURE_SQL = (
    "concat('HTTP://Example', CAST(doc_id % 5 AS STRING), '.COM',"
    " CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END,"
    " '/path', CAST(doc_id % 7 AS STRING),"
    " CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x' ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END)"
)


def q_url_dedup_documents(spark, sf_dir):
    """URL normalization + duplicate collapse: raw URLs that differ
    only in scheme/host case, default port, tracking params and
    fragment must land on one canonical form per (doc_id%5, doc_id%7)
    class. The oracle builds the canonical form ARITHMETICALLY from
    doc_id (never running the normalizer), so any normalization slip —
    a surviving utm param, an unstripped port — changes the group key
    and breaks the hash."""
    from deepchecks_spark.pipeline.webclean import url_duplicate_stats

    df = _t(spark, sf_dir, "documents").selectExpr(
        _URL_FIXTURE_SQL + " AS url")
    return url_duplicate_stats(df, "url").orderBy("normalized_url")


def o_url_dedup_documents():
    return f"""
    WITH f AS (SELECT doc_id, {_URL_FIXTURE_SQL} AS url FROM documents),
    g AS (
      SELECT concat('http://example', CAST(doc_id % 5 AS STRING), '.com/path',
                    CAST(doc_id % 7 AS STRING)) AS normalized_url,
             count(*) AS n_raw, count(DISTINCT url) AS n_distinct_raw
      FROM f GROUP BY 1)
    SELECT normalized_url, n_raw::BIGINT AS n_raw,
           n_distinct_raw::BIGINT AS n_distinct_raw
    FROM g WHERE n_raw >= 2 ORDER BY normalized_url
    """


def q_domain_profile_documents(spark, sf_dir):
    """Per-domain corpus profile over the arithmetic URL fixture: five
    domains (example0-4.com, mixed case / ports in the raw form), each
    with its document count, exact-duplicate-text rate, token mass and
    mean length. The oracle builds the domain key ARITHMETICALLY from
    doc_id (never running the host regexp), so a host-extraction slip —
    an unstripped port, a case leak — moves rows between groups and
    breaks the hash; duplicate counts compare xxhash64-distinct (engine)
    against text-distinct (oracle), identical absent a 64-bit
    collision."""
    from deepchecks_spark.pipeline.webclean import domain_profile

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "text", _URL_FIXTURE_SQL + " AS url")
    out = domain_profile(df, "url", "text")
    return out.select(
        "domain", "n_docs", "n_unique_texts",
        F.round("dup_ratio", 6).alias("dup_ratio"),
        "n_tokens",
        F.round("avg_chars", 6).alias("avg_chars"),
    )


def o_domain_profile_documents():
    return f"""
    WITH f AS (SELECT concat('example', CAST(doc_id % 5 AS STRING), '.com') AS domain,
                      text,
                      (CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE array_length(string_split_regex(trim(text), '\\s+')) END) AS nt
               FROM documents)
    SELECT domain,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT text)::BIGINT AS n_unique_texts,
           round((count(*) - count(DISTINCT text)) / count(*)::DOUBLE, 6) AS dup_ratio,
           sum(nt)::BIGINT AS n_tokens,
           round(sum(length(text)) / count(*)::DOUBLE, 6) AS avg_chars
    FROM f GROUP BY domain ORDER BY domain
    """


# spam-URL fixture: digit-stuffed subdomain chains every 3rd doc, deep
# paths cycling 0-8 segments, parameter explosions every 4th doc
_SPAM_URL_FIXTURE_SQL = (
    "concat('http://',"
    " CASE WHEN doc_id % 3 = 0"
    "      THEN concat('a', CAST(doc_id % 10 AS STRING), '7.b.c.example',"
    "                  CAST(doc_id % 5 AS STRING), '.com')"
    "      ELSE concat('example', CAST(doc_id % 5 AS STRING), '.com') END,"
    " '/p', repeat('/x', CAST(doc_id % 9 AS INT)),"
    " CASE WHEN doc_id % 4 = 0 THEN '?a=1&b=2&c=3&d=4&e=5&f=6'"
    "      WHEN doc_id % 4 = 1 THEN '?q=1' ELSE '' END)"
)


def q_url_spam_documents(spark, sf_dir):
    """Structural URL spam signals over a fixture with digit-stuffed
    subdomain chains, deep paths and parameter explosions. The oracle
    re-derives every signal with a DIFFERENT parse strategy
    (split_part/substr arithmetic instead of the engine's regexp
    extraction), so the two agree only if both parse the URL grammar
    correctly; the composite score is the identical double expression
    on both sides."""
    from deepchecks_spark.pipeline.webclean import url_spam_scores

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _SPAM_URL_FIXTURE_SQL + " AS url")
    out = url_spam_scores(df, "url")
    return out.select(
        "doc_id", "url_len",
        F.round("host_digit_ratio", 6).alias("host_digit_ratio"),
        "path_depth", "n_params", "n_subdomains",
        F.round("spam_score", 6).alias("spam_score"), "is_spam",
    )


def o_url_spam_documents():
    return f"""
    WITH f AS (SELECT doc_id, {_SPAM_URL_FIXTURE_SQL} AS url FROM documents),
    p AS (SELECT doc_id, url,
                 split_part(url, '?', 2) AS query,
                 split_part(split_part(url, '?', 1), '/', 3) AS host,
                 substr(split_part(url, '?', 1),
                        8 + length(split_part(split_part(url, '?', 1), '/', 3)))
                   AS path
          FROM f),
    s AS (SELECT doc_id,
                 length(url)::BIGINT AS url_len,
                 CASE WHEN length(host) > 0
                      THEN length(regexp_replace(host, '[^0-9]', '', 'g'))
                           / length(host)::DOUBLE
                      ELSE 0.0 END AS host_digit_ratio,
                 (length(path) - length(replace(path, '/', '')))::BIGINT AS path_depth,
                 (CASE WHEN length(query) = 0 THEN 0
                       ELSE length(query) - length(replace(query, '&', '')) + 1
                  END)::BIGINT AS n_params,
                 greatest(length(host) - length(replace(host, '.', '')) - 1,
                          0)::BIGINT AS n_subdomains
          FROM p)
    SELECT doc_id, url_len, round(host_digit_ratio, 6) AS host_digit_ratio,
           path_depth, n_params, n_subdomains,
           round(0.25 * least(url_len / 200.0, 1.0)
                 + 0.25 * host_digit_ratio
                 + 0.20 * least(n_params / 5.0, 1.0)
                 + 0.15 * least(path_depth / 8.0, 1.0)
                 + 0.15 * least(n_subdomains / 4.0, 1.0), 6) AS spam_score,
           (0.25 * least(url_len / 200.0, 1.0)
            + 0.25 * host_digit_ratio
            + 0.20 * least(n_params / 5.0, 1.0)
            + 0.15 * least(path_depth / 8.0, 1.0)
            + 0.15 * least(n_subdomains / 4.0, 1.0)) >= 0.5 AS is_spam
    FROM s ORDER BY doc_id
    """


def q_boilerplate_lines_documents(spark, sf_dir):
    """Top-k boilerplate-line report over the line-dedup fixture (one
    planted line shared by every document containing ' table ', plus
    whatever text fragments repeat organically): the k most-shared
    trimmed lines with distinct-document counts and corpus fractions.
    The oracle recomputes the report from the line TEXT in SQL —
    per-document distinctness, the min_docs cut, the (count desc, line)
    total order and the top-k boundary must all agree exactly."""
    from deepchecks_spark.pipeline.webclean import boilerplate_lines

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _LINEDEDUP_FIXTURE_SQL + " AS text")
    out = boilerplate_lines(df, "text", min_docs=2, k=20)
    return out.select(
        "line", "n_docs", F.round("frac_docs", 6).alias("frac_docs"))


def o_boilerplate_lines_documents():
    return r"""
    WITH f AS (SELECT doc_id, """ + _LINEDEDUP_FIXTURE_SQL + r""" AS text FROM documents),
    e AS (SELECT DISTINCT doc_id, trim(x) AS line
          FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS x FROM f)
          WHERE length(trim(x)) > 0),
    c AS (SELECT line, count(*)::BIGINT AS n_docs FROM e GROUP BY line
          HAVING count(*) >= 2),
    t AS (SELECT count(*)::DOUBLE AS total FROM f)
    SELECT line, n_docs, round(n_docs / (SELECT total FROM t), 6) AS frac_docs
    FROM c ORDER BY n_docs DESC, line LIMIT 20
    """


# line-dedup fixture: every ' table ' becomes an identical boilerplate
# line, shared across every document that contains the token
_LINEDEDUP_FIXTURE_SQL = (
    "replace(text, ' table ',"
    " concat(chr(10), 'shared boilerplate line', chr(10)))"
)


def q_line_dedup_documents(spark, sf_dir):
    """Cross-corpus duplicated-line removal over a corpus with a
    planted boilerplate line (plus any organically repeated segment
    lines): lines occurring in ≥2 distinct documents vanish everywhere.
    The engine compares trimmed-line xxhash64 values; the oracle
    compares the trimmed line TEXT — identical absent a 64-bit
    collision, and the rebuilt cleaned_text is value-hashed in full."""
    from deepchecks_spark.pipeline.webclean import remove_duplicated_lines

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _LINEDEDUP_FIXTURE_SQL + " AS text")
    return remove_duplicated_lines(df, "doc_id", "text", min_docs=2)


def o_line_dedup_documents():
    return r"""
    WITH f AS (SELECT doc_id, """ + _LINEDEDUP_FIXTURE_SQL + r""" AS text FROM documents),
    l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM f),
    e AS (SELECT DISTINCT doc_id, trim(x) AS t
          FROM (SELECT doc_id, unnest(lines) AS x FROM l)
          WHERE length(trim(x)) > 0),
    flag AS (SELECT t FROM e GROUP BY t HAVING count(*) >= 2),
    fl AS (SELECT doc_id, list(t) AS fset FROM e JOIN flag USING (t) GROUP BY doc_id),
    r AS (SELECT l.doc_id, lines, coalesce(fset, []) AS fset
          FROM l LEFT JOIN fl ON l.doc_id = fl.doc_id),
    k AS (SELECT doc_id, lines,
                 list_filter(lines, x -> length(trim(x)) = 0
                                         OR NOT list_contains(fset, trim(x))) AS kept
          FROM r)
    SELECT doc_id, len(lines)::BIGINT AS n_lines,
           (len(lines) - len(kept))::BIGINT AS n_lines_removed,
           coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text
    FROM k
    """


def q_domain_mixture_documents(spark, sf_dir):
    """Per-domain mixture statistics + DoReMi-style static sampling
    weights toward a target share map (two sources targeted, the rest
    NULL-weighted): one groupBy on the source key with a one-row totals
    broadcast."""
    from deepchecks_spark.pipeline.webclean import domain_mixture

    df = _t(spark, sf_dir, "documents")
    out = domain_mixture(df, "source", "text",
                         {"src0": 0.2, "src1": 0.1})
    return out.select(
        "domain", "n_docs", "n_tokens",
        F.round("token_share", 6).alias("token_share"),
        "target_share",
        F.round("sampling_weight", 6).alias("sampling_weight"),
    )


def o_domain_mixture_documents():
    return r"""
    WITH per AS (
      SELECT source AS domain, count(*) AS n_docs,
             sum(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END) AS n_tokens
      FROM documents GROUP BY 1),
    t AS (SELECT sum(n_tokens) AS total FROM per)
    SELECT domain, n_docs::BIGINT AS n_docs, n_tokens::BIGINT AS n_tokens,
           round(n_tokens / total::DOUBLE, 6) AS token_share,
           CAST(CASE WHEN domain = 'src0' THEN 0.2
                     WHEN domain = 'src1' THEN 0.1 END AS DOUBLE) AS target_share,
           round(CAST(CASE WHEN domain = 'src0' THEN 0.2
                           WHEN domain = 'src1' THEN 0.1 END AS DOUBLE)
                 / (n_tokens / total::DOUBLE), 6) AS sampling_weight
    FROM per, t ORDER BY domain
    """


def q_quality_classifier_documents(spark, sf_dir):
    """Learned quality-filter stage (Wenzek et al. 2020 CCNet; Brown et
    al. 2020 appendix A): a planted fixture where odd doc_ids have every
    letter replaced by a digit (the noise class) trains the logistic
    model end-to-end inside the engine; the classes are separated by an
    enormous margin on the digit-ratio/stopword features, so the trained
    boundary must reproduce the planted rule exactly — which is the
    oracle. Scores are engine-internal (iterative float64 GD); the
    contract row checks the keep/drop decisions."""
    from deepchecks_spark.pipeline.classifier import (
        score_quality, train_quality_classifier)

    docs = _t(spark, sf_dir, "documents")
    labeled = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 1,
               F.regexp_replace("text", "[a-z]", "7"))
        .otherwise(F.col("text")).alias("text"),
        (1 - F.col("doc_id") % 2).cast("int").alias("label"),
    )
    model = train_quality_classifier(labeled, "text", "label")
    out = score_quality(labeled, "text", model, threshold=0.5)
    return out.select("doc_id",
                      F.col("quality_score_pred").alias("pred_good"))


def o_quality_classifier_documents():
    return """
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::INTEGER AS pred_good
    FROM documents
    """


def q_bigram_logprob_documents(spark, sf_dir):
    """Stupid-backoff bigram LM scoring (Brants et al. 2007), self-
    trained on the corpus: seen bigrams score c(w1w2)/c(w1), the first
    token and (in held-out use) unseen continuations back off to the
    Laplace unigram p1(w) = (c+1)/(N+V+1). Self-trained, every scored
    bigram is seen, so this row locks the count tables + conditional
    path; the backoff branch is unit-locked with a held-out train_df.
    avg_nll is a mean of ≤ ~100 IEEE-exact terms — 6-decimal rounding
    absorbs engine-order float noise (same convention as the unigram
    row)."""
    from deepchecks_spark.pipeline.textstats import bigram_logprob

    df = _t(spark, sf_dir, "documents")
    out = bigram_logprob(df, "doc_id", "text")
    return out.select(
        "doc_id", "n_tokens", F.round("avg_nll", 6).alias("avg_nll"))


def o_bigram_logprob_documents():
    return r"""
    WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
               FROM documents WHERE length(trim(text)) > 0),
    ucnt AS (SELECT w, count(*) AS cu
             FROM (SELECT unnest(l) AS w FROM d) WHERE w <> '' GROUP BY 1),
    tot AS (SELECT (sum(cu) + count(*) + 1)::DOUBLE AS denom FROM ucnt),
    bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
             SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(l) - 1),
                           i -> struct_pack(w1 := l[i], w2 := l[i+1]))) AS b
             FROM d WHERE len(l) >= 2)),
    bcnt AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
    fs AS (SELECT doc_id,
                  -ln((coalesce(cu, 0) + 1) / (SELECT denom FROM tot)) AS nll
           FROM (SELECT doc_id, l[1] AS w FROM d) f LEFT JOIN ucnt USING (w)),
    rs AS (SELECT bg.doc_id,
                  -ln(CASE WHEN bcnt.cb IS NOT NULL
                           THEN bcnt.cb / u1.cu::DOUBLE
                           ELSE 0.4 * (coalesce(u2.cu, 0) + 1)
                                / (SELECT denom FROM tot) END) AS nll
           FROM bg LEFT JOIN bcnt USING (w1, w2)
           LEFT JOIN ucnt u1 ON bg.w1 = u1.w
           LEFT JOIN ucnt u2 ON bg.w2 = u2.w),
    p AS (SELECT doc_id, count(*) AS n_tokens, avg(nll) AS avg_nll
          FROM (SELECT * FROM fs UNION ALL SELECT * FROM rs) GROUP BY 1)
    SELECT d0.doc_id, coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
           round(p.avg_nll, 6) AS avg_nll
    FROM documents d0 LEFT JOIN p USING (doc_id)
    """


def q_perplexity_buckets_documents(spark, sf_dir):
    """CCNet's head/middle/tail perplexity split over the self-trained
    unigram scores. Thresholds are explicit literals chosen ≥1.9e-4
    away from every document's avg_nll at every test scale factor —
    far beyond the last-ulp float disagreement two engines can have on
    a 100-term mean — so the bucket assignment is engine-independent.
    (The percentile_approx auto-threshold path is unit-locked.)"""
    from deepchecks_spark.pipeline.textstats import (
        perplexity_buckets, unigram_logprob)

    docs = _t(spark, sf_dir, "documents")
    scored = unigram_logprob(docs, "doc_id", "text", vocab_size=1000)
    out = perplexity_buckets(scored, "avg_nll",
                             thresholds=[3.39017, 3.42878])
    return out.select("doc_id", "ppl_bucket")


def o_perplexity_buckets_documents():
    return r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0),
    tok2 AS (SELECT * FROM tok WHERE token <> ''),
    cnt AS (SELECT token, count(*) AS c FROM tok2 GROUP BY 1),
    tot AS (SELECT sum(c) AS n_total, least(count(*), 1000) AS v_kept FROM cnt),
    sc AS (SELECT doc_id, -ln((c + 1) / (n_total + v_kept + 1)::DOUBLE) AS nll
           FROM tok2 JOIN cnt USING (token), tot),
    p AS (SELECT doc_id, avg(nll) AS avg_nll FROM sc GROUP BY 1)
    SELECT d.doc_id,
           CASE WHEN p.avg_nll IS NULL THEN NULL
                WHEN p.avg_nll <= 3.39017 THEN 'head'
                WHEN p.avg_nll <= 3.42878 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM documents d LEFT JOIN p USING (doc_id)
    """


def q_repeated_spans_documents(spark, sf_dir):
    """Exact-substring duplication (Lee et al. 2021 semantics): stride-1
    5-token windows, duplicated = content occurs ≥2× corpus-wide
    (cross-doc OR within-doc), per-doc interval-union span coverage."""
    from deepchecks_spark.pipeline.dedup import repeated_span_stats

    df = _t(spark, sf_dir, "documents")
    return repeated_span_stats(df, "doc_id", "text", window_words=5).select(
        "doc_id", "n_tokens", "n_windows", "n_dup_windows", "dup_tokens",
        F.round("dup_token_frac", 6).alias("dup_token_frac"),
    )


def o_repeated_spans_documents():
    # the oracle groups by window TEXT; the engine groups by xxhash64 of
    # the window — identical results absent a 64-bit collision. Parallel
    # unnests in one SELECT zip positionally in DuckDB.
    return r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\s+') END AS t
      FROM documents),
    base AS (SELECT doc_id, len(t) AS n_tokens,
                    greatest(len(t) - 4, 0) AS n_windows FROM toks),
    occ AS (SELECT doc_id,
                   unnest(range(greatest(len(t) - 4, 0))) AS pos,
                   unnest(list_transform(range(greatest(len(t) - 4, 0)),
                          i -> array_to_string(t[i+1:i+5], ' '))) AS w
            FROM toks),
    cnt AS (SELECT w, count(*) AS n_occ FROM occ GROUP BY 1),
    dup AS (SELECT doc_id, pos FROM occ JOIN cnt USING (w) WHERE n_occ >= 2),
    gaps AS (SELECT doc_id, pos,
                    coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                             pos + 5) - pos AS gap
             FROM dup),
    roll AS (SELECT doc_id, count(*) AS n_dup_windows,
                    sum(least(5, gap)) AS dup_tokens FROM gaps GROUP BY 1)
    SELECT b.doc_id, b.n_tokens::BIGINT AS n_tokens,
           b.n_windows::BIGINT AS n_windows,
           coalesce(r.n_dup_windows, 0)::BIGINT AS n_dup_windows,
           coalesce(r.dup_tokens, 0)::BIGINT AS dup_tokens,
           round(CASE WHEN b.n_tokens > 0
                      THEN coalesce(r.dup_tokens, 0) / b.n_tokens::DOUBLE
                      ELSE 0 END, 6) AS dup_token_frac
    FROM base b LEFT JOIN roll r USING (doc_id)
    """


def q_incremental_dedup_documents(spark, sf_dir):
    """Incremental-crawl exact dedup: the odd-doc_id half of the corpus
    arrives as a new batch and dedups against the even half (anti-join
    on xxhash64(text) — hash-only shuffles) plus within-batch min-id
    canonicalization."""
    from deepchecks_spark.pipeline.dedup import incremental_dedup

    df = _t(spark, sf_dir, "documents")
    seen = df.filter(F.col("doc_id") % 2 == 0)
    batch = df.filter(F.col("doc_id") % 2 == 1)
    return incremental_dedup(batch, seen, "doc_id", "text").select(
        "doc_id", "lang", "source")


def o_incremental_dedup_documents():
    # the oracle dedups on raw text where the engine groups by
    # xxhash64(text) — identical absent a 64-bit collision
    return r"""
    WITH seen AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
         batch AS (SELECT doc_id, lang, source, text
                   FROM documents WHERE doc_id % 2 = 1),
         fresh AS (SELECT b.* FROM batch b
                   WHERE NOT EXISTS (SELECT 1 FROM seen s
                                     WHERE s.text = b.text)),
         keep AS (SELECT doc_id, lang, source,
                         min(doc_id) OVER (PARTITION BY text) AS k
                  FROM fresh)
    SELECT doc_id, lang, source FROM keep WHERE doc_id = k
    """


def q_bloom_incremental_dedup_documents(spark, sf_dir):
    """Bloom-prefiltered incremental dedup: same semantics and oracle
    as incremental_dedup_documents, but the corpus side is never
    hash-partitioned — one map-only bloom-build pass plus a broadcast
    semi-join verification scan (pipeline/dedup.py::incremental_dedup_bloom).
    Identical output is the point: the bloom has no false negatives and
    every positive is exactly verified."""
    from deepchecks_spark.pipeline.dedup import incremental_dedup_bloom

    df = _t(spark, sf_dir, "documents")
    seen = df.filter(F.col("doc_id") % 2 == 0)
    batch = df.filter(F.col("doc_id") % 2 == 1)
    return incremental_dedup_bloom(
        batch, seen, "doc_id", "text", fpp=0.01).select(
        "doc_id", "lang", "source")


def o_bloom_incremental_dedup_documents():
    # bit-identical to the exact incremental path by construction
    return o_incremental_dedup_documents()


def q_partitioned_bloom_dedup_documents(spark, sf_dir):
    """Partitioned-bloom incremental dedup: the 10^12-scale shape (P
    hash-bucketed bitmaps cogrouped with the batch — nothing broadcast
    whole, no single bitmap in one JVM). Output provably identical to
    the exact incremental path, so the oracle is shared."""
    from deepchecks_spark.pipeline.dedup import (
        incremental_dedup_bloom_partitioned)

    df = _t(spark, sf_dir, "documents")
    seen = df.filter(F.col("doc_id") % 2 == 0)
    batch = df.filter(F.col("doc_id") % 2 == 1)
    return incremental_dedup_bloom_partitioned(
        batch, seen, "doc_id", "text", n_buckets=16, fpp=0.01).select(
        "doc_id", "lang", "source")


def o_partitioned_bloom_dedup_documents():
    return o_incremental_dedup_documents()


def q_incremental_minhash_documents(spark, sf_dir):
    """Incremental NEAR-dup dedup of a new crawl against a persisted
    corpus signature index (pipeline/dedup.py::
    incremental_minhash_candidates, broadcast_batch scale path: the
    corpus side is never shuffle-joined). Split on (doc_id div 10) % 2
    so the planted-duplicate groups (doc_id ≡ 7 mod 10) land on BOTH
    sides; every batch planted doc has identical text to some corpus
    doc ⇒ identical signature ⇒ every band collides and est_jaccard is
    exactly 1 ≥ 0.999 — recall is 1 by construction. Output restricted
    to text-equal pairs, which DuckDB reproduces with a plain join."""
    from deepchecks_spark.pipeline.dedup import (
        incremental_minhash_candidates,
        minhash_signatures,
    )

    docs = _planted_docs(spark, sf_dir)
    half = (F.col("doc_id") / 10).cast("long") % 2
    corpus = docs.filter(half == 0)
    batch = docs.filter(half == 1)
    sigs = minhash_signatures(corpus, "doc_id", "text")
    cand = incremental_minhash_candidates(
        batch, sigs, "doc_id", "text", threshold=0.999, broadcast_batch=True)
    bt = batch.select(F.col("doc_id").alias("batch_id"), F.col("text").alias("__tb"))
    ct = corpus.select(F.col("doc_id").alias("corpus_id"), F.col("text").alias("__tc"))
    return (
        cand.join(bt, "batch_id").join(ct, "corpus_id")
        .filter(F.col("__tb") == F.col("__tc"))
        .select("batch_id", "corpus_id")
    )


def o_incremental_minhash_documents():
    return f"""
    WITH d AS (SELECT doc_id, {_DUCK_PLANTED_DUP} AS text FROM documents),
         c AS (SELECT doc_id, text FROM d WHERE (doc_id // 10) % 2 = 0),
         b AS (SELECT doc_id, text FROM d WHERE (doc_id // 10) % 2 = 1)
    SELECT b.doc_id::BIGINT AS batch_id, c.doc_id::BIGINT AS corpus_id
    FROM b JOIN c ON b.text = c.text
    """


# planted multilingual rewrite for the script-mix oracle: the synthetic
# documents table is all-ASCII, so docs are rewritten per doc_id mod 5 —
# pure Cyrillic, pure CJK, Latin-with-Cyrillic-homoglyphs (the spam
# shape), and untouched Latin — making every script counter non-vacuous.
# DuckDB recounts every class with its own RE2 regexps (utf8proc code
# points), independently of Spark's Java-regex counts.
_SPARK_PLANTED_SCRIPTS = (
    "CASE CAST(doc_id % 5 AS INT) "
    "WHEN 1 THEN concat('привет мир данные поток номер ', CAST(doc_id % 3 AS STRING)) "
    "WHEN 2 THEN concat('数据流处理引擎测试第', CAST(doc_id % 3 AS STRING), '批') "
    "WHEN 3 THEN concat('pаypal sеcure login page ', CAST(doc_id % 3 AS STRING)) "
    "ELSE text END"
)
_DUCK_PLANTED_SCRIPTS = (
    "CASE doc_id % 5 "
    "WHEN 1 THEN 'привет мир данные поток номер ' || CAST(doc_id % 3 AS VARCHAR) "
    "WHEN 2 THEN '数据流处理引擎测试第' || CAST(doc_id % 3 AS VARCHAR) || '批' "
    "WHEN 3 THEN 'pаypal sеcure login page ' || CAST(doc_id % 3 AS VARCHAR) "
    "ELSE text END"
)


def q_streaming_neardup_documents(spark, sf_dir):
    """Streaming near-dup monitor (streaming.py::StreamingNearDupMonitor)
    drained over the planted-duplicate docs in two micro-batches, then
    summed over epochs — totals are BATCH-ORDER INDEPENDENT: at
    threshold 0.999 on the planted corpus (identical text ⇔ identical
    signature; cross-group planted Jaccard ≈ 0.7 makes a 64/64
    signature agreement ~0.7^64), the final index holds exactly one
    representative per distinct text, so Σ n_fresh = #distinct texts
    and Σ n_flagged = n_rows − #distinct texts no matter how the file
    source slices the epochs."""
    import hashlib
    import os
    import shutil
    import tempfile

    from deepchecks_spark.streaming import StreamingNearDupMonitor

    docs = _planted_docs(spark, sf_dir).filter("doc_id % 10 = 7")
    stage_dir = ("/tmp/spark_graft_stream/neardup_"
                 + hashlib.md5(sf_dir.encode()).hexdigest()[:8])
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        docs.repartition(2).write.mode("overwrite").parquet(stage_dir)
    sink = tempfile.mkdtemp(prefix="neardup_entry_sink_")
    try:
        mon = StreamingNearDupMonitor(state_path=sink, threshold=0.999)
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(stage_dir))
        q = mon.start(stream, "doc_id", "text")
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    n_rows = sum(v["n_rows"] for v in mon.counts.values())
    n_flagged = sum(v["n_flagged"] for v in mon.counts.values())
    n_fresh = sum(v["n_fresh"] for v in mon.counts.values())
    return spark.createDataFrame(
        [(n_rows, n_flagged, n_fresh)],
        "n_rows long, n_flagged long, n_fresh long")


def o_streaming_neardup_documents():
    return f"""
    WITH d AS (SELECT doc_id, {_DUCK_PLANTED_DUP} AS text FROM documents
               WHERE doc_id % 10 = 7)
    SELECT count(*)::BIGINT AS n_rows,
           (count(*) - count(DISTINCT text))::BIGINT AS n_flagged,
           count(DISTINCT text)::BIGINT AS n_fresh
    FROM d
    """


def q_bpe_pairs_documents(spark, sf_dir):
    """BPE iteration-0 statistics (pipeline/bpe.py::char_pair_counts):
    corpus-weighted adjacent-character pair counts over the capped
    word-type table — the statistic the first merge of distributed BPE
    training maximizes. Top 30 by (count desc, a, b), a total order,
    so the LIMIT is deterministic cross-engine. The pair explode runs
    on the type table (thousands of rows), never the corpus."""
    from deepchecks_spark.pipeline.bpe import char_pair_counts

    docs = _t(spark, sf_dir, "documents")
    return char_pair_counts(docs, "text", top_k=30)


def o_bpe_pairs_documents():
    return r"""
    WITH words AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
                   FROM documents),
         wf0 AS (SELECT w, count(*)::BIGINT AS f FROM words WHERE w <> ''
                 GROUP BY w ORDER BY f DESC, w ASC LIMIT 100000),
         syms AS (SELECT w, f, list_append(string_split(w, ''), '</w>') AS s
                  FROM wf0),
         pairs AS (SELECT s[i] AS a, s[i+1] AS b, f
                   FROM syms, unnest(generate_series(1, len(s)-1)) AS t(i))
    SELECT a, b, sum(f)::BIGINT AS pair_count
    FROM pairs GROUP BY a, b
    ORDER BY pair_count DESC, a, b LIMIT 30
    """


def q_language_agreement_documents(spark, sf_dir):
    """Declared-vs-detected language confusion table
    (pipeline/textstats.py::language_agreement — zero-shuffle
    language_id projection + one bounded groupBy). The oracle
    re-implements the marker-intersection argmax in plain SQL,
    generated from the same LANG_MARKERS table with the identical
    (score desc, lang asc) tie-break."""
    from deepchecks_spark.pipeline.textstats import language_agreement

    docs = _t(spark, sf_dir, "documents")
    return language_agreement(docs, "lang", "text")


def o_language_agreement_documents():
    from deepchecks_spark.pipeline.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)

    def lit(words):
        return "[" + ", ".join(f"'{w}'" for w in words) + "]"

    scores = ",\n             ".join(
        f"len(list_intersect(toks, {lit(LANG_MARKERS[lg])})) AS s_{lg}"
        for lg in langs)
    m = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = ("CASE WHEN " + m + " = 0 THEN 'unknown' "
            + " ".join(f"WHEN s_{lg} = {m} THEN '{lg}'" for lg in langs)
            + " END")
    return f"""
    WITH toks AS (SELECT lang,
                    list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
                  FROM documents),
         s AS (SELECT lang,
             {scores}
               FROM toks)
    SELECT lang, {case} AS lang_pred, count(*)::BIGINT AS n_docs
    FROM s GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """


def q_neardup_precision_documents(spark, sf_dir):
    """Deterministic candidate-precision audit (pipeline/dedup.py::
    neardup_precision_sample): a SQL-expressible candidate list (all
    adjacent doc_id pairs) sampled to its 200 smallest-md5 pairs and
    verified with the exact shingle Jaccard — DuckDB reproduces the
    md5 sampling order, the limit, and the Jaccard arithmetic."""
    from deepchecks_spark.pipeline.dedup import neardup_precision_sample

    docs = _t(spark, sf_dir, "documents")
    ids = docs.select("doc_id")
    pairs = (ids.selectExpr("doc_id AS id_a", "doc_id + 1 AS id_b")
             .join(ids.selectExpr("doc_id AS id_b"), "id_b"))
    return neardup_precision_sample(pairs, docs, "doc_id", "text", n=200)


def o_neardup_precision_documents():
    return r"""
    WITH ids AS (SELECT doc_id FROM documents),
         pairs AS (SELECT a.doc_id AS id_a, a.doc_id + 1 AS id_b
                   FROM ids a JOIN ids b ON b.doc_id = a.doc_id + 1),
         sampled AS (SELECT id_a, id_b FROM pairs
                     ORDER BY md5(CAST(id_a AS VARCHAR) || ',' ||
                                  CAST(id_b AS VARCHAR)), id_a, id_b
                     LIMIT 200),
         toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t
                  FROM documents),
         sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
                  list_distinct(list_transform(generate_series(1, len(t) - 2),
                                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [array_to_string(t, ' ')] END s FROM toks)
    SELECT p.id_a, p.id_b,
           round(len(list_intersect(a.s, b.s))
                 / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE, 6)
             AS jaccard
    FROM sampled p JOIN sh a ON a.doc_id = p.id_a
                   JOIN sh b ON b.doc_id = p.id_b
    """


def q_bpe_fertility_documents(spark, sf_dir):
    """Per-language tokenizer fertility (pipeline/bpe.py::bpe_fertility)
    under the char-level baseline (merges=[]) where every word costs
    len(word)+1 symbols — the closed form DuckDB recomputes exactly,
    proving the Arrow-batched encoder's word segmentation and the
    grouped roll-up; the trained-merges path is locked by the encoder
    unit tests (canonical Sennrich fixture, roundtrip, monotone
    fertility drop)."""
    from deepchecks_spark.pipeline.bpe import bpe_fertility

    docs = _t(spark, sf_dir, "documents")
    return bpe_fertility(docs, "text", "lang", merges=[]).orderBy("lang")


def o_bpe_fertility_documents():
    return r"""
    WITH t AS (SELECT lang,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END AS nw,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                      ELSE list_sum(list_transform(
                             string_split_regex(trim(text), '\s+'),
                             w -> length(w) + 1)) END AS ns
               FROM documents)
    SELECT lang, count(*)::BIGINT AS n_docs, sum(nw)::BIGINT AS n_words,
           sum(ns)::BIGINT AS n_subwords,
           CASE WHEN sum(nw) > 0
                THEN round(sum(ns) / sum(nw)::DOUBLE, 6) END AS fertility
    FROM t GROUP BY lang ORDER BY lang
    """


def q_script_profile_documents(spark, sf_dir):
    """Unicode script-mix profile (pipeline/textstats.py::script_profile
    — shuffle-free per-row projection, plan-pinned) over a planted
    multilingual corpus, rolled up by dominant script: doc counts,
    mixed-script (homoglyph-spam) counts, and per-script character
    totals. DuckDB reproduces every count from its own regexp engine
    and the argmax/threshold logic in plain SQL."""
    from deepchecks_spark.pipeline.textstats import script_profile

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_SPARK_PLANTED_SCRIPTS} AS text")
    prof = script_profile(docs, "text")
    return (
        prof.groupBy("main_script")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.col("mixed_script").cast("long")).alias("n_mixed"),
             F.sum("n_latin").alias("latin_chars"),
             F.sum("n_cyrillic").alias("cyrillic_chars"),
             F.sum("n_cjk").alias("cjk_chars"))
        .orderBy("main_script")
    )


def o_script_profile_documents():
    return f"""
    WITH d AS (SELECT doc_id, {_DUCK_PLANTED_SCRIPTS} AS text FROM documents),
         p AS (SELECT doc_id,
                 length(regexp_replace(text, '[^A-Za-z\\x{{00C0}}-\\x{{024F}}]', '', 'g')) AS n_latin,
                 length(regexp_replace(text, '[^\\x{{0400}}-\\x{{04FF}}]', '', 'g')) AS n_cyr,
                 length(regexp_replace(text, '[^\\x{{4E00}}-\\x{{9FFF}}]', '', 'g')) AS n_cjk
               FROM d),
         m AS (SELECT doc_id, n_latin, n_cyr, n_cjk,
                 n_latin + n_cyr + n_cjk AS total,
                 CASE WHEN n_latin + n_cyr + n_cjk = 0 THEN 'none'
                      WHEN n_cjk >= n_cyr AND n_cjk >= n_latin THEN 'cjk'
                      WHEN n_cyr >= n_latin THEN 'cyrillic'
                      ELSE 'latin' END AS main_script,
                 (n_latin >= greatest(1, floor(0.05 * (n_latin + n_cyr + n_cjk))::BIGINT))::INT
                 + (n_cyr >= greatest(1, floor(0.05 * (n_latin + n_cyr + n_cjk))::BIGINT))::INT
                 + (n_cjk >= greatest(1, floor(0.05 * (n_latin + n_cyr + n_cjk))::BIGINT))::INT
                 AS n_scripts
               FROM p)
    SELECT main_script,
           count(*)::BIGINT AS n_docs,
           sum((n_scripts >= 2)::BIGINT)::BIGINT AS n_mixed,
           sum(n_latin)::BIGINT AS latin_chars,
           sum(n_cyr)::BIGINT AS cyrillic_chars,
           sum(n_cjk)::BIGINT AS cjk_chars
    FROM m GROUP BY main_script ORDER BY main_script
    """


def q_group_split_documents(spark, sf_dir):
    """Leakage-safe group-granular train/test split: every document of
    a source lands on one side (GroupShuffleSplit semantics —
    pipeline/webclean.py::split_by_group), assignment a deterministic
    md5 function of (group, seed) that the oracle recomputes verbatim.
    Returns per-(source, split) counts; the leakage property shows as
    exactly ONE split value per source."""
    from deepchecks_spark.pipeline.webclean import split_by_group

    df = _t(spark, sf_dir, "documents")
    out = split_by_group(df, "source", 0.3, seed=7)
    return (out.groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("source", "split"))


def o_group_split_documents():
    # verbatim md5-prefix arithmetic twin of split_by_group
    return r"""
    WITH s AS (
      SELECT source,
             CASE WHEN ('0x' || substring(
                          md5(concat(coalesce(CAST(source AS VARCHAR),
                                              '__NULL__'), ':7')),
                          1, 7))::BIGINT / 268435456.0 < 0.3
                  THEN 'test' ELSE 'train' END AS split
      FROM documents)
    SELECT source, split, count(*)::BIGINT AS n_docs
    FROM s GROUP BY source, split ORDER BY source, split
    """


def q_mixture_sampling_documents(spark, sf_dir):
    """DoReMi-style corpus resampling toward a target language mixture:
    en downsampled (w=0.5), de upsampled by replication (w=2.25), fr
    kept (w=1.0), es/zh dropped. Every keep/replicate decision is a
    deterministic Knuth-hash function of (doc_id, seed) — zero shuffle,
    exactly reproducible across engines."""
    from deepchecks_spark.pipeline.webclean import sample_to_mixture

    df = _t(spark, sf_dir, "documents")
    out = sample_to_mixture(df, "lang", "doc_id",
                            {"en": 0.5, "de": 2.25, "fr": 1.0}, seed=7)
    return out.select("doc_id", "lang", F.col("copy").cast("int").alias("copy"))


def o_mixture_sampling_documents():
    # verbatim re-derivation of the engine's Knuth multiplicative hash:
    # u = ((doc_id mod 2^31) * 2654435761 + seed) mod 2^32 / 2^32;
    # copies = floor(w) + (u < frac(w)); weights chosen binary-exact
    return r"""
    WITH base AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 2.25
                       WHEN 'fr' THEN 1.0 ELSE 0.0 END AS wt,
             (((doc_id % 2147483648) * 2654435761 + 7) % 4294967296)
               / 4294967296.0 AS u
      FROM documents),
    cnt AS (
      SELECT doc_id, lang,
             (floor(wt) + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END)::INT
               AS n
      FROM base)
    SELECT doc_id, lang, unnest(range(n))::INT AS copy
    FROM cnt WHERE n > 0
    """


def q_pack_sequences_documents(spark, sf_dir):
    """GPT-style sequence packing: concat documents in doc_id order and
    cut at 512 whitespace tokens; per-doc global offset + covered
    sequence range via a distributed prefix scan (per-partition partials
    + broadcast prefix — no single-task global window)."""
    from deepchecks_spark.pipeline.packing import pack_sequences

    df = _t(spark, sf_dir, "documents")
    return pack_sequences(df, "doc_id", "text", seq_len=512)


def o_pack_sequences_documents():
    return r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      FROM documents),
    cum AS (
      SELECT doc_id, n,
             coalesce(sum(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS s
      FROM toks)
    SELECT doc_id, n::BIGINT AS n_tokens, s::BIGINT AS start_offset,
           (s // 512)::BIGINT AS first_seq,
           ((s + greatest(n - 1, 0)) // 512)::BIGINT AS last_seq
    FROM cum
    """


def q_token_shards_documents(spark, sf_dir):
    """Token-balanced contiguous shard assignment: the corpus is cut
    into 8 output shards of ~equal TOKEN mass (not row count) in doc_id
    order, documents never split — the "write N balanced training
    shards" step. Same distributed prefix scan as pack_sequences
    (pipeline/packing.py::assign_token_shards)."""
    from deepchecks_spark.pipeline.packing import assign_token_shards

    df = _t(spark, sf_dir, "documents")
    return assign_token_shards(df, "doc_id", "text", n_shards=8)


def o_token_shards_documents():
    # same double arithmetic as the engine: shard =
    # least(floor(start / total * 8), 7)
    return r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      FROM documents),
    cum AS (
      SELECT doc_id, n,
             coalesce(sum(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS s,
             sum(n) OVER () AS total
      FROM toks)
    SELECT doc_id, n::BIGINT AS n_tokens, s::BIGINT AS start_offset,
           least(floor(s / total::DOUBLE * 8), 7)::INT AS shard
    FROM cum
    """


def q_dsir_resample_documents(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023): hashed unigram+
    bigram bag-of-ngrams models on a target slice (source = 'src1') vs
    the full raw corpus, per-doc log importance ratio, Gumbel-top-k
    selection of 25 documents without replacement. Every stage is a
    deterministic md5-arithmetic function the oracle recomputes
    verbatim (pipeline/dsir.py)."""
    from deepchecks_spark.pipeline.dsir import dsir_resample

    df = _t(spark, sf_dir, "documents")
    target = df.filter(F.col("source") == "src1")
    out = dsir_resample(df, target, "doc_id", "text", k=25,
                        n_buckets=1000, seed=7)
    return out.select(
        "doc_id", "n_grams",
        F.round("log_weight", 6).alias("log_weight"),
        F.round("sample_key", 6).alias("sample_key"),
    ).orderBy(F.col("sample_key").desc(), F.col("doc_id").asc())


def o_dsir_resample_documents():
    # verbatim md5-arithmetic twin of pipeline/dsir.py: bucket =
    # md5-prefix(gram) % 1000; Laplace p(b) = (c+1)/(N+1000) on both
    # corpora; gumbel = -ln(-ln((md5-prefix(id ':' 7) + .5)/16^7))
    return r"""
    WITH toks AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\s+') END AS t
      FROM documents),
    g AS (
      SELECT doc_id, source,
             list_concat(t, CASE WHEN len(t) >= 2
                  THEN list_transform(range(1, len(t)),
                       i -> array_to_string(t[i:i+1], ' '))
                  ELSE [] END) AS grams
      FROM toks),
    rb AS (SELECT doc_id,
                  ('0x' || substring(md5(unnest(grams)), 1, 7))::BIGINT % 1000 AS bp
           FROM g),
    tb AS (SELECT ('0x' || substring(md5(unnest(grams)), 1, 7))::BIGINT % 1000 AS bp
           FROM g WHERE source = 'src1'),
    rc AS (SELECT bp, count(*) AS c FROM rb GROUP BY 1),
    tc AS (SELECT bp, count(*) AS c FROM tb GROUP BY 1),
    tot AS (SELECT (SELECT sum(c) FROM rc) AS nr, (SELECT sum(c) FROM tc) AS nt),
    w AS (SELECT rc.bp,
                 ln((coalesce(tc.c, 0) + 1) / (tot.nt + 1000.0))
                 - ln((rc.c + 1) / (tot.nr + 1000.0)) AS w
          FROM rc LEFT JOIN tc USING (bp) CROSS JOIN tot),
    score AS (SELECT rb.doc_id, count(*) AS n_grams, sum(w.w) AS lw
              FROM rb JOIN w USING (bp) GROUP BY 1),
    keyed AS (
      SELECT doc_id, n_grams, lw,
             lw + (-ln(-ln(
               (('0x' || substring(md5(doc_id::VARCHAR || ':7'), 1, 7))::BIGINT
                + 0.5) / 268435456.0))) AS k
      FROM score)
    SELECT doc_id, n_grams::BIGINT AS n_grams,
           round(lw, 6) AS log_weight, round(k, 6) AS sample_key
    FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 25
    """


def q_rebalance_classes_documents(spark, sf_dir):
    """Class-rebalancing resample (the acting half of ClassImbalance):
    every lang class resampled toward the minority-class count via the
    deterministic Knuth-hash Bernoulli/replication of sample_to_mixture,
    but with the weight table computed distributed (no driver collect)
    and joined back null-safely (pipeline/webclean.py::rebalance_classes).
    Returns the surviving (doc_id, lang, copy) rows."""
    from deepchecks_spark.pipeline.webclean import rebalance_classes

    df = _t(spark, sf_dir, "documents")
    out = rebalance_classes(df, "lang", "doc_id", seed=7)
    return (out.select("doc_id", "lang", F.col("copy").cast("int").alias("copy"))
            .orderBy("doc_id", "copy"))


def o_rebalance_classes_documents():
    # verbatim twin: w = min_class_count / class_count (IEEE double
    # division — bit-identical on both engines), u = Knuth hash of
    # (doc_id, 7), copies = floor(w) + (u < w - floor(w))
    return r"""
    WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
    mn AS (SELECT min(c) AS m FROM cnt),
    base AS (
      SELECT d.doc_id, d.lang, mn.m / cnt.c::DOUBLE AS wt,
             (((d.doc_id % 2147483648) * 2654435761 + 7) % 4294967296)
               / 4294967296.0 AS u
      FROM documents d
      JOIN cnt ON cnt.lang IS NOT DISTINCT FROM d.lang CROSS JOIN mn),
    n AS (SELECT doc_id, lang,
                 (floor(wt) + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END)::INT
                   AS nc
          FROM base)
    SELECT doc_id, lang, unnest(range(nc))::INT AS copy
    FROM n WHERE nc > 0 ORDER BY doc_id, copy
    """


def q_embedding_integrity_embeddings(spark, sf_dir):
    """Embedding-column integrity profile: one distributive pass over a
    corpus with deterministically planted defects (NULL vector at
    vec_id%97=0, empty at %89=0, NaN component at %83=0, zero-norm at
    %79=0 — both engines derive the same input from the parquet), so
    every counter in the profile is exercised non-vacuously
    (pipeline/similarity.py::embedding_integrity_stats)."""
    from deepchecks_spark.pipeline.similarity import embedding_integrity_stats

    df = _t(spark, sf_dir, "embeddings")
    vid = F.col("vec_id")
    planted = df.select(
        F.when(vid % 97 == 0, F.lit(None).cast("array<double>"))
        .when(vid % 89 == 0, F.array().cast("array<double>"))
        .when(vid % 83 == 0, F.array(F.lit(float("nan"))))
        .when(vid % 79 == 0, F.array_repeat(F.lit(0.0), 4))
        .otherwise(F.col("embedding").cast("array<double>"))
        .alias("embedding"))
    out = embedding_integrity_stats(planted, "embedding")
    return out.select(
        "n_rows", "n_null", "n_empty", "n_nan", "n_zero_norm",
        "min_dim", "max_dim", "dims_consistent",
        F.round("avg_norm", 6).alias("avg_norm"),
        F.round("min_norm", 6).alias("min_norm"),
        F.round("max_norm", 6).alias("max_norm"),
    )


def o_embedding_integrity_embeddings():
    # same planted-defect derivation, then the profile in SQL; "clean"
    # rows = non-null, non-NaN, non-empty — exactly the engine's gate
    return r"""
    WITH planted AS (
      SELECT CASE WHEN vec_id % 97 = 0 THEN NULL
                  WHEN vec_id % 89 = 0 THEN []::DOUBLE[]
                  WHEN vec_id % 83 = 0 THEN ['NaN'::DOUBLE]
                  WHEN vec_id % 79 = 0 THEN [0.0, 0.0, 0.0, 0.0]
                  ELSE embedding::DOUBLE[] END AS e
      FROM embeddings),
    per AS (
      SELECT e, len(e) AS dim,
             len(list_filter(e, x -> isnan(x))) > 0 AS has_nan,
             sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
      FROM planted),
    flag AS (
      SELECT *, (e IS NOT NULL AND NOT coalesce(has_nan, FALSE)
                 AND dim > 0) AS clean
      FROM per)
    SELECT count(*)::BIGINT AS n_rows,
           sum(CASE WHEN e IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           sum(CASE WHEN e IS NOT NULL AND dim = 0 THEN 1 ELSE 0 END)::BIGINT AS n_empty,
           sum(CASE WHEN coalesce(has_nan, FALSE) THEN 1 ELSE 0 END)::BIGINT AS n_nan,
           sum(CASE WHEN clean AND nrm = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_norm,
           min(CASE WHEN e IS NOT NULL THEN dim END)::INT AS min_dim,
           max(CASE WHEN e IS NOT NULL THEN dim END)::INT AS max_dim,
           (min(CASE WHEN e IS NOT NULL THEN dim END)
            = max(CASE WHEN e IS NOT NULL THEN dim END)) AS dims_consistent,
           round(avg(CASE WHEN clean THEN nrm END), 6) AS avg_norm,
           round(min(CASE WHEN clean THEN nrm END), 6) AS min_norm,
           round(max(CASE WHEN clean THEN nrm END), 6) AS max_norm
    FROM flag
    """


# ---------------------------------------------------------------------------
# round-5 late additions: semantic decontamination, vocabulary stats,
# corpus snapshot drift
# ---------------------------------------------------------------------------

def q_semantic_decontam_embeddings(spark, sf_dir):
    """Embedding-space benchmark decontamination: bench = vec_id < 20
    (gated + broadcast), corpus = vec_id >= 20 plus ONE planted exact
    copy of bench vector 5 (id 999005). With threshold just under 1.0
    only the planted copy flags (random cosines stay far below), and the
    argmax bench id is cross-engine stable because the fixture's cosines
    are continuous (no ties). Floats are excluded from the compared
    columns — the argmax id + flag are the stable outputs."""
    from deepchecks_spark.pipeline.decontam import semantic_decontamination

    df = _t(spark, sf_dir, "embeddings")
    bench = df.filter(F.col("vec_id") < 20).select("vec_id", "embedding")
    planted = df.filter(F.col("vec_id") == 5).select(
        (F.col("vec_id") + 999_000).alias("vec_id"), "embedding")
    corpus = (df.filter(F.col("vec_id") >= 20)
              .select("vec_id", "embedding").unionByName(planted))
    out = semantic_decontamination(
        corpus, bench, "vec_id", "embedding", threshold=0.999999)
    return out.select("vec_id", "nearest_bench_id", "is_contaminated")


def o_semantic_decontam_embeddings():
    return """
    WITH bench AS (SELECT vec_id bid, embedding::DOUBLE[] e FROM embeddings WHERE vec_id < 20),
         corpus AS (SELECT vec_id id, embedding::DOUBLE[] e FROM embeddings WHERE vec_id >= 20
                    UNION ALL
                    SELECT vec_id + 999000, embedding::DOUBLE[] FROM embeddings WHERE vec_id = 5),
         sims AS (SELECT c.id, b.bid, list_cosine_similarity(c.e, b.e) s
                  FROM corpus c CROSS JOIN bench b),
         best AS (SELECT id, bid, s,
                         row_number() OVER (PARTITION BY id ORDER BY s DESC, bid ASC) r
                  FROM sims)
    SELECT id::BIGINT AS vec_id, bid::BIGINT AS nearest_bench_id,
           (s >= 0.999999) AS is_contaminated
    FROM best WHERE r = 1
    """


def q_vocabulary_stats_documents(spark, sf_dir):
    """Corpus vocabulary summary: one explode + map-side-combined
    groupBy(token), then one agg over the O(|vocab|) type table."""
    from deepchecks_spark.pipeline.textstats import vocabulary_stats

    out = vocabulary_stats(_t(spark, sf_dir, "documents"), "text")
    return out.select(
        "total_tokens", "n_types", "hapax_types",
        F.round("type_token_ratio", 6).alias("type_token_ratio"),
        F.round("hapax_frac", 6).alias("hapax_frac"),
    )


def o_vocabulary_stats_documents():
    return r"""
    WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) tok
                  FROM documents WHERE length(trim(text)) > 0),
         types AS (SELECT tok, count(*) n FROM toks GROUP BY tok)
    SELECT sum(n)::BIGINT AS total_tokens,
           count(*)::BIGINT AS n_types,
           sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax_types,
           round(count(*) / sum(n)::double, 6) AS type_token_ratio,
           round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) / count(*)::double, 6) AS hapax_frac
    FROM types
    """


def q_top_terms_documents(spark, sf_dir):
    """Top-20 corpus terms, deterministic (count desc, term asc);
    TakeOrderedAndProject — never a global vocabulary sort."""
    from deepchecks_spark.pipeline.textstats import top_terms

    return top_terms(_t(spark, sf_dir, "documents"), "text", k=20)


def o_top_terms_documents():
    return r"""
    WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) term
                  FROM documents WHERE length(trim(text)) > 0),
         counts AS (SELECT term, count(*)::BIGINT n FROM toks GROUP BY term),
         ranked AS (SELECT term, n,
                           row_number() OVER (ORDER BY n DESC, term ASC)::BIGINT rank
                    FROM counts)
    SELECT term, n, rank FROM ranked WHERE rank <= 20
    """


def q_corpus_drift_documents(spark, sf_dir):
    """Crawl-over-crawl corpus drift: the two doc_id-parity halves stand
    in for two snapshots of the same web corpus; PSI on the language
    distribution + bias-corrected Cramér's V on the source distribution —
    the exact kernels FeatureDrift uses, over one categorical-histogram
    pass per side."""
    from deepchecks_spark.drift import cramers_v_from_counts, psi_from_counts
    from deepchecks_spark.drift.spark import categorical_histograms

    df = _t(spark, sf_dir, "documents")
    a = df.filter(F.col("doc_id") % 2 == 0)
    b = df.filter(F.col("doc_id") % 2 == 1)
    ha = categorical_histograms(a, ["lang", "source"])
    hb = categorical_histograms(b, ["lang", "source"])
    rows = [
        ("lang", "psi", round(float(psi_from_counts(
            ha["lang"], hb["lang"], min_category_size_ratio=0.01)), 6)),
        # ratio 0.0 (the reference default): source categories exist in
        # only ONE parity half, so any nonzero ratio would Other-bin the
        # absent side and change k — the SQL twin is the unbinned formula
        ("source", "cramers_v", round(float(cramers_v_from_counts(
            ha["source"], hb["source"], min_category_size_ratio=0.0)), 6)),
    ]
    return spark.createDataFrame(rows, "column string, metric string, score double")


def o_corpus_drift_documents():
    # lang: 5 categories, each >=12% of rows -> no Other-binning at the
    # 0.01 ratio; PSI floor 0.01 applied as in o_psi_orders_priority.
    psi_sql = """
    SELECT 'lang' AS column, 'psi' AS metric, round(sum((e - a) * ln(e / a)), 6) AS score
    FROM (SELECT greatest(n1 / (SELECT sum(n1)::double FROM j), 0.01) e,
                 greatest(n2 / (SELECT sum(n2)::double FROM j), 0.01) a
          FROM j)
    """
    psi = """
    WITH train AS (SELECT lang v FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL),
         test  AS (SELECT lang v FROM documents WHERE doc_id % 2 = 1 AND lang IS NOT NULL),
         c1 AS (SELECT v, count(*) n FROM train GROUP BY v),
         c2 AS (SELECT v, count(*) n FROM test GROUP BY v),
         j AS (SELECT coalesce(c1.v, c2.v) v, coalesce(c1.n, 0) n1, coalesce(c2.n, 0) n2
               FROM c1 FULL OUTER JOIN c2 ON c1.v = c2.v)
    """ + psi_sql
    cramers = _cramers_sql(
        "documents", "source", "doc_id", out_name="score",
        extra_select="'source' AS column, 'cramers_v' AS metric")
    return f"SELECT * FROM ({psi}) UNION ALL SELECT * FROM ({cramers})"


def q_constraints_orders(spark, sf_dir):
    """Declarative schema/constraint contract over orders: all row-local
    rules in ONE fused Expand-free agg, uniqueness in one separate
    distinct agg, metadata rules driver-side."""
    from deepchecks_spark.checks.constraints import (
        has_column, has_dtype, in_range, in_set, matches_regex, min_rows,
        not_in_set, not_null, unique, validate_constraints)

    df = _t(spark, sf_dir, "orders")
    cons = [
        not_null("o_custkey"),
        unique("o_orderkey"),
        unique(["o_orderkey", "o_custkey"]),   # composite key
        in_range("o_totalprice", 0.0, 100_000.0),
        in_set("o_orderstatus", ["O", "F", "P"]),
        not_in_set("o_orderpriority", ["5-LOW"]),  # deny-list
        matches_regex("o_orderpriority", r"[1-5]-[A-Z ]+"),
        has_column("o_orderdate"),
        has_column("o_missing_col"),
        min_rows(100),
    ]
    return validate_constraints(df, cons)


def o_constraints_orders():
    return """
    WITH n AS (SELECT count(*) c FROM orders)
    SELECT 'not_null' AS constraint, 'o_custkey' AS column,
           count(*) FILTER (o_custkey IS NULL)::BIGINT AS n_violations,
           round(count(*) FILTER (o_custkey IS NULL) / (SELECT c FROM n)::double, 6) AS violation_frac,
           count(*) FILTER (o_custkey IS NULL) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'unique', 'o_orderkey',
           (count(o_orderkey) - count(DISTINCT o_orderkey))::BIGINT,
           round((count(o_orderkey) - count(DISTINCT o_orderkey)) / (SELECT c FROM n)::double, 6),
           count(o_orderkey) = count(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'unique', 'o_orderkey,o_custkey',
           (count(*) FILTER (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL)
            - count(DISTINCT (o_orderkey, o_custkey)
                    ) FILTER (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL))::BIGINT,
           round((count(*) FILTER (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL)
            - count(DISTINCT (o_orderkey, o_custkey)
                    ) FILTER (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL)) / (SELECT c FROM n)::double, 6),
           count(*) FILTER (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL)
            = count(DISTINCT (o_orderkey, o_custkey)) FILTER (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL)
    FROM orders
    UNION ALL
    SELECT 'not_in_set[1 values]', 'o_orderpriority',
           count(*) FILTER (o_orderpriority = '5-LOW')::BIGINT,
           round(count(*) FILTER (o_orderpriority = '5-LOW') / (SELECT c FROM n)::double, 6),
           count(*) FILTER (o_orderpriority = '5-LOW') = 0
    FROM orders
    UNION ALL
    SELECT 'in_range[0.0, 100000.0]', 'o_totalprice',
           count(*) FILTER (o_totalprice < 0.0 OR o_totalprice > 100000.0)::BIGINT,
           round(count(*) FILTER (o_totalprice < 0.0 OR o_totalprice > 100000.0) / (SELECT c FROM n)::double, 6),
           count(*) FILTER (o_totalprice < 0.0 OR o_totalprice > 100000.0) = 0
    FROM orders
    UNION ALL
    SELECT 'in_set[3 values]', 'o_orderstatus',
           count(*) FILTER (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P'))::BIGINT,
           round(count(*) FILTER (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')) / (SELECT c FROM n)::double, 6),
           count(*) FILTER (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')) = 0
    FROM orders
    UNION ALL
    SELECT 'matches_regex[[1-5]-[A-Z ]+]', 'o_orderpriority',
           count(*) FILTER (o_orderpriority IS NOT NULL AND NOT regexp_full_match(o_orderpriority, '(?:[1-5]-[A-Z ]+)'))::BIGINT,
           round(count(*) FILTER (o_orderpriority IS NOT NULL AND NOT regexp_full_match(o_orderpriority, '(?:[1-5]-[A-Z ]+)')) / (SELECT c FROM n)::double, 6),
           count(*) FILTER (o_orderpriority IS NOT NULL AND NOT regexp_full_match(o_orderpriority, '(?:[1-5]-[A-Z ]+)')) = 0
    FROM orders
    UNION ALL
    SELECT 'has_column', 'o_orderdate', 0::BIGINT, 0.0, true
    UNION ALL
    SELECT 'has_column', 'o_missing_col', 1::BIGINT, 1.0, false
    UNION ALL
    SELECT 'min_rows[100]', NULL,
           CASE WHEN (SELECT c FROM n) >= 100 THEN 0 ELSE 1 END::BIGINT,
           CASE WHEN (SELECT c FROM n) >= 100 THEN 0.0 ELSE 1.0 END,
           (SELECT c FROM n) >= 100
    """


def q_constraint_examples_orders(spark, sf_dir):
    """Deterministic offending-row examples per constraint: the 5
    smallest-o_orderkey violators of each rule (two-stage top-k —
    shuffle bounded at k x partitions per constraint). String columns
    only, so the value strings are cross-engine byte-identical."""
    from deepchecks_spark.checks.constraints import (
        in_set, matches_regex, violation_examples)

    df = _t(spark, sf_dir, "orders")
    cons = [
        in_set("o_orderstatus", ["O", "F"]),          # 'P' rows violate
        in_set("o_orderpriority", ["1-URGENT", "2-HIGH"]),
        matches_regex("o_orderpriority", r"[12]-[A-Z ]+"),
    ]
    return violation_examples(df, cons, "o_orderkey", k=5)


def o_constraint_examples_orders():
    def top5(label, col, pred):
        return f"""
        SELECT '{label}' AS constraint, '{col}' AS column,
               o_orderkey AS id, {col}::VARCHAR AS value
        FROM orders WHERE {col} IS NOT NULL AND ({pred})
        ORDER BY o_orderkey LIMIT 5
        """
    parts = [
        top5("in_set[2 values]", "o_orderstatus",
             "o_orderstatus NOT IN ('O','F')"),
        top5("in_set[2 values]", "o_orderpriority",
             "o_orderpriority NOT IN ('1-URGENT','2-HIGH')"),
        top5("matches_regex[[12]-[A-Z ]+]", "o_orderpriority",
             "NOT regexp_full_match(o_orderpriority, '(?:[12]-[A-Z ]+)')"),
    ]
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


# ---------------------------------------------------------------------------
# round-5 final additions: token-budget selection, recrawl dedup,
# corpus data card
# ---------------------------------------------------------------------------

def q_token_budget_selection_documents(spark, sf_dir):
    """FineWeb/DCLM-style quality-prefix corpus selection: rank docs by
    n_chars desc (doc_id ties) and keep every doc whose start offset in
    the cumulative whitespace-token stream is under a 10k-token budget.
    The offsets come from the same distributed prefix scan as
    pack_sequences — no global-ORDER-BY single-task window."""
    from deepchecks_spark.pipeline.packing import select_by_token_budget

    df = _t(spark, sf_dir, "documents")
    return select_by_token_budget(df, "doc_id", "text", "n_chars", 10_000)


def o_token_budget_selection_documents():
    return r"""
    WITH toks AS (
      SELECT doc_id, n_chars::DOUBLE AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      FROM documents),
    cum AS (
      SELECT doc_id, n_chars, n,
             coalesce(sum(n) OVER (ORDER BY n_chars DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS s
      FROM toks)
    SELECT doc_id, n_chars, n::BIGINT AS n_tokens, s::BIGINT AS start_offset,
           s < 10000 AS selected
    FROM cum
    """


def q_latest_crawl_documents(spark, sf_dir):
    """Recrawl dedup over a simulated multi-crawl stack (url = doc_id
    mod 97, crawl ts = doc_id): keep the newest snapshot per url via
    one map-side-combinable max_by argmax — the shuffle moves one
    candidate row per (partition, url), never the full history."""
    from deepchecks_spark.pipeline.webclean import keep_latest_crawl

    df = _t(spark, sf_dir, "documents")
    crawl = df.select((F.col("doc_id") % 97).alias("url"),
                      F.col("doc_id").alias("crawl_ts"), "text")
    return keep_latest_crawl(crawl, "url", "crawl_ts")


def o_latest_crawl_documents():
    # crawl_ts = doc_id is unique, so arg_max is deterministic
    return """
    SELECT doc_id % 97 AS url,
           max(doc_id) AS crawl_ts,
           arg_max(text, doc_id) AS text
    FROM documents GROUP BY 1
    """


def q_snapshot_row_diff_documents(spark, sf_dir):
    """Crawl-over-crawl row-level diff: old snapshot drops every
    doc_id % 10 == 0 page, new snapshot drops % 10 == 1 and rewrites
    the text of every % 7 == 0 page — snapshot_row_diff must class the
    keys added / removed / changed / unchanged accordingly. Scale shape
    under test: each side reduces to (key, md5 digest) BEFORE the
    full-outer join, so the shuffle never carries the text payload."""
    from deepchecks_spark.checks.constraints import snapshot_row_diff

    df = _t(spark, sf_dir, "documents")
    old = df.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text", "lang")
    new = df.filter(F.col("doc_id") % 10 != 1).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" v2")))
        .otherwise(F.col("text")).alias("text"),
        "lang")
    return snapshot_row_diff(old, new, "doc_id")


def o_snapshot_row_diff_documents():
    # the diff statuses are a closed-form function of doc_id: only-new
    # (% 10 == 0) => added, only-old (% 10 == 1) => removed, text
    # rewritten in both (% 7 == 0) => changed (the ' v2' suffix always
    # alters the digest), else unchanged
    return """
    SELECT status, count(*) AS n_rows FROM (
      SELECT CASE WHEN doc_id % 10 = 0 THEN 'added'
                  WHEN doc_id % 10 = 1 THEN 'removed'
                  WHEN doc_id % 7 = 0 THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM documents)
    GROUP BY status ORDER BY status
    """


def q_stratified_sample_documents(spark, sf_dir):
    """Exact deterministic k-per-language sample: rank inside each
    stratum by the engine-portable (md5(id), id) order. The salted
    two-stage top-k must reproduce the single-window answer exactly —
    the oracle IS that single window, in DuckDB."""
    from deepchecks_spark.pipeline.webclean import stratified_sample

    df = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = stratified_sample(df, "lang", "doc_id", 7)
    return out.withColumn("sample_rank", F.col("sample_rank").cast("long"))


def o_stratified_sample_documents():
    return """
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(doc_id::VARCHAR), doc_id)
               AS sample_rank
      FROM documents)
    WHERE sample_rank <= 7
    """


def q_corpus_datacard_documents(spark, sf_dir):
    """Corpus data card: the headline release numbers (datasheet stats
    block) in one melted (metric, value) table — plain moments in one
    fused pass, exact text-distinct as its own Expand-free two-stage
    hash-distinct job, language entropy from an O(|langs|) groupBy."""
    from deepchecks_spark.pipeline.textstats import corpus_datacard

    return corpus_datacard(_t(spark, sf_dir, "documents"), "text", "lang")


def o_corpus_datacard_documents():
    return r"""
    WITH t AS (
      SELECT text, lang,
             CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      FROM documents),
    base AS (
      SELECT count(*)::DOUBLE AS n_docs,
             sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::DOUBLE AS n_null,
             sum(CASE WHEN text IS NOT NULL AND length(trim(text)) = 0
                      THEN 1 ELSE 0 END)::DOUBLE AS n_empty,
             sum(n)::DOUBLE AS total_tokens,
             count(text)::DOUBLE AS n_text,
             count(DISTINCT text)::DOUBLE AS n_distinct
      FROM t),
    langs AS (
      SELECT count(*)::DOUBLE AS n_langs,
             -sum((n / total) * log2(n / total)) AS ent
      FROM (SELECT count(*)::DOUBLE AS n, sum(count(*)) OVER ()::DOUBLE AS total
            FROM documents GROUP BY lang)),
    melted AS (
      SELECT 'n_docs' AS metric, n_docs AS value FROM base
      UNION ALL SELECT 'n_null_text', n_null FROM base
      UNION ALL SELECT 'n_empty_text', n_empty FROM base
      UNION ALL SELECT 'total_tokens', total_tokens FROM base
      UNION ALL SELECT 'mean_tokens_per_doc', total_tokens / n_docs FROM base
      UNION ALL SELECT 'n_distinct_texts', n_distinct FROM base
      UNION ALL SELECT 'duplicate_frac', 1.0 - n_distinct / n_text FROM base
      UNION ALL SELECT 'n_langs', n_langs FROM langs
      UNION ALL SELECT 'lang_entropy_bits', ent FROM langs)
    SELECT metric, round(value, 9) AS value FROM melted ORDER BY metric
    """


def q_warc_roundtrip_documents(spark, sf_dir):
    """WARC (ISO 28500) ingestion round-trip: serialize each document as
    a two-record WARC blob (metadata + resource) with pure-JVM concat/
    encode arithmetic, then parse it back through the shuffle-free
    Arrow-batched mapInPandas reader — proving the crawl-onboarding path
    (corpus/warc.py) is an exact inverse of the export path, headers
    (URI / Date / Content-Length) included."""
    from deepchecks_spark.corpus.warc import parse_warc, warc_record_expr

    df = _t(spark, sf_dir, "documents")
    crawl = df.select(
        F.concat(F.lit("https://example.com/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id")).alias("warc_ts"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("html"),
    )
    blobs = crawl.select(F.concat(
        warc_record_expr(F.lit("urn:meta"), "warc_ts",
                         F.encode(F.lit("m"), "UTF-8"), record_type="metadata"),
        warc_record_expr("url", "warc_ts", "html", record_type="resource"),
    ).alias("content"))
    parsed = parse_warc(blobs, "content", record_types=("resource",))
    return parsed.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_date"),
        F.decode("payload", "UTF-8").alias("payload_text"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


def q_suggest_constraints_orders(spark, sf_dir):
    """Deequ-style constraint suggestion (profile -> contract): one
    fused single-scan profile pass (nulls / numeric min-max /
    integral-string counts / HLL cardinality triage), then exact
    confirmation passes for unique and in_set candidates only. The
    oracle applies the same EXACT rules directly — the HLL estimates
    never decide a suggestion, only which columns get the exact pass."""
    from deepchecks_spark.checks.constraints import suggest_constraints

    return suggest_constraints(_t(spark, sf_dir, "orders"), max_set_size=20)


def o_suggest_constraints_orders():
    # the exact-rule twin of suggest_constraints over orders: not_null
    # (zero NULLs), unique (exact distinct == rows, zero NULLs),
    # in_range (numeric observed min/max), in_set (string, <=20 exact
    # distinct values, sorted JSON), integral_string (every non-NULL
    # value fully matches [+-]?\d+)
    cols = [
        ("o_orderkey", "num"), ("o_custkey", "num"),
        ("o_orderstatus", "str"), ("o_totalprice", "num"),
        ("o_orderdate", "other"), ("o_orderpriority", "str"),
    ]
    stats, rules = [], []
    for c, t in cols:
        stats.append(f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS d_{c}")
        rules.append(
            f"SELECT '{c}' AS \"column\", 'not_null' AS kind, NULL::DOUBLE AS lo, "
            f"NULL::DOUBLE AS hi, NULL::VARCHAR AS \"values\" FROM t "
            f"WHERE n > 0 AND nn_{c} = n")
        rules.append(
            f"SELECT '{c}', 'unique', NULL::DOUBLE, NULL::DOUBLE, NULL::VARCHAR "
            f"FROM t WHERE n > 0 AND nn_{c} = n AND d_{c} = n")
        if t == "num":
            stats.append(f"min({c})::DOUBLE AS mn_{c}, max({c})::DOUBLE AS mx_{c}")
            rules.append(
                f"SELECT '{c}', 'in_range', mn_{c}, mx_{c}, NULL::VARCHAR "
                f"FROM t WHERE nn_{c} > 0")
        elif t == "str":
            stats.append(
                f"coalesce(sum(CASE WHEN regexp_full_match({c}, '[+-]?\\d+') "
                f"THEN 1 ELSE 0 END), 0) AS int_{c}")
            rules.append(
                f"SELECT '{c}', 'in_set', NULL::DOUBLE, NULL::DOUBLE, "
                f"(SELECT to_json(list_sort(list(DISTINCT {c}))) FROM orders "
                f"WHERE {c} IS NOT NULL) FROM t WHERE d_{c} BETWEEN 1 AND 20")
            rules.append(
                f"SELECT '{c}', 'integral_string', NULL::DOUBLE, NULL::DOUBLE, "
                f"NULL::VARCHAR FROM t WHERE nn_{c} > 0 AND int_{c} = nn_{c}")
    return (
        "WITH t AS (SELECT count(*) AS n, " + ", ".join(stats)
        + " FROM orders) SELECT * FROM (" + " UNION ALL ".join(rules)
        + ") ORDER BY \"column\", kind"
    )


def q_schema_diff_documents(spark, sf_dir):
    """Snapshot-over-snapshot schema evolution: the old snapshot is
    documents as stored; the new snapshot drops `source`, narrows
    `n_chars` to int, and adds a `quality` column — schema_diff reports
    added / removed / type_changed / unchanged per column from the
    schemas alone (zero jobs). The oracle derives BOTH schemas through
    DuckDB's information_schema / DESCRIBE and applies the same diff."""
    from deepchecks_spark.checks.constraints import schema_diff

    old = _t(spark, sf_dir, "documents")
    new = (old.drop("source")
           .withColumn("n_chars", F.col("n_chars").cast("int"))
           .withColumn("quality", F.lit(0.0)))
    return schema_diff(old, new)


def o_schema_diff_documents():
    # map DuckDB type names onto Spark simpleString names so the diff
    # compares like-for-like
    def m(col):
        return (f"CASE {col} WHEN 'BIGINT' THEN 'bigint' "
                f"WHEN 'INTEGER' THEN 'int' WHEN 'VARCHAR' THEN 'string' "
                f"WHEN 'DOUBLE' THEN 'double' "
                f"WHEN 'TIMESTAMP' THEN 'timestamp' ELSE lower({col}) END")
    return f"""
    WITH old AS (
      SELECT column_name AS c, {m('data_type')} AS t
      FROM information_schema.columns WHERE table_name = 'documents'),
    new AS (
      SELECT column_name AS c, {m('column_type')} AS t
      FROM (DESCRIBE SELECT doc_id, text, lang, n_chars::INTEGER AS n_chars,
            0.0::DOUBLE AS quality FROM documents))
    SELECT coalesce(o.c, n.c) AS "column",
           CASE WHEN n.c IS NULL THEN 'removed'
                WHEN o.c IS NULL THEN 'added'
                WHEN o.t != n.t THEN 'type_changed'
                ELSE 'unchanged' END AS status,
           o.t AS dtype_old, n.t AS dtype_new
    FROM old o FULL OUTER JOIN new n ON o.c = n.c
    ORDER BY 1
    """


def q_metric_anomalies_events(spark, sf_dir):
    """Deequ-style metric-history anomaly detection: the per-day event
    counts per event_type form a metric history; the LATEST day of each
    metric is scored against its trailing history with the relative-
    change and z-score strategies — one groupBy(metric) with O(runs)
    bounded per-metric state, all JVM higher-order-function arithmetic."""
    from deepchecks_spark.checks.anomaly import metric_anomalies

    ev = _t(spark, sf_dir, "events")
    hist = (
        ev.where(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type").alias("metric"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("long").alias("run_ts"))
        .agg(F.count("*").cast("double").alias("value")))
    return metric_anomalies(hist, max_relative_change=0.25, z_threshold=2.0)


def o_metric_anomalies_events():
    return """
    WITH h AS (
      SELECT event_type AS metric,
             datediff('day', DATE '1970-01-01', ts::DATE) AS run_ts,
             count(*)::DOUBLE AS v
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY metric ORDER BY run_ts DESC) AS rn
      FROM h),
    latest AS (SELECT metric, run_ts AS latest_ts, v AS latest_value
               FROM ranked WHERE rn = 1),
    prev AS (SELECT metric, v AS prev_value FROM ranked WHERE rn = 2),
    hist AS (SELECT metric, count(*) AS n_hist, avg(v) AS mean_hist,
                    stddev_samp(v) AS std_hist
             FROM ranked WHERE rn > 1 GROUP BY metric),
    joined AS (
      SELECT l.metric, l.latest_ts, l.latest_value, p.prev_value,
             coalesce(h.n_hist, 0) AS n_hist,
             CASE WHEN p.prev_value IS NOT NULL AND p.prev_value != 0
                  THEN round((l.latest_value - p.prev_value)
                             / abs(p.prev_value), 6) END AS rel_change,
             round(h.mean_hist, 6) AS mean_hist,
             round(h.std_hist, 6) AS std_hist,
             CASE WHEN h.n_hist >= 3 AND h.std_hist > 0
                  THEN round((l.latest_value - h.mean_hist) / h.std_hist, 6)
                  END AS z_score
      FROM latest l LEFT JOIN prev p USING (metric)
                    LEFT JOIN hist h USING (metric)),
    flagged AS (
      SELECT *,
        concat_ws(',',
          CASE WHEN rel_change IS NOT NULL AND abs(rel_change) > 0.25
               THEN 'max_relative_change' END,
          CASE WHEN z_score IS NOT NULL AND abs(z_score) > 2.0
               THEN 'z_threshold' END) AS failed_rules
      FROM joined)
    SELECT metric, latest_ts, latest_value, prev_value, n_hist, rel_change,
           mean_hist, std_hist, z_score, failed_rules,
           CASE WHEN failed_rules = '' THEN 'PASS' ELSE 'FAIL' END AS status
    FROM flagged
    """


def o_warc_roundtrip_documents():
    # the blob is built from documents deterministically, so the parsed
    # output must equal this direct projection byte-for-byte
    return """
    SELECT 'https://example.com/' || doc_id::VARCHAR AS url,
           strftime(TIMESTAMP '2025-01-01 00:00:00'
                    + to_seconds(doc_id), '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
           coalesce(text, '') AS payload_text,
           octet_length(encode(coalesce(text, ''))) AS n_bytes
    FROM documents
    """


# ---------------------------------------------------------------------------
# round-5: structure discovery (checks/discovery.py) — functional
# dependencies, candidate keys, Benford, segment completeness, freshness
# ---------------------------------------------------------------------------

_FD_PAIRS = [("l_orderkey", "l_linestatus"), ("l_partkey", "l_suppkey"),
             ("l_orderkey", "l_returnflag")]


def q_fd_discovery_lineitem(spark, sf_dir):
    """Exact g3 functional-dependency violation rates for three candidate
    dependencies over lineitem — one melted scan for all pairs
    (checks/discovery.py::functional_dependencies)."""
    from deepchecks_spark.checks.discovery import functional_dependencies

    out = functional_dependencies(_t(spark, sf_dir, "lineitem"), _FD_PAIRS)
    return (out.select("determinant", "dependent", "n_rows", "n_groups",
                       "n_violating_groups",
                       F.round("g3_error", 9).alias("g3_error"), "holds")
            .orderBy("determinant", "dependent"))


def o_fd_discovery_lineitem():
    # per pair: group by (A, B) -> per-A (tot, max, branches) -> g3
    parts = []
    for a, b in _FD_PAIRS:
        parts.append(f"""
        SELECT '{a}' AS determinant, '{b}' AS dependent,
               sum(tot)::BIGINT AS n_rows, count(*)::BIGINT AS n_groups,
               sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating_groups,
               round(sum(tot - mx)::DOUBLE / sum(tot)::DOUBLE, 9) AS g3_error,
               (sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0) AS holds
        FROM (SELECT a, sum(n) AS tot, max(n) AS mx, count(*) AS nb
              FROM (SELECT {a} AS a, {b} AS b, count(*) AS n
                    FROM lineitem GROUP BY 1, 2)
              GROUP BY 1)
        """)
    return " UNION ALL ".join(parts) + " ORDER BY determinant, dependent"


_KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def q_candidate_keys_lineitem(spark, sf_dir):
    """Level-wise candidate-key discovery over four lineitem columns in
    exact mode (the SQL-reproducible verification mode; the HLL-triage
    mode is property-tested to agree —
    checks/discovery.py::discover_keys)."""
    from deepchecks_spark.checks.discovery import discover_keys

    out = discover_keys(_t(spark, sf_dir, "lineitem"),
                        columns=_KEY_COLS, triage="exact")
    return out.select("key", "size", "n_distinct", "n_rows",
                      F.round("distinct_ratio", 9).alias("distinct_ratio"),
                      "has_nulls", "is_key").orderBy("size", "key")


def o_candidate_keys_lineitem():
    singles = " UNION ALL ".join(
        f"SELECT '{c}' AS key, count(DISTINCT {c})::BIGINT AS nd, "
        f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls "
        f"FROM lineitem"
        for c in _KEY_COLS)
    pairs = " UNION ALL ".join(
        f"SELECT '{a}' AS a, '{b}' AS b, "
        f"count(DISTINCT ({a}, {b}))::BIGINT AS nd, "
        f"sum(CASE WHEN {a} IS NULL OR {b} IS NULL THEN 1 ELSE 0 END)::BIGINT "
        f"AS nulls FROM lineitem"
        for i, a in enumerate(_KEY_COLS) for b in _KEY_COLS[i + 1:])
    return f"""
    WITH nn AS (SELECT count(*)::BIGINT AS n FROM lineitem),
    sgl AS ({singles}),
    singles AS (
      SELECT key, 1 AS size, nd AS n_distinct, nn.n AS n_rows,
             round(nd::DOUBLE / nn.n, 9) AS distinct_ratio,
             nulls > 0 AS has_nulls,
             (nulls = 0 AND nd = nn.n) AS is_key
      FROM sgl CROSS JOIN nn),
    prs AS ({pairs}),
    pairs AS (
      SELECT p.a || ',' || p.b AS key, 2 AS size,
             CASE WHEN p.nulls > 0 THEN NULL ELSE p.nd END AS n_distinct,
             nn.n AS n_rows,
             CASE WHEN p.nulls > 0 THEN NULL
                  ELSE round(p.nd::DOUBLE / nn.n, 9) END AS distinct_ratio,
             p.nulls > 0 AS has_nulls,
             (p.nulls = 0 AND p.nd = nn.n) AS is_key
      FROM prs p CROSS JOIN nn
      WHERE NOT EXISTS (SELECT 1 FROM singles s
                        WHERE s.is_key AND (s.key = p.a OR s.key = p.b)))
    SELECT * FROM singles UNION ALL SELECT * FROM pairs ORDER BY size, key
    """


def q_benford_lineitem(spark, sf_dir):
    """First-significant-digit distribution of l_extendedprice vs
    Benford's law — digit extraction is fixed-point integer/string
    arithmetic, bit-stable across engines
    (checks/discovery.py::benford_first_digit)."""
    from deepchecks_spark.checks.discovery import benford_first_digit

    return benford_first_digit(_t(spark, sf_dir, "lineitem"),
                               "l_extendedprice", scale=2)


def o_benford_lineitem():
    return """
    WITH i AS (SELECT abs(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS v
               FROM lineitem WHERE l_extendedprice IS NOT NULL),
    d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit
          FROM i WHERE v > 0),
    per AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1),
    t AS (SELECT sum(n)::BIGINT AS total FROM per)
    SELECT digit, n,
           round(n::DOUBLE / t.total, 9) AS observed_frac,
           round(log10(1.0 + 1.0 / digit), 9) AS expected_frac,
           round(abs(round(n::DOUBLE / t.total, 9)
                     - round(log10(1.0 + 1.0 / digit), 9)), 9) AS abs_deviation
    FROM per CROSS JOIN t ORDER BY digit
    """


def q_segment_completeness_documents(spark, sf_dir):
    """Per-language null rates with excess-over-global flagging, over a
    corpus with deterministically planted nulls (text at doc_id%13=0,
    n_chars at %17=0 — both engines derive the same input) so every
    counter is non-vacuous
    (checks/discovery.py::segment_completeness)."""
    from deepchecks_spark.checks.discovery import segment_completeness

    df = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = df.select(
        "lang",
        F.when(did % 13 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("text")).alias("text"),
        F.when(did % 17 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("n_chars")).alias("n_chars"),
    )
    out = segment_completeness(planted, ["lang"], ["text", "n_chars"],
                               excess_threshold=0.005)
    return (out.select("lang", "column", "n", "n_null",
                       F.round("null_frac", 9).alias("null_frac"),
                       F.round("global_null_frac", 9).alias("global_null_frac"),
                       F.round("excess", 9).alias("excess"), "flagged")
            .orderBy("lang", "column"))


def o_segment_completeness_documents():
    return """
    WITH planted AS (
      SELECT lang,
             CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS t,
             CASE WHEN doc_id % 17 = 0 THEN NULL ELSE n_chars END AS nc
      FROM documents),
    seg AS (
      SELECT lang, 'text' AS "column", count(*)::BIGINT AS n,
             sum(CASE WHEN t IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null
      FROM planted GROUP BY 1
      UNION ALL
      SELECT lang, 'n_chars', count(*)::BIGINT,
             sum(CASE WHEN nc IS NULL THEN 1 ELSE 0 END)::BIGINT
      FROM planted GROUP BY 1),
    gtot AS (SELECT "column", sum(n_null)::DOUBLE / sum(n)::DOUBLE AS g
             FROM seg GROUP BY 1)
    SELECT lang, s."column", n, n_null,
           round(n_null::DOUBLE / n, 9) AS null_frac,
           round(g, 9) AS global_null_frac,
           round(n_null::DOUBLE / n - g, 9) AS excess,
           (n_null::DOUBLE / n - g) > 0.005 AS flagged
    FROM seg s JOIN gtot USING ("column") ORDER BY lang, s."column"
    """


def q_freshness_events(spark, sf_dir):
    """Per-event-type data recency: lag of the group's newest timestamp
    behind the table's newest (exact integer-microsecond arithmetic),
    stale above 10 minutes (checks/discovery.py::freshness)."""
    from deepchecks_spark.checks.discovery import freshness

    out = freshness(_t(spark, sf_dir, "events"), "ts", ["event_type"],
                    max_lag_seconds=600.0)
    return out.orderBy("event_type")


def o_freshness_events():
    return """
    WITH g AS (SELECT event_type, count(*)::BIGINT AS n, max(ts) AS max_ts
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    m AS (SELECT max(max_ts) AS mm FROM g)
    SELECT event_type, n, max_ts,
           (epoch_us(m.mm) - epoch_us(max_ts)) / 1000000.0 AS lag_seconds,
           ((epoch_us(m.mm) - epoch_us(max_ts)) / 1000000.0) > 600.0 AS is_stale
    FROM g CROSS JOIN m ORDER BY event_type
    """


# ---------------------------------------------------------------------------
# round-5: temporal/relational operators (pipeline/relational.py) —
# as-of join, range join, sessionization, heavy hitters, skew profile
# ---------------------------------------------------------------------------

def q_asof_join_events(spark, sf_dir):
    """Backward as-of join: every click matched to the user's most
    recent at-or-before view (merge formulation — ONE Exchange of
    |L|+|R| slim rows, plan-pinned), aggregated per user with the lag
    summed in exact integer microseconds before the single division
    (pipeline/relational.py::asof_join; oracle uses DuckDB's NATIVE
    ASOF LEFT JOIN — independent semantics)."""
    from deepchecks_spark.pipeline.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", "event_id")
    views = ev.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", F.col("value").alias("view_value"))
    joined = asof_join(clicks, views, on=["user_id"], ts_col="ts")
    lag_us = (F.unix_micros(F.col("ts").cast("timestamp"))
              - F.unix_micros(F.col("ts_right").cast("timestamp")))
    return (
        joined.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count("ts_right").alias("n_matched"),
            F.sum(lag_us).alias("sum_lag_us"),
            F.round(F.sum("view_value"), 6).alias("sum_view_value"),
        ).orderBy("user_id")
    )


def o_asof_join_events():
    return """
    WITH c AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click'),
    v AS (SELECT user_id, ts, value AS view_value FROM events
          WHERE event_type = 'view'),
    j AS (SELECT c.user_id, c.ts, v.ts AS ts_right, v.view_value
          FROM c ASOF LEFT JOIN v
          ON c.user_id = v.user_id AND c.ts >= v.ts)
    SELECT user_id, count(*)::BIGINT AS n_clicks,
           count(ts_right)::BIGINT AS n_matched,
           sum(epoch_us(ts) - epoch_us(ts_right))::BIGINT AS sum_lag_us,
           round(sum(view_value), 6) AS sum_view_value
    FROM j GROUP BY user_id ORDER BY user_id
    """


def q_range_join_events(spark, sf_dir):
    """Range join: events falling inside any same-user 10-minute
    incident window opened by an error event — bin-bucketed EQUI-join
    (never a nested loop, plan-pinned), counted per event type
    (pipeline/relational.py::range_join)."""
    from deepchecks_spark.pipeline.relational import range_join

    ev = _t(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 600 SECONDS")).alias("w_end"),
        F.col("event_id").alias("incident_id"))
    pts = ev.select("user_id", "ts", "event_id", "event_type")
    pairs = range_join(pts, windows, "ts", "w_start", "w_end",
                       on=["user_id"], bin_width_seconds=600)
    return (
        pairs.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("event_id").alias("n_events"),
            F.count_distinct("incident_id").alias("n_incidents"),
        ).orderBy("event_type")
    )


def o_range_join_events():
    return """
    WITH w AS (SELECT user_id, ts AS w_start,
                      ts + INTERVAL 600 SECOND AS w_end,
                      event_id AS incident_id
               FROM events WHERE event_type = 'error'),
    pairs AS (SELECT e.event_type, e.event_id, w.incident_id
              FROM events e JOIN w ON e.user_id = w.user_id
              AND w.w_start <= e.ts AND e.ts <= w.w_end)
    SELECT event_type, count(*)::BIGINT AS n_pairs,
           count(DISTINCT event_id)::BIGINT AS n_events,
           count(DISTINCT incident_id)::BIGINT AS n_incidents
    FROM pairs GROUP BY event_type ORDER BY event_type
    """


def q_sessionize_events(spark, sf_dir):
    """Gap sessionization (2h inactivity, strict-greater split rule)
    per user — one partitioned window pass — rolled up to per-user
    session stats with durations summed in exact integer microseconds
    (pipeline/relational.py::sessionize/session_stats)."""
    from deepchecks_spark.pipeline.relational import sessionize

    ev = _t(spark, sf_dir, "events")
    sess = sessionize(ev, ["user_id"], "ts", gap_seconds=7200)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts").cast("timestamp"))
         - F.unix_micros(F.min("ts").cast("timestamp")))
        .alias("dur_us"))
    return (
        per_session.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            F.sum("dur_us").alias("sum_duration_us"),
        ).orderBy("user_id")
    )


def o_sessionize_events():
    return """
    WITH o AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
               FROM events WHERE ts IS NOT NULL),
    f AS (SELECT user_id, ts,
                 CASE WHEN prev IS NOT NULL
                      AND epoch_us(ts) - epoch_us(prev) > 7200000000
                      THEN 1 ELSE 0 END AS brk
          FROM o),
    s AS (SELECT user_id, ts,
                 1 + sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
          FROM f),
    per AS (SELECT user_id, session_id, count(*)::BIGINT AS n_events,
                   (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS dur_us
            FROM s GROUP BY 1, 2)
    SELECT user_id, count(*)::BIGINT AS n_sessions,
           sum(n_events)::BIGINT AS n_events,
           max(n_events)::BIGINT AS max_session_events,
           sum(dur_us)::BIGINT AS sum_duration_us
    FROM per GROUP BY user_id ORDER BY user_id
    """


def q_heavy_hitters_events(spark, sf_dir):
    """Misra-Gries heavy hitters over user_id: O(k) state per task in
    pass 1, exact recount of the bounded candidate set in pass 2 —
    output provably EXACT and complete above the threshold, so the
    plain GROUP BY / HAVING oracle must agree bit-for-bit
    (pipeline/relational.py::heavy_hitters)."""
    from deepchecks_spark.pipeline.relational import heavy_hitters

    ev = _t(spark, sf_dir, "events")
    out = heavy_hitters(ev, "user_id", k=2000, threshold=60)
    return out.orderBy("value")


def o_heavy_hitters_events():
    return """
    SELECT CAST(user_id AS VARCHAR) AS value, count(*)::BIGINT AS count
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id HAVING count(*) >= 60 ORDER BY value
    """


def q_skew_profile_orders(spark, sf_dir):
    """Join-skew profile of orders on o_custkey: top-20 heaviest keys
    with table share, ratio to the mean group size and the salt factor
    for a 10-rows-per-task target — one groupBy scan, stats and top-k
    from the GROUPED output (pipeline/relational.py::skew_profile)."""
    from deepchecks_spark.pipeline.relational import skew_profile

    out = skew_profile(_t(spark, sf_dir, "orders"), ["o_custkey"],
                       top_k=20, target_rows_per_task=10)
    return out.select(
        "o_custkey", "count",
        F.round("share", 9).alias("share"),
        F.round("skew_ratio", 9).alias("skew_ratio"),
        "suggested_salt")


def o_skew_profile_orders():
    return """
    WITH c AS (SELECT o_custkey, count(*)::BIGINT AS count
               FROM orders GROUP BY 1),
    s AS (SELECT sum(count)::BIGINT AS n,
                 sum(count)::DOUBLE / count(*)::DOUBLE AS mean FROM c)
    SELECT o_custkey, count,
           round(count::DOUBLE / s.n, 9) AS share,
           round(count::DOUBLE / s.mean, 9) AS skew_ratio,
           CAST(greatest(1, ceil(count::DOUBLE / 10)) AS INT) AS suggested_salt
    FROM c CROSS JOIN s
    ORDER BY count DESC, o_custkey ASC NULLS LAST LIMIT 20
    """


def q_tfidf_terms_documents(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (sklearn smooth-idf): one
    corpus scan (explode -> groupBy(id, term)), a second
    map-side-combined groupBy(term) over the (doc, term) table for
    document frequency, a term-keyed join back, and a per-document
    row_number window. Ranking uses the score rounded to 6 decimals so
    the order is engine-exact vs the oracle's ln()."""
    from deepchecks_spark.pipeline.textstats import tfidf_terms

    docs = _t(spark, sf_dir, "documents").filter("doc_id % 7 = 0")
    return tfidf_terms(docs, "doc_id", "text", k=3)


def o_tfidf_terms_documents():
    return r"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
         n AS (SELECT count(*)::DOUBLE AS n_docs FROM d),
         toks AS (SELECT doc_id,
                         CASE WHEN length(trim(text)) = 0 THEN []
                              ELSE string_split_regex(trim(text), '\s+') END AS t
                  FROM d),
         tf AS (SELECT doc_id, unnest(t) AS term FROM toks),
         tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
         dfc AS (SELECT term, count(*) AS doc_freq FROM tfc GROUP BY 1),
         s AS (SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.doc_freq,
                      round(tfc.tf * (ln((1.0 + (SELECT n_docs FROM n))
                                         / (dfc.doc_freq + 1.0)) + 1.0), 6) AS tfidf
               FROM tfc JOIN dfc USING (term)),
         r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                            ORDER BY tfidf DESC, term ASC) AS rank
               FROM s)
    SELECT doc_id, term, tf::BIGINT AS tf, doc_freq::BIGINT AS doc_freq,
           tfidf, rank::BIGINT AS rank
    FROM r WHERE rank <= 3
    """


def q_zipf_fit_documents(spark, sf_dir):
    """Zipf-law fit over the top-500 corpus terms: TakeOrderedAndProject
    top-n, a 500-row rank window, then one closed-form least-squares agg
    of ln(count) ~ ln(rank). Explicit sums (not regr_slope) so the
    oracle's arithmetic is identical."""
    from deepchecks_spark.pipeline.textstats import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), "text", top_n=500)


def o_zipf_fit_documents():
    return r"""
    WITH toks AS (SELECT CASE WHEN length(trim(text)) = 0 THEN []
                              ELSE string_split_regex(trim(text), '\s+') END AS t
                  FROM documents),
         c AS (SELECT term, count(*) AS n
               FROM (SELECT unnest(t) AS term FROM toks) GROUP BY 1
               ORDER BY n DESC, term ASC LIMIT 500),
         xy AS (SELECT ln(row_number() OVER (ORDER BY n DESC, term ASC)::DOUBLE) AS x,
                       ln(n::DOUBLE) AS y
                FROM c),
         s AS (SELECT count(*)::DOUBLE AS m, sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
               FROM xy),
         fit AS (SELECT m,
                        (m * sxy - sx * sy) / (m * sxx - sx * sx) AS slope,
                        sx, sy, sxx, syy
                 FROM s)
    SELECT m::BIGINT AS n_terms_fit,
           round(slope, 6) AS zipf_slope,
           round((sy - slope * sx) / m, 6) AS zipf_intercept,
           round(CASE WHEN syy - sy * sy / m > 0
                      THEN slope * slope * (sxx - sx * sx / m) / (syy - sy * sy / m)
                      ELSE 1.0 END, 6) AS r2
    FROM fit
    """


def q_ngram_overlap_documents(spark, sf_dir):
    """Cross-corpus trigram-set overlap (even vs odd doc_id halves):
    one shuffle — tagged union of the two corpora's gram-hash explodes
    into a single groupBy(hash) whose map-side combine is the dedup —
    then a one-row agg. The oracle compares gram STRINGS (identical to
    the xxhash64 comparison absent a 64-bit collision)."""
    from deepchecks_spark.pipeline.decontam import ngram_overlap

    docs = _t(spark, sf_dir, "documents")
    return ngram_overlap(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"),
        "text", ngram=3,
    )


def o_ngram_overlap_documents():
    return r"""
    WITH toks AS (SELECT doc_id % 2 AS side,
                         CASE WHEN length(trim(text)) = 0 THEN []
                              ELSE string_split_regex(trim(text), '\s+') END AS t
                  FROM documents),
         g AS (SELECT side,
                      CASE WHEN len(t) >= 3
                           THEN list_distinct(list_transform(range(1, len(t) - 1),
                                                             i -> array_to_string(t[i:i+2], ' ')))
                           ELSE [] END AS grams
               FROM toks),
         e AS (SELECT DISTINCT side, unnest(grams) AS gr FROM g),
         f AS (SELECT gr,
                      max(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS a,
                      max(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS b
               FROM e GROUP BY 1),
         tot AS (SELECT sum(a) AS na, sum(b) AS nb, sum(a * b) AS nc FROM f)
    SELECT na::BIGINT AS n_grams_a, nb::BIGINT AS n_grams_b, nc::BIGINT AS n_common,
           round(CASE WHEN na + nb - nc > 0
                      THEN nc / (na + nb - nc)::DOUBLE ELSE 0.0 END, 6) AS jaccard,
           round(CASE WHEN na > 0 THEN nc / na::DOUBLE ELSE 0.0 END, 6) AS containment_a_in_b,
           round(CASE WHEN nb > 0 THEN nc / nb::DOUBLE ELSE 0.0 END, 6) AS containment_b_in_a
    FROM tot
    """


def q_char_entropy_documents(spark, sf_dir):
    """Per-document character Shannon entropy (gibberish / binary-spill
    detector): a pure zero-shuffle projection of higher-order array
    functions; the n*ln(n) sum runs over the SORTED distinct characters
    so float summation order matches the oracle's list_sort exactly."""
    from deepchecks_spark.pipeline.textstats import char_entropy

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return char_entropy(docs, "text").select(
        "doc_id", "n_chars", "n_distinct_chars", "char_entropy")


def o_char_entropy_documents():
    return r"""
    WITH c AS (SELECT doc_id, text, string_split(text, '') AS ch,
                      length(text) AS L
               FROM documents),
         d AS (SELECT doc_id, text, ch, L,
                      list_sort(list_distinct(ch)) AS dist
               FROM c),
         e AS (SELECT doc_id, L,
                      CASE WHEN text IS NULL THEN 0 ELSE L END AS n_chars,
                      CASE WHEN text IS NULL OR L = 0 THEN 0
                           ELSE len(dist) END AS n_distinct_chars,
                      CASE WHEN text IS NULL OR L = 0 THEN 0.0
                           ELSE ln(L::DOUBLE) - list_sum(list_transform(dist,
                                c -> len(list_filter(ch, x -> x = c))::DOUBLE
                                     * ln(len(list_filter(ch, x -> x = c))::DOUBLE)))
                                / L
                      END AS h
               FROM d)
    SELECT doc_id, n_chars::BIGINT AS n_chars,
           n_distinct_chars::BIGINT AS n_distinct_chars,
           round(h, 6) AS char_entropy
    FROM e
    """


def q_pii_stats_documents(spark, sf_dir):
    """Corpus-level PII exposure summary over the planted-PII fixture:
    the same sequential-replacement counts as the redaction pass,
    reduced by ONE distributive aggregation (single one-row exchange)."""
    from deepchecks_spark.pipeline.webclean import pii_stats

    df = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _PII_FIXTURE_SQL + " AS text")
    return pii_stats(df, "text")


def o_pii_stats_documents():
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
    phone = r"\+?\d[\d\- ]{7,}\d"
    return f"""
    WITH f AS (SELECT doc_id, {_PII_FIXTURE_SQL} AS text FROM documents),
    s1 AS (SELECT doc_id,
                  len(regexp_extract_all(text, '{email}')) AS n_email,
                  regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
           FROM f),
    s2 AS (SELECT doc_id, n_email,
                  len(regexp_extract_all(t1, '{ip}')) AS n_ip,
                  regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2
           FROM s1),
    s3 AS (SELECT doc_id, n_email, n_ip,
                  len(regexp_extract_all(t2, '{phone}')) AS n_phone
           FROM s2)
    SELECT count(*)::BIGINT AS n_docs,
           sum(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_docs_with_pii,
           round(sum(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 ELSE 0 END)
                 / greatest(count(*), 1)::DOUBLE, 6) AS pct_docs_with_pii,
           sum(n_email)::BIGINT AS n_email,
           sum(n_ip)::BIGINT AS n_ip,
           sum(n_phone)::BIGINT AS n_phone
    FROM s3
    """


def q_cluster_profile_documents(spark, sf_dir):
    """Duplication profile (cluster-size distribution) over the same
    chain+bridge pair fixture as dedup_clusters_documents, with ids
    480-499 left out of every pair so the singleton row is exercised:
    the oracle recomputes each id's component arithmetically and
    aggregates the closure — sizes 1 (20 docs), 4 (72 clusters) and
    8 (24 bridged cluster pairs) over the 500-doc spine."""
    from deepchecks_spark.pipeline.dedup import cluster_size_profile

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 500")
    pairs = docs.filter(
        "doc_id < 479 AND (doc_id % 4 < 3 OR (doc_id % 4 = 3 AND (doc_id div 4) % 5 = 0))"
    ).selectExpr("doc_id AS id_a", "doc_id + 1 AS id_b")
    return cluster_size_profile(docs, pairs, "doc_id")


def o_cluster_profile_documents():
    return """
    WITH comp AS (
      SELECT doc_id,
             CASE WHEN doc_id < 480
                  THEN 4 * ((doc_id // 4)
                            - CASE WHEN (doc_id // 4) % 5 = 1 THEN 1 ELSE 0 END)
                  ELSE doc_id END AS component
      FROM documents WHERE doc_id < 500),
    cs AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1),
    d AS (SELECT sz, count(*) AS n_clusters, sum(sz) AS n_docs FROM cs GROUP BY 1),
    t AS (SELECT sum(n_docs) AS tot FROM d)
    SELECT sz::BIGINT AS cluster_size, n_clusters::BIGINT AS n_clusters,
           n_docs::BIGINT AS n_docs,
           round(n_docs / (SELECT tot FROM t)::DOUBLE, 6) AS pct_of_corpus,
           (n_docs - n_clusters)::BIGINT AS n_removable
    FROM d
    """


def q_temporal_drift_events(spark, sf_dir):
    """PSI drift time series over the events stream: per-day value
    distribution vs the FIRST day, fixed-width bins on the global
    [min, max] support, the reference 0.01 share floor. Fully
    distributed — one scalar-extremes agg, ONE map-side-combined
    groupBy(window, bin), and O(windows x bins) arithmetic after."""
    from deepchecks_spark.drift.spark import temporal_drift

    return temporal_drift(_t(spark, sf_dir, "events"), "ts", "value",
                          granularity="day", n_bins=10)


def o_temporal_drift_events():
    return """
    WITH r AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS w,
                      value::DOUBLE AS v
               FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    mm AS (SELECT min(v) AS lo, max(v) AS hi FROM r),
    b AS (SELECT w,
                 (CASE WHEN (SELECT hi FROM mm) = (SELECT lo FROM mm) THEN 0
                       ELSE least(floor((v - (SELECT lo FROM mm))
                                        / ((SELECT hi FROM mm) - (SELECT lo FROM mm))
                                        * 10), 9) END)::INT AS bin
          FROM r),
    wc AS (SELECT w, bin, count(*) AS n FROM b GROUP BY 1, 2),
    wt AS (SELECT w, sum(n) AS total FROM wc GROUP BY 1),
    w0 AS (SELECT min(w) AS w0 FROM wt),
    base AS (SELECT bin, n AS bn FROM wc WHERE w = (SELECT w0 FROM w0)),
    bt AS (SELECT sum(bn) AS btot FROM base),
    grid AS (SELECT wt.w, wt.total, g.bin
             FROM wt CROSS JOIN (SELECT unnest(range(10)) AS bin) g),
    j AS (SELECT grid.w, grid.total, coalesce(wc.n, 0) AS n,
                 coalesce(base.bn, 0) AS bn
          FROM grid LEFT JOIN wc ON wc.w = grid.w AND wc.bin = grid.bin
                    LEFT JOIN base ON base.bin = grid.bin)
    SELECT w AS window_start, max(total)::BIGINT AS n_rows,
           round(sum((greatest(bn / (SELECT btot FROM bt)::DOUBLE, 0.01)
                      - greatest(n / total::DOUBLE, 0.01))
                     * ln(greatest(bn / (SELECT btot FROM bt)::DOUBLE, 0.01)
                          / greatest(n / total::DOUBLE, 0.01))), 6) AS psi
    FROM j GROUP BY 1
    """


def q_contamination_report_documents(spark, sf_dir):
    """Per-benchmark contamination summary: every 25th document plays
    an eval set named by its doc_id parity, so each benchmark's own
    corpus copies are contaminated by construction and any further hit
    is a genuinely shared 5-gram. The oracle compares gram STRINGS
    (identical to the xxhash64 comparison absent a 64-bit collision)."""
    from deepchecks_spark.pipeline.decontam import contamination_report

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0).selectExpr(
        "concat('bench_', CAST(doc_id % 2 AS STRING)) AS bench_name", "text")
    return contamination_report(docs, bench, "doc_id", "text",
                                "bench_name", ngram=5)


def o_contamination_report_documents():
    return r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\s+') END AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 5
                  THEN list_distinct(list_transform(range(1, len(t) - 3),
                                                    i -> array_to_string(t[i:i+4], ' ')))
                  ELSE [] END AS grams
      FROM toks),
    bg AS (SELECT DISTINCT concat('bench_', CAST(doc_id % 2 AS VARCHAR)) AS benchmark,
                  unnest(grams) AS h
           FROM g WHERE doc_id % 25 = 0),
    pb AS (SELECT benchmark, count(*) AS n_bench_grams FROM bg GROUP BY 1),
    e AS (SELECT doc_id, unnest(grams) AS h FROM g),
    hits AS (SELECT DISTINCT e.doc_id, bg.benchmark FROM e JOIN bg USING (h)),
    hc AS (SELECT benchmark, count(*) AS n_docs_contaminated FROM hits GROUP BY 1),
    nd AS (SELECT count(*) AS n FROM documents)
    SELECT pb.benchmark, pb.n_bench_grams::BIGINT AS n_bench_grams,
           coalesce(hc.n_docs_contaminated, 0)::BIGINT AS n_docs_contaminated,
           round(coalesce(hc.n_docs_contaminated, 0)
                 / greatest((SELECT n FROM nd), 1)::DOUBLE, 6) AS pct_docs_contaminated
    FROM pb LEFT JOIN hc USING (benchmark)
    ORDER BY benchmark
    """


def q_embedding_drift_embeddings(spark, sf_dir):
    """RFF-MMD^2 embedding-corpus drift: even vec_ids are the reference
    corpus, odd vec_ids get a +0.25 per-coordinate shift (planted
    drift). One distributive agg per corpus; the seeded projection
    constants are inlined into BOTH engines' plans, and every dot
    product folds left-to-right identically."""
    from deepchecks_spark.drift.embedding import embedding_drift

    emb = _t(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1).withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(0.25)))
    return embedding_drift(ref, cur, "embedding", dim=64, n_features=16)


def o_embedding_drift_embeddings():
    from deepchecks_spark.drift.embedding import rff_oracle_sql, rff_params

    dim, d = 64, 16
    w, b = rff_params(dim, d, 1.0 / dim)

    def side(where, vec, tag):
        feats = rff_oracle_sql(vec, w, b)
        zs = ", ".join(f"avg({f}) AS z{j}_{tag}" for j, f in enumerate(feats))
        cs = ", ".join(f"avg(({vec})[{k + 1}]::DOUBLE) AS c{k}_{tag}"
                       for k in range(dim))
        return (f"SELECT count(*) AS n_{tag}, {zs}, {cs} FROM embeddings "
                f"WHERE {where} AND embedding IS NOT NULL "
                f"AND len(embedding) = {dim}")

    a = side("vec_id % 2 = 0", "embedding", "a")
    bq = side("vec_id % 2 = 1",
              "list_transform(embedding, x -> x::DOUBLE + 0.25)", "b")
    mmd = " + ".join(f"(z{j}_a - z{j}_b) * (z{j}_a - z{j}_b)" for j in range(d))
    dot = " + ".join(f"c{k}_a * c{k}_b" for k in range(dim))
    na = " + ".join(f"c{k}_a * c{k}_a" for k in range(dim))
    nb = " + ".join(f"c{k}_b * c{k}_b" for k in range(dim))
    return f"""
    WITH a AS ({a}), b AS ({bq})
    SELECT n_a::BIGINT AS n_ref, n_b::BIGINT AS n_cur,
           round(({mmd}) * {2.0 / d!r}, 6) AS mmd2,
           round(CASE WHEN ({na}) > 0 AND ({nb}) > 0
                      THEN ({dot}) / (sqrt({na}) * sqrt({nb})) END, 6)
           AS centroid_cos
    FROM a, b
    """


def q_embedding_drift_ts_embeddings(spark, sf_dir):
    """Embedding-drift time series: vec_id % 3 assigns each vector a
    deterministic synthetic day, and each day's RFF feature means are
    compared to day 0's. One groupBy(window) agg whose shuffle carries
    O(windows x n_features) partials — vectors never enter an
    exchange."""
    from deepchecks_spark.drift.embedding import embedding_drift_timeseries

    emb = _t(spark, sf_dir, "embeddings").selectExpr(
        "timestamp(date_add(date'2024-01-01', cast(vec_id % 3 as int))) AS ts",
        "embedding")
    return embedding_drift_timeseries(emb, "ts", "embedding", dim=64,
                                      n_features=16)


def o_embedding_drift_ts_embeddings():
    from deepchecks_spark.drift.embedding import rff_oracle_sql, rff_params

    dim, d = 64, 16
    w, b = rff_params(dim, d, 1.0 / dim)
    feats = rff_oracle_sql("v", w, b)
    zs = ", ".join(f"avg({f}) AS z{j}" for j, f in enumerate(feats))
    bs = ", ".join(f"z{j} AS b{j}" for j in range(d))
    mmd = " + ".join(f"(m.z{j} - base.b{j}) * (m.z{j} - base.b{j})"
                     for j in range(d))
    return f"""
    WITH r AS (SELECT strftime(DATE '2024-01-01' + (vec_id % 3)::INT,
                               '%Y-%m-%d %H:%M:%S') AS w,
                      embedding AS v
               FROM embeddings
               WHERE embedding IS NOT NULL AND len(embedding) = {dim}),
    m AS (SELECT w, count(*) AS n, {zs} FROM r GROUP BY w),
    base AS (SELECT {bs} FROM m WHERE w = (SELECT min(w) FROM m))
    SELECT m.w AS window_start, m.n::BIGINT AS n_rows,
           round(({mmd}) * {2.0 / d!r}, 6) AS mmd2
    FROM m, base ORDER BY 1
    """


def q_unigram_js_documents(spark, sf_dir):
    """Lexical drift between the English and non-English documents:
    Jensen-Shannon divergence of the two unigram distributions over the
    union vocabulary. Two map-side-combined token groupBys (reused by
    the totals branch via exchange reuse), one vocab-sized join, one
    final sum."""
    from deepchecks_spark.pipeline.textstats import unigram_js_divergence

    docs = _t(spark, sf_dir, "documents")
    return unigram_js_divergence(docs.filter(F.col("lang") == "en"),
                                 docs.filter(F.col("lang") != "en"), "text")


def o_unigram_js_documents():
    import math

    return rf"""
    WITH toks_a AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE lang = 'en' AND length(trim(text)) > 0),
    toks_b AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE lang <> 'en' AND length(trim(text)) > 0),
    ca AS (SELECT tok, count(*) AS na FROM toks_a GROUP BY 1),
    cb AS (SELECT tok, count(*) AS nb FROM toks_b GROUP BY 1),
    j AS (SELECT coalesce(ca.na, 0) AS na, coalesce(cb.nb, 0) AS nb
          FROM ca FULL OUTER JOIN cb USING (tok)),
    t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM j),
    c AS (SELECT na, nb,
                 na / (SELECT ta FROM t)::DOUBLE AS p,
                 nb / (SELECT tb FROM t)::DOUBLE AS q
          FROM j)
    SELECT (SELECT ta FROM t)::BIGINT AS n_tokens_a,
           (SELECT tb FROM t)::BIGINT AS n_tokens_b,
           sum(CASE WHEN na > 0 THEN 1 ELSE 0 END)::BIGINT AS n_types_a,
           sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END)::BIGINT AS n_types_b,
           count(*)::BIGINT AS n_types_union,
           round(sum(CASE WHEN na > 0 THEN 0.5 * p * ln(p / ((p + q) / 2.0))
                          ELSE 0.0 END
                     + CASE WHEN nb > 0 THEN 0.5 * q * ln(q / ((p + q) / 2.0))
                            ELSE 0.0 END), 6) AS js_divergence,
           round(sum(CASE WHEN na > 0 THEN 0.5 * p * ln(p / ((p + q) / 2.0))
                          ELSE 0.0 END
                     + CASE WHEN nb > 0 THEN 0.5 * q * ln(q / ((p + q) / 2.0))
                            ELSE 0.0 END) / {math.log(2.0)!r}, 6)
           AS js_normalized
    FROM c
    """


# ---------------------------------------------------------------------------
# web-graph operators (pipeline/webgraph.py)
# ---------------------------------------------------------------------------

# deterministic 19-node link graph from doc_id arithmetic: sources are
# the 10 even nodes, destinations a quadratic-residue spread over all 19
# nodes, so the 9 odd nodes are DANGLING (dst-only) and every iteration
# moves real dangling mass; some (src, dst) pairs collide into
# self-loops. Both engines derive the identical edge set from the same
# table, whatever the scale factor.
_LINK_SRC_SQL = "CAST(2 * (doc_id % 10) AS BIGINT)"
_LINK_DST_SQL = ("CAST((6 * (doc_id % 10) + (doc_id % 7) * (doc_id % 7)) % 19 "
                 "AS BIGINT)")
_LINK_EDGES_CTE = (f"SELECT DISTINCT {_LINK_SRC_SQL} AS src, "
                   f"{_LINK_DST_SQL} AS dst FROM documents")


def q_pagerank_documents(spark, sf_dir):
    """Fixed-iteration PageRank over the arithmetic link fixture. The
    oracle UNROLLS the power method in pure SQL (two full iterations:
    contribution join + dangling-mass redistribution + damping), with
    the floating-point association matched to the engine's update rule,
    so a slip anywhere — edge dedup, out-degree, dangling handling,
    damping placement — shifts every rank and breaks the hash."""
    from deepchecks_spark.pipeline.webgraph import pagerank

    edges = _t(spark, sf_dir, "documents").selectExpr(
        _LINK_SRC_SQL + " AS src", _LINK_DST_SQL + " AS dst")
    out = pagerank(edges, n_iterations=2)
    return out.select("id", F.round("rank", 6).alias("rank"))


def o_pagerank_documents():
    # one unrolled power-method iteration, parameterized by the previous
    # rank CTE; association matches the engine: base = 0.15/n + 0.85*dm/n
    # computed first, then + 0.85*contrib
    def step(i, prev):
        return f"""
    c{i} AS (SELECT e.dst AS id, sum({prev}.r / deg.d) AS c
             FROM e JOIN {prev} ON e.src = {prev}.id
                    JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
    d{i} AS (SELECT coalesce(sum(r), 0.0) AS dm FROM {prev}
             WHERE id NOT IN (SELECT src FROM e)),
    r{i} AS (SELECT nodes.id,
                    (0.15 / (SELECT n FROM nn)
                     + 0.85 * (SELECT dm FROM d{i}) / (SELECT n FROM nn))
                    + 0.85 * coalesce(c{i}.c, 0.0) AS r
             FROM nodes LEFT JOIN c{i} ON nodes.id = c{i}.id)"""

    return f"""
    WITH e AS ({_LINK_EDGES_CTE}),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
    {step(1, 'r0')},
    {step(2, 'r1')}
    SELECT id, round(r, 6) AS rank FROM r2 ORDER BY id
    """


_FUZZY_LEFT_SQL = (
    "concat('site', CAST(doc_id % 137 AS STRING), '.com/path',"
    " CAST(doc_id % 7 AS STRING))"
)
_FUZZY_RIGHT_SQL = (
    # every 3rd key drops its last character — a distance-1 deletion
    "CASE WHEN doc_id % 3 = 0 THEN "
    "substring(concat('site', CAST(doc_id % 137 AS STRING), '.com/path',"
    " CAST(doc_id % 7 AS STRING)), 1, length(concat('site',"
    " CAST(doc_id % 137 AS STRING), '.com/path',"
    " CAST(doc_id % 7 AS STRING))) - 1) "
    "ELSE concat('site', CAST(doc_id % 137 AS STRING), '.com/path',"
    " CAST(doc_id % 7 AS STRING)) END"
)
_DUCK_FUZZY_LEFT = (
    "'site' || CAST(doc_id % 137 AS VARCHAR) || '.com/path'"
    " || CAST(doc_id % 7 AS VARCHAR)"
)
_DUCK_FUZZY_RIGHT = (
    "CASE WHEN doc_id % 3 = 0 THEN "
    "substring('site' || CAST(doc_id % 137 AS VARCHAR) || '.com/path'"
    " || CAST(doc_id % 7 AS VARCHAR), 1, length('site'"
    " || CAST(doc_id % 137 AS VARCHAR) || '.com/path'"
    " || CAST(doc_id % 7 AS VARCHAR)) - 1) "
    "ELSE 'site' || CAST(doc_id % 137 AS VARCHAR) || '.com/path'"
    " || CAST(doc_id % 7 AS VARCHAR) END"
)


def q_robots_compliance_documents(spark, sf_dir):
    """Robots.txt compliance audit (pipeline/webclean.py::
    parse_robots_rules + robots_disallowed — Arrow-batched per-host
    parse, one host equi-join, codegen longest-match argmax): planted
    robots for the EVEN hosts (Disallow /private/ with a longer
    /private/ok Allow carve-out), URLs spread across four path shapes.
    The oracle computes the expected verdict arithmetically from the
    construction — it never parses robots — so any slip in grouping,
    precedence, longest-match, or missing-host defaults flips rows."""
    from deepchecks_spark.pipeline.webclean import (
        parse_robots_rules,
        robots_disallowed,
    )

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 400")
    urls = docs.selectExpr(
        "doc_id",
        "concat('http://h', CAST(doc_id % 20 AS STRING), '.com', "
        "CASE CAST(doc_id % 4 AS INT) "
        "WHEN 0 THEN concat('/pub/', CAST(doc_id AS STRING)) "
        "WHEN 1 THEN concat('/private/x', CAST(doc_id AS STRING)) "
        "WHEN 2 THEN concat('/private/okay', CAST(doc_id AS STRING)) "
        "ELSE '/private/ok' END) AS url")
    robots = (docs.selectExpr("CAST(doc_id % 20 AS INT) AS hid")
              .filter("hid % 2 = 0").distinct()
              .selectExpr(
                  "concat('h', CAST(hid AS STRING), '.com') AS host",
                  "'User-agent: *\\nDisallow: /private/\\nAllow: /private/ok\\n'"
                  " AS robots"))
    rules = parse_robots_rules(robots, "host", "robots")
    return (robots_disallowed(urls, rules, "url")
            .select("doc_id", "url", "robots_allowed"))


def o_robots_compliance_documents():
    return """
    SELECT doc_id,
           'http://h' || CAST(doc_id % 20 AS VARCHAR) || '.com' ||
           CASE doc_id % 4
             WHEN 0 THEN '/pub/' || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN '/private/x' || CAST(doc_id AS VARCHAR)
             WHEN 2 THEN '/private/okay' || CAST(doc_id AS VARCHAR)
             ELSE '/private/ok' END AS url,
           CASE WHEN (doc_id % 20) % 2 = 1 THEN TRUE   -- no robots: allowed
                WHEN doc_id % 4 = 1 THEN FALSE         -- /private/ disallow
                ELSE TRUE                              -- pub / allow carve-out
           END AS robots_allowed
    FROM documents WHERE doc_id < 400
    """


def q_fold_accents_documents(spark, sf_dir):
    """Accent folding (pipeline/textstats.py::fold_accents — one
    codegen'd translate over a unicodedata-generated 1:1 map, zero
    shuffle) on planted accented rewrites. The oracle is DuckDB's
    INDEPENDENT utf8proc strip_accents implementation — two different
    engines, two different algorithms, demanded byte-equal (including
    the non-decomposable ł/ß/æ/œ/ð pass-throughs)."""
    from deepchecks_spark.pipeline.textstats import fold_accents

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 200").selectExpr(
        "doc_id",
        "CASE CAST(doc_id % 4 AS INT) "
        "WHEN 0 THEN concat('café résumé naïvety № ', CAST(doc_id AS STRING)) "
        "WHEN 1 THEN concat('ÀÉÎÕÜ çĆčŘż Zürich ', CAST(doc_id AS STRING)) "
        "WHEN 2 THEN concat('ł ß æ œ ð untouched ', CAST(doc_id AS STRING)) "
        "ELSE text END AS text")
    return fold_accents(docs, "text", "folded").select("doc_id", "folded")


def o_fold_accents_documents():
    return """
    SELECT doc_id,
           strip_accents(CASE doc_id % 4
             WHEN 0 THEN 'café résumé naïvety № ' || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN 'ÀÉÎÕÜ çĆčŘż Zürich ' || CAST(doc_id AS VARCHAR)
             WHEN 2 THEN 'ł ß æ œ ð untouched ' || CAST(doc_id AS VARCHAR)
             ELSE text END) AS folded
    FROM documents WHERE doc_id < 200
    """


def q_fuzzy_keys_documents(spark, sf_dir):
    """Typo-tolerant key join (pipeline/relational.py::
    fuzzy_key_matches — SymSpell symmetric-delete blocking, provably
    full recall at Levenshtein distance 1, no cartesian): crawl-A keys
    vs crawl-B keys where every third B key dropped its last
    character. Because recall is complete, the oracle brute-forces the
    ground truth with DuckDB's independent levenshtein over the
    bounded distinct key sets and demands exact equality."""
    from deepchecks_spark.pipeline.relational import fuzzy_key_matches

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 400")
    left = docs.selectExpr(_FUZZY_LEFT_SQL + " AS url")
    right = docs.selectExpr(_FUZZY_RIGHT_SQL + " AS url")
    return fuzzy_key_matches(left, right, "url")


def o_fuzzy_keys_documents():
    return f"""
    WITH l AS (SELECT DISTINCT {_DUCK_FUZZY_LEFT} AS k
               FROM documents WHERE doc_id < 400),
         r AS (SELECT DISTINCT {_DUCK_FUZZY_RIGHT} AS k
               FROM documents WHERE doc_id < 400)
    SELECT l.k AS key_a, r.k AS key_b,
           levenshtein(l.k, r.k)::INT AS dist
    FROM l CROSS JOIN r
    WHERE levenshtein(l.k, r.k) <= 1
    """


def q_trustrank_documents(spark, sf_dir):
    """TrustRank over the arithmetic link fixture, seeded with the two
    lexicographically-first source hosts (pipeline/webgraph.py::
    trustrank). The oracle unrolls the personalized power method in
    pure SQL — teleport vector on the seed set, dangling mass
    redistributed BY the teleport vector, float association matched to
    the engine — so any slip in personalization, seeding, or damping
    shifts every rank and breaks the hash."""
    from deepchecks_spark.pipeline.webgraph import trustrank

    edges = _t(spark, sf_dir, "documents").selectExpr(
        _LINK_SRC_SQL + " AS src", _LINK_DST_SQL + " AS dst")
    seeds = [r["src"] for r in
             edges.select("src").distinct().orderBy("src").limit(2).collect()]
    out = trustrank(edges, seeds, n_iterations=2)
    return out.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


def o_trustrank_documents():
    def step(i, prev):
        return f"""
    c{i} AS (SELECT e.dst AS id, sum({prev}.r / deg.d) AS c
             FROM e JOIN {prev} ON e.src = {prev}.id
                    JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
    d{i} AS (SELECT coalesce(sum(r), 0.0) AS dm FROM {prev}
             WHERE id NOT IN (SELECT src FROM e)),
    r{i} AS (SELECT vv.id,
                    ((1.0 - 0.85) * vv.v
                     + (0.85 * (SELECT dm FROM d{i})) * vv.v)
                    + 0.85 * coalesce(c{i}.c, 0.0) AS r
             FROM vv LEFT JOIN c{i} ON vv.id = c{i}.id)"""

    return f"""
    WITH e AS ({_LINK_EDGES_CTE}),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    seeds AS (SELECT DISTINCT src FROM e ORDER BY src LIMIT 2),
    ns AS (SELECT count(*)::DOUBLE AS n FROM nodes
           WHERE id IN (SELECT src FROM seeds)),
    vv AS (SELECT id, CASE WHEN id IN (SELECT src FROM seeds)
                           THEN 1.0 / (SELECT n FROM ns)
                           ELSE 0.0 END AS v FROM nodes),
    deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),
    r0 AS (SELECT id, v AS r FROM vv),
    {step(1, 'r0')},
    {step(2, 'r1')}
    SELECT id, round(r, 6) AS rank FROM r2 ORDER BY id
    """


def q_linkgraph_documents(spark, sf_dir):
    """Link-graph structural profile over the same fixture. The oracle
    recomputes every number with independent SQL strategies (NOT IN for
    dangling, EXISTS self-join for reciprocity, grouped-count subqueries
    for degree extremes) against the engine's anti-join/semi-join
    plan."""
    from deepchecks_spark.pipeline.webgraph import link_graph_summary

    edges = _t(spark, sf_dir, "documents").selectExpr(
        _LINK_SRC_SQL + " AS src", _LINK_DST_SQL + " AS dst")
    out = link_graph_summary(edges)
    return out.select(
        "n_nodes", "n_edges", "n_dangling", "n_self_loops",
        F.round("reciprocity", 6).alias("reciprocity"),
        F.round("avg_out_degree", 6).alias("avg_out_degree"),
        "max_out_degree", "max_in_degree",
    )


def o_linkgraph_documents():
    return f"""
    WITH e AS ({_LINK_EDGES_CTE}),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
    SELECT (SELECT count(*) FROM nodes)::BIGINT AS n_nodes,
           (SELECT count(*) FROM e)::BIGINT AS n_edges,
           (SELECT count(*) FROM nodes
            WHERE id NOT IN (SELECT src FROM e))::BIGINT AS n_dangling,
           (SELECT count(*) FROM e WHERE src = dst)::BIGINT AS n_self_loops,
           round((SELECT count(*) FROM e a
                  WHERE a.src <> a.dst AND EXISTS
                        (SELECT 1 FROM e b
                         WHERE b.src = a.dst AND b.dst = a.src))
                 / (SELECT count(*) FROM e WHERE src <> dst)::DOUBLE,
                 6) AS reciprocity,
           round((SELECT count(*) FROM e)
                 / (SELECT count(*) FROM nodes)::DOUBLE, 6) AS avg_out_degree,
           (SELECT max(c) FROM (SELECT count(*) AS c FROM e GROUP BY src)
            )::BIGINT AS max_out_degree,
           (SELECT max(c) FROM (SELECT count(*) AS c FROM e GROUP BY dst)
            )::BIGINT AS max_in_degree
    """


# ---------------------------------------------------------------------------
# calibration-bin ECE + confident-joint label noise (checks/performance.py)
# ---------------------------------------------------------------------------

# exact-grid probability fixture with PLANTED 20% misprediction: the
# positive-class numerator lives in [513, 1023] when the model is
# "right" (XOR of true label and the every-5th flip) and [0, 510]
# otherwise — never 512, so argmax ties are impossible and every
# comparison sits on the 2^-10 grid, exact in both engines.
_ECE_NUM_SQL = (
    "CASE WHEN ((label % 2 = 1) AND vec_id % 5 <> 0)"
    "       OR ((label % 2 = 0) AND vec_id % 5 = 0)"
    "     THEN 513 + (vec_id * 13) % 511"
    "     ELSE (vec_id * 13) % 511 END"
)


def q_ece_embeddings(spark, sf_dir):
    """ExpectedCalibrationError: binned reliability from probability
    columns, ONE n_bins-bounded aggregation. Confidence hits 1.0 for
    some rows (numerator 0 → p0 = 1.0), so the oracle also locks the
    top-bin CLAMP (⌊1.0·8⌋ = 8 → bin 7). The scalar ECE is re-derived
    in SQL as Σ n·|acc − conf| / Σ n and attached to every row."""
    from deepchecks_spark.checks.performance import ExpectedCalibrationError

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        "CAST(label % 2 AS INT) AS y",
        f"({_ECE_NUM_SQL}) / 1024.0 AS p1",
        f"1.0 - ({_ECE_NUM_SQL}) / 1024.0 AS p0",
    )
    ds = Dataset(df, label="y", infer_categorical=False)
    value, _ = ExpectedCalibrationError(
        {0: "p0", 1: "p1"}, n_bins=8).compute(_ctx(ds), "train")
    rows = [(b["bin"], b["n_samples"], float(b["avg_confidence"]),
             float(b["accuracy"]), float(value["ece"])) for b in value["bins"]]
    out = spark.createDataFrame(
        rows, "bin int, n bigint, avg_confidence double, accuracy double, "
              "ece double")
    # SQL-side HALF_UP rounding (Python round() is half-even — a bin
    # accuracy like 105/128 = 0.8203125 would disagree with the oracle)
    return out.select(
        "bin", "n",
        F.round("avg_confidence", 6).alias("avg_confidence"),
        F.round("accuracy", 6).alias("accuracy"),
        F.round("ece", 6).alias("ece"))


def o_ece_embeddings():
    return f"""
    WITH d AS (SELECT label % 2 AS y, ({_ECE_NUM_SQL}) AS num
               FROM embeddings WHERE label IS NOT NULL),
    e AS (SELECT y, num / 1024.0 AS p1, 1.0 - num / 1024.0 AS p0 FROM d),
    f AS (SELECT y,
                 CASE WHEN p1 > p0 THEN p1 ELSE p0 END AS conf,
                 CASE WHEN p1 > p0 THEN 1 ELSE 0 END AS pred
          FROM e),
    g AS (SELECT CAST(least(floor(conf * 8), 7) AS INT) AS bin, conf,
                 CASE WHEN pred = y THEN 1.0 ELSE 0.0 END AS ok
          FROM f),
    b AS (SELECT bin, count(*)::BIGINT AS n, avg(conf) AS c, avg(ok) AS a
          FROM g GROUP BY bin)
    SELECT bin, n, round(c, 6) AS avg_confidence, round(a, 6) AS accuracy,
           round((SELECT sum(n * abs(a - c)) FROM b)
                 / (SELECT sum(n) FROM b)::DOUBLE, 6) AS ece
    FROM b ORDER BY bin
    """


# confident-joint fixture: probabilities concentrate on the TRUE class
# t = label%3 (even numerator 600-898), a second class (t+1)%3 carries
# an ODD numerator 401-697 — sometimes above the 500/1024 threshold and
# sometimes the argmax, never tying the even true-class numerator — and
# the third class stays below threshold; 1 in 7 GIVEN labels is flipped,
# so the off-diagonal mass of the joint recovers the planted noise.
_LN_CASE = (
    "CASE WHEN label % 3 = {j} THEN 600 + 2 * ((vec_id * 11) % 150) "
    "WHEN (label % 3 + 1) % 3 = {j} THEN 401 + 2 * ((vec_id * 17) % 149) "
    "ELSE (vec_id * 23) % 200 END / 1024.0"
)
_LN_GIVEN_SQL = ("CAST(CASE WHEN vec_id % 7 = 0 THEN (label % 3 + 1) % 3 "
                 "ELSE label % 3 END AS INT)")


def q_label_noise_embeddings(spark, sf_dir):
    """LabelNoiseEstimate (confident joint, Northcutt et al. 2021) with
    explicit grid thresholds: the oracle re-derives the confident
    argmax with a DIFFERENT strategy (−1 sentinel masking vs the
    engine's null-skipping greatest) and recomputes the off-diagonal
    noise rate from its own joint."""
    from deepchecks_spark.checks.performance import LabelNoiseEstimate

    df = _t(spark, sf_dir, "embeddings").selectExpr(
        _LN_GIVEN_SQL + " AS y",
        _LN_CASE.format(j=0) + " AS p0",
        _LN_CASE.format(j=1) + " AS p1",
        _LN_CASE.format(j=2) + " AS p2",
    )
    ds = Dataset(df, label="y", infer_categorical=False)
    th = 500 / 1024.0
    value, _ = LabelNoiseEstimate(
        {0: "p0", 1: "p1", 2: "p2"},
        thresholds={0: th, 1: th, 2: th}).compute(_ctx(ds), "train")
    n_conf = value["n_confident"]
    rows = [(int(g), int(p), int(n), n / n_conf, float(value["noise_rate"]))
            for (g, p), n in sorted(value["confident_joint"].items())]
    out = spark.createDataFrame(
        rows, "given_label int, predicted_label int, n bigint, frac double, "
              "noise_rate double")
    return out.select(
        "given_label", "predicted_label", "n",
        F.round("frac", 6).alias("frac"),
        F.round("noise_rate", 6).alias("noise_rate"))


def o_label_noise_embeddings():
    p = {j: _LN_CASE.format(j=j) for j in (0, 1, 2)}
    return f"""
    WITH d AS (SELECT {_LN_GIVEN_SQL} AS g,
                      {p[0]} AS p0, {p[1]} AS p1, {p[2]} AS p2
               FROM embeddings WHERE label IS NOT NULL),
    m AS (SELECT g,
                 CASE WHEN p0 >= 500 / 1024.0 THEN p0 ELSE -1.0 END AS m0,
                 CASE WHEN p1 >= 500 / 1024.0 THEN p1 ELSE -1.0 END AS m1,
                 CASE WHEN p2 >= 500 / 1024.0 THEN p2 ELSE -1.0 END AS m2
          FROM d),
    x AS (SELECT g, m0, m1, m2, greatest(m0, m1, m2) AS conf FROM m),
    c AS (SELECT g, CASE WHEN m0 = conf THEN 0
                         WHEN m1 = conf THEN 1 ELSE 2 END AS pred
          FROM x WHERE conf >= 0),
    j AS (SELECT g AS given_label, pred AS predicted_label,
                 count(*)::BIGINT AS n
          FROM c GROUP BY g, pred)
    SELECT given_label, predicted_label, n,
           round(n / (SELECT sum(n) FROM j)::DOUBLE, 6) AS frac,
           round((SELECT sum(CASE WHEN given_label <> predicted_label
                                  THEN n ELSE 0 END) FROM j)
                 / (SELECT sum(n) FROM j)::DOUBLE, 6) AS noise_rate
    FROM j ORDER BY given_label, predicted_label
    """


# ---------------------------------------------------------------------------
# html → outlink extraction + host-level edge list (pipeline/webgraph.py)
# ---------------------------------------------------------------------------

# page URL + html body synthesized arithmetically from doc_id; the html
# exercises every resolution branch (root-relative, directory-relative,
# absolute-with-fragment, dropped mailto, protocol-relative on every
# 10th doc) and the oracle re-derives the RESOLVED urls in closed form —
# never running the href regex, so a slip in extraction, base-directory
# arithmetic, or fragment stripping breaks the value hash.
_PAGE_URL_SQL = (
    "'https://site' || CAST(doc_id % 7 AS STRING) || '.example/d' || "
    "CAST(doc_id % 3 AS STRING) || '/p' || CAST(doc_id AS STRING) || '.html'"
)
_PAGE_HTML_SQL = (
    "'<p>x</p><a href=\"/l/' || CAST((doc_id * 13) % 50 AS STRING) || "
    "'\">a</a><a href=\"rel' || CAST(doc_id % 5 AS STRING) || '\">b</a>"
    "<a href=\"https://ext' || CAST(doc_id % 4 AS STRING) || '.example/p' || "
    "CAST(doc_id AS STRING) || '#f\">c</a><a href=\"mailto:x@y\">d</a>' || "
    "CASE WHEN doc_id % 10 = 0 THEN '<a href=\"//cdn.example/z\">e</a>' "
    "ELSE '' END"
)


def q_extract_links_documents(spark, sf_dir):
    """extract_links: href anchors parsed out of html and resolved
    against the page URL (RFC 3986 common cases), one row per outlink.
    Zero-shuffle codegen projection — plan-pinned in test_plans."""
    from deepchecks_spark.pipeline.webgraph import extract_links

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _PAGE_URL_SQL + " AS url", _PAGE_HTML_SQL + " AS html")
    out = extract_links(pages, "html", "url", keep_cols=["doc_id"])
    return out.orderBy("doc_id", "link_url")


def o_extract_links_documents():
    return f"""
    WITH d AS (SELECT doc_id,
                      'https://site' || CAST(doc_id % 7 AS STRING) ||
                      '.example' AS origin,
                      'https://site' || CAST(doc_id % 7 AS STRING) ||
                      '.example/d' || CAST(doc_id % 3 AS STRING) || '/' AS dir
               FROM documents),
    links AS (
        SELECT doc_id, origin || '/l/' ||
               CAST((doc_id * 13) % 50 AS STRING) AS link_url FROM d
        UNION ALL
        SELECT doc_id, dir || 'rel' || CAST(doc_id % 5 AS STRING) FROM d
        UNION ALL
        SELECT doc_id, 'https://ext' || CAST(doc_id % 4 AS STRING) ||
               '.example/p' || CAST(doc_id AS STRING) FROM d
        UNION ALL
        SELECT doc_id, 'https://cdn.example/z' FROM d WHERE doc_id % 10 = 0
    )
    SELECT doc_id, link_url FROM links ORDER BY doc_id, link_url
    """


def q_host_edges_documents(spark, sf_dir):
    """host_edges over extract_links: the distinct host→host reduction
    (intra-host links dropped, hosts lower-cased) that host-level
    PageRank consumes. The oracle never touches html — it enumerates
    the expected (site_k, target) pairs from doc_id arithmetic."""
    from deepchecks_spark.pipeline.webgraph import extract_links, host_edges

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _PAGE_URL_SQL + " AS url", _PAGE_HTML_SQL + " AS html")
    links = extract_links(pages, "html", "url", keep_cols=["url"])
    return host_edges(links, "url", "link_url").orderBy("src", "dst")


def o_host_edges_documents():
    # /l/ and rel links stay on the page's own host (dropped); the
    # absolute ext link and the every-10th cdn link cross hosts
    return """
    WITH e AS (
        SELECT DISTINCT 'site' || CAST(doc_id % 7 AS STRING) || '.example'
                   AS src,
               'ext' || CAST(doc_id % 4 AS STRING) || '.example' AS dst
        FROM documents
        UNION
        SELECT DISTINCT 'site' || CAST(doc_id % 7 AS STRING) || '.example',
               'cdn.example'
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT src, dst FROM e ORDER BY src, dst
    """


# page-metadata fixture: every field's presence keyed to a different
# doc_id modulus so absence/NULL paths are exercised at every SF; the
# oracle re-derives the EXPECTED metadata in closed form from doc_id —
# it never parses html, so a regex slip breaks the hash
_META_HTML_SQL = (
    "'<html><head><title> Doc ' || CAST(doc_id AS STRING) || ' </title>' || "
    "CASE WHEN doc_id % 4 = 0 THEN "
    "'<meta name=\"description\" content=\"d' || CAST(doc_id % 9 AS STRING) || '\">' "
    "WHEN doc_id % 4 = 1 THEN "
    "'<meta content=\"r' || CAST(doc_id % 9 AS STRING) || '\" name=\"description\">' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN '<meta name=\"robots\" content=\"NOINDEX, nofollow\">' ELSE '' END || "
    "CASE WHEN doc_id % 3 = 0 THEN '<link rel=\"canonical\" href=\"https://c.example/' || CAST(doc_id AS STRING) || '\">' ELSE '' END || "
    "'</head><body>' || repeat('<a href=\"/x\">a</a>', CAST(doc_id % 3 AS INT)) || "
    "'</body></html>'"
)


def q_page_metadata_documents(spark, sf_dir):
    """extract_page_metadata: title / meta-description (both attribute
    orders) / robots-noindex / canonical / anchor count from html —
    zero-shuffle codegen projection (plan-pinned)."""
    from deepchecks_spark.pipeline.webclean import extract_page_metadata

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _META_HTML_SQL + " AS html")
    out = extract_page_metadata(pages, "html", keep_cols=["doc_id"])
    return out.orderBy("doc_id")


def o_page_metadata_documents():
    return """
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS STRING) AS title,
           CASE WHEN doc_id % 4 = 0 THEN 'd' || CAST(doc_id % 9 AS STRING)
                WHEN doc_id % 4 = 1 THEN 'r' || CAST(doc_id % 9 AS STRING)
                ELSE NULL END AS meta_description,
           doc_id % 5 = 0 AS robots_noindex,
           CASE WHEN doc_id % 3 = 0
                THEN 'https://c.example/' || CAST(doc_id AS STRING)
                ELSE NULL END AS canonical_url,
           CAST(doc_id % 3 AS INT) AS n_anchors
    FROM documents ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def _ctx(ds):
    from deepchecks_spark.core.context import Context

    return Context(train=ds)


QUERIES = {
    # never-driver-verified queries FIRST: the driver's correctness run
    # caps at the first 50 entries of this dict (VERDICT r4 next-1).
    "page_metadata_documents": q_page_metadata_documents,
    "extract_links_documents": q_extract_links_documents,
    "host_edges_documents": q_host_edges_documents,
    "pagerank_documents": q_pagerank_documents,
    "ivfadc_topk_embeddings": q_ivfadc_topk_embeddings,
    "ece_embeddings": q_ece_embeddings,
    "label_noise_embeddings": q_label_noise_embeddings,
    "embedding_drift_embeddings": q_embedding_drift_embeddings,
    "pq_topk_embeddings": q_pq_topk_embeddings,
    "unigram_js_documents": q_unigram_js_documents,
    "temporal_drift_events": q_temporal_drift_events,
    "contamination_report_documents": q_contamination_report_documents,
    "char_entropy_documents": q_char_entropy_documents,
    "pii_stats_documents": q_pii_stats_documents,
    "cluster_profile_documents": q_cluster_profile_documents,
    "tfidf_terms_documents": q_tfidf_terms_documents,
    "zipf_fit_documents": q_zipf_fit_documents,
    "ngram_overlap_documents": q_ngram_overlap_documents,
    "snapshot_row_diff_documents": q_snapshot_row_diff_documents,
    "stratified_sample_documents": q_stratified_sample_documents,
    "warc_roundtrip_documents": q_warc_roundtrip_documents,
    "metric_anomalies_events": q_metric_anomalies_events,
    "suggest_constraints_orders": q_suggest_constraints_orders,
    "schema_diff_documents": q_schema_diff_documents,
    "token_budget_selection_documents": q_token_budget_selection_documents,
    "latest_crawl_documents": q_latest_crawl_documents,
    "corpus_datacard_documents": q_corpus_datacard_documents,
    "constraints_orders": q_constraints_orders,
    "constraint_examples_orders": q_constraint_examples_orders,
    "semantic_decontam_embeddings": q_semantic_decontam_embeddings,
    "vocabulary_stats_documents": q_vocabulary_stats_documents,
    "top_terms_documents": q_top_terms_documents,
    "corpus_drift_documents": q_corpus_drift_documents,
    "performance_embeddings": q_performance_embeddings,
    "confusion_matrix_embeddings": q_confusion_matrix_embeddings,
    "train_test_performance_embeddings": q_train_test_performance_embeddings,
    "regression_performance_lineitem": q_regression_performance_lineitem,
    "weak_segments_orders": q_weak_segments_orders,
    "roc_auc_embeddings": q_roc_auc_embeddings,
    "calibration_embeddings": q_calibration_embeddings,
    "regression_error_dist_lineitem": q_regression_error_dist_lineitem,
    "simple_model_comparison_embeddings": q_simple_model_comparison_embeddings,
    "ivf_topk_embeddings": q_ivf_topk_embeddings,
    "performance_bias_orders": q_performance_bias_orders,
    "multi_model_embeddings": q_multi_model_embeddings,
    "streaming_dedup_events": q_streaming_dedup_events,
    "streaming_newcat_events": q_streaming_newcat_events,
    "referential_integrity_orders": q_referential_integrity_orders,
    "lsh_autotune_recall_embeddings": q_lsh_autotune_recall_embeddings,
    "dedup_clusters_documents": q_dedup_clusters_documents,
    # round-5 additions — kept inside the driver's 50-query window
    # (streaming_performance_events rotated just below: its streaming
    # siblings dedup/newcat/psi cover the family inside the window)
    "streaming_performance_events": q_streaming_performance_events,
    "incremental_minhash_documents": q_incremental_minhash_documents,
    "script_profile_documents": q_script_profile_documents,
    "bpe_pairs_documents": q_bpe_pairs_documents,
    "bpe_fertility_documents": q_bpe_fertility_documents,
    "language_agreement_documents": q_language_agreement_documents,
    "neardup_precision_documents": q_neardup_precision_documents,
    "streaming_constraints_events": q_streaming_constraints_events,
    "trustrank_documents": q_trustrank_documents,
    "fuzzy_keys_documents": q_fuzzy_keys_documents,
    "fold_accents_documents": q_fold_accents_documents,
    "robots_compliance_documents": q_robots_compliance_documents,
    "streaming_neardup_documents": q_streaming_neardup_documents,
    "filter_funnel_documents": q_filter_funnel_documents,
    "gopher_quality_documents": q_gopher_quality_documents,
    "unigram_logprob_documents": q_unigram_logprob_documents,
    "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
    "c4_clean_documents": q_c4_clean_documents,
    "pii_redaction_documents": q_pii_redaction_documents,
    "quality_classifier_documents": q_quality_classifier_documents,
    "incremental_dedup_documents": q_incremental_dedup_documents,
    "dsir_resample_documents": q_dsir_resample_documents,
    "embedding_integrity_embeddings": q_embedding_integrity_embeddings,
    # round-5: structure-discovery checks
    "fd_discovery_lineitem": q_fd_discovery_lineitem,
    "candidate_keys_lineitem": q_candidate_keys_lineitem,
    "benford_lineitem": q_benford_lineitem,
    "segment_completeness_documents": q_segment_completeness_documents,
    "freshness_events": q_freshness_events,
    # round-5: temporal/relational operators
    "asof_join_events": q_asof_join_events,
    "range_join_events": q_range_join_events,
    "sessionize_events": q_sessionize_events,
    "heavy_hitters_events": q_heavy_hitters_events,
    "skew_profile_orders": q_skew_profile_orders,
    "linkgraph_documents": q_linkgraph_documents,
    "embedding_drift_ts_embeddings": q_embedding_drift_ts_embeddings,
    # entries below rotate just outside the driver's 50-query window —
    # all remain locked by the identical local oracle gate
    # (test_entry_contract.py); each rotated row has a family sibling
    # inside the window (textstats rules, decontam, resampling, dedup)
    "domain_profile_documents": q_domain_profile_documents,
    "url_spam_documents": q_url_spam_documents,
    "boilerplate_lines_documents": q_boilerplate_lines_documents,
    "containment_adjacent_documents": q_containment_adjacent_documents,
    "crawl_churn_documents": q_crawl_churn_documents,
    "domain_blocklist_documents": q_domain_blocklist_documents,
    "nfc_normalize_documents": q_nfc_normalize_documents,
    "repetition_stats_documents": q_repetition_stats_documents,
    "decontamination_documents": q_decontamination_documents,
    "domain_mixture_documents": q_domain_mixture_documents,
    "repeated_spans_documents": q_repeated_spans_documents,
    "rebalance_classes_documents": q_rebalance_classes_documents,
    "duplicate_chunks_documents": q_duplicate_chunks_documents,
    "url_dedup_documents": q_url_dedup_documents,
    "line_dedup_documents": q_line_dedup_documents,
    "bigram_logprob_documents": q_bigram_logprob_documents,
    "perplexity_buckets_documents": q_perplexity_buckets_documents,
    "simple_model_comparison_strategies_embeddings":
        q_simple_model_comparison_strategies_embeddings,
    "mixture_sampling_documents": q_mixture_sampling_documents,
    "pack_sequences_documents": q_pack_sequences_documents,
    "token_shards_documents": q_token_shards_documents,
    "percent_of_nulls_lineitem": q_percent_of_nulls_lineitem,
    "is_single_value_orders": q_is_single_value_orders,
    "class_imbalance_embeddings": q_class_imbalance_embeddings,
    "data_duplicates_documents": q_data_duplicates_documents,
    "special_characters_documents": q_special_characters_documents,
    "text_length_quantiles_documents": q_text_length_quantiles_documents,
    "psi_orders_priority": q_psi_orders_priority,
    "cramers_v_events_type": q_cramers_v_events_type,
    "ks_lineitem_price": q_ks_lineitem_price,
    "emd_events_value": q_emd_events_value,
    "new_label_embeddings": q_new_label_embeddings,
    "date_leakage_overlap_orders": q_date_leakage_overlap_orders,
    "date_leakage_duplicates_orders": q_date_leakage_duplicates_orders,
    "index_leakage_events": q_index_leakage_events,
    "samples_mix_customer": q_samples_mix_customer,
    "datasets_size_orders": q_datasets_size_orders,
    "new_category_orders": q_new_category_orders,
    "exact_dedup_documents": q_exact_dedup_documents,
    "token_count_documents": q_token_count_documents,
    "text_quality_documents": q_text_quality_documents,
    "ngram_jaccard_adjacent_documents": q_ngram_jaccard_adjacent_documents,
    "embedding_cosine_topk": q_embedding_cosine_topk,
    "spearman_lineitem": q_spearman_lineitem,
    "theil_u_orders": q_theil_u_orders,
    "correlation_ratio_orders": q_correlation_ratio_orders,
    "pps_feature_label_events": q_pps_feature_label_events,
    "outlier_detection_events": q_outlier_detection_events,
    "multivariate_drift_orders": q_multivariate_drift_orders,
    "minhash_near_duplicates_documents": q_minhash_near_duplicates_documents,
    "simhash_documents": q_simhash_documents,
    "lsh_topk_embeddings": q_lsh_topk_embeddings,
    "language_id_documents": q_language_id_documents,
    "bpe_token_count_documents": q_bpe_token_count_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "string_length_outliers_documents": q_string_length_outliers_documents,
    "mixed_nulls_documents": q_mixed_nulls_documents,
    "mixed_data_types_orders": q_mixed_data_types_orders,
    "conflicting_labels_customer": q_conflicting_labels_customer,
    "string_mismatch_documents": q_string_mismatch_documents,
    "string_mismatch_comparison_documents": q_string_mismatch_comparison_documents,
    "feature_drift_orders": q_feature_drift_orders,
    "label_drift_embeddings": q_label_drift_embeddings,
    "identifier_label_correlation_events": q_identifier_label_correlation_events,
    "feature_label_corr_change_events": q_feature_label_corr_change_events,
    "minhash_recall_documents": q_minhash_recall_documents,
    "lsh_topk_clustered_embeddings": q_lsh_topk_clustered_embeddings,
    "columns_info_orders": q_columns_info_orders,
    "streaming_psi_events": q_streaming_psi_events,
    "multimodal_features_documents": q_multimodal_features_documents,
    "multimodal_dims_documents": q_multimodal_dims_documents,
    "bloom_incremental_dedup_documents": q_bloom_incremental_dedup_documents,
    "group_split_documents": q_group_split_documents,
    "partitioned_bloom_dedup_documents": q_partitioned_bloom_dedup_documents,
}

ORACLES = {
    "page_metadata_documents": o_page_metadata_documents(),
    "extract_links_documents": o_extract_links_documents(),
    "host_edges_documents": o_host_edges_documents(),
    "pagerank_documents": o_pagerank_documents(),
    "linkgraph_documents": o_linkgraph_documents(),
    "ece_embeddings": o_ece_embeddings(),
    "label_noise_embeddings": o_label_noise_embeddings(),
    "embedding_drift_embeddings": o_embedding_drift_embeddings(),
    "embedding_drift_ts_embeddings": o_embedding_drift_ts_embeddings(),
    "unigram_js_documents": o_unigram_js_documents(),
    "temporal_drift_events": o_temporal_drift_events(),
    "contamination_report_documents": o_contamination_report_documents(),
    "char_entropy_documents": o_char_entropy_documents(),
    "pii_stats_documents": o_pii_stats_documents(),
    "cluster_profile_documents": o_cluster_profile_documents(),
    "tfidf_terms_documents": o_tfidf_terms_documents(),
    "zipf_fit_documents": o_zipf_fit_documents(),
    "ngram_overlap_documents": o_ngram_overlap_documents(),
    "snapshot_row_diff_documents": o_snapshot_row_diff_documents(),
    "stratified_sample_documents": o_stratified_sample_documents(),
    "warc_roundtrip_documents": o_warc_roundtrip_documents(),
    "metric_anomalies_events": o_metric_anomalies_events(),
    "suggest_constraints_orders": o_suggest_constraints_orders(),
    "schema_diff_documents": o_schema_diff_documents(),
    "token_budget_selection_documents": o_token_budget_selection_documents(),
    "latest_crawl_documents": o_latest_crawl_documents(),
    "corpus_datacard_documents": o_corpus_datacard_documents(),
    "constraints_orders": o_constraints_orders(),
    "constraint_examples_orders": o_constraint_examples_orders(),
    "semantic_decontam_embeddings": o_semantic_decontam_embeddings(),
    "vocabulary_stats_documents": o_vocabulary_stats_documents(),
    "top_terms_documents": o_top_terms_documents(),
    "corpus_drift_documents": o_corpus_drift_documents(),
    "percent_of_nulls_lineitem": o_percent_of_nulls_lineitem(),
    "is_single_value_orders": o_is_single_value_orders(),
    "class_imbalance_embeddings": o_class_imbalance_embeddings(),
    "data_duplicates_documents": o_data_duplicates_documents(),
    "special_characters_documents": o_special_characters_documents(),
    "text_length_quantiles_documents": o_text_length_quantiles_documents(),
    "psi_orders_priority": o_psi_orders_priority(),
    "cramers_v_events_type": o_cramers_v_events_type(),
    "ks_lineitem_price": o_ks_lineitem_price(),
    "emd_events_value": o_emd_events_value(),
    "new_label_embeddings": o_new_label_embeddings(),
    "date_leakage_overlap_orders": o_date_leakage_overlap_orders(),
    "date_leakage_duplicates_orders": o_date_leakage_duplicates_orders(),
    "index_leakage_events": o_index_leakage_events(),
    "samples_mix_customer": o_samples_mix_customer(),
    "datasets_size_orders": o_datasets_size_orders(),
    "new_category_orders": o_new_category_orders(),
    "exact_dedup_documents": o_exact_dedup_documents(),
    "token_count_documents": o_token_count_documents(),
    "text_quality_documents": o_text_quality_documents(),
    "ngram_jaccard_adjacent_documents": o_ngram_jaccard_adjacent_documents(),
    "embedding_cosine_topk": o_embedding_cosine_topk(),
    "spearman_lineitem": o_spearman_lineitem(),
    "theil_u_orders": o_theil_u_orders(),
    "correlation_ratio_orders": o_correlation_ratio_orders(),
    "language_id_documents": o_language_id_documents(),
    "bpe_token_count_documents": o_bpe_token_count_documents(),
    "mixed_nulls_documents": o_mixed_nulls_documents(),
    "mixed_data_types_orders": o_mixed_data_types_orders(),
    "conflicting_labels_customer": o_conflicting_labels_customer(),
    "string_mismatch_documents": o_string_mismatch_documents(),
    "string_mismatch_comparison_documents": o_string_mismatch_comparison_documents(),
    "feature_drift_orders": o_feature_drift_orders(),
    "label_drift_embeddings": o_label_drift_embeddings(),
    "string_length_outliers_documents": o_string_length_outliers_documents(),
    "minhash_recall_documents": o_minhash_recall_documents(),
    "lsh_topk_clustered_embeddings": o_lsh_topk_clustered_embeddings(),
    "columns_info_orders": o_columns_info_orders(),
    "streaming_psi_events": o_streaming_psi_events(),
    "multimodal_features_documents": o_multimodal_features_documents(),
    # round-3: the formerly rows-only kernels, oracled via provable
    # fixtures — ppscore case-table decisions (id/constant → 0, perfect
    # predictor → 1), planted LoOP argmax, separable-domain AUC = 1,
    # planted-duplicate recall for MinHash/SimHash/fingerprint, and a
    # fully cross-engine-deterministic integer LSH index.
    "pps_feature_label_events": o_pps_feature_label_events(),
    "outlier_detection_events": o_outlier_detection_events(),
    "multivariate_drift_orders": o_multivariate_drift_orders(),
    "minhash_near_duplicates_documents": o_minhash_near_duplicates_documents(),
    "simhash_documents": o_simhash_documents(),
    "lsh_topk_embeddings": o_lsh_topk_embeddings(),
    "fingerprint_documents": o_fingerprint_documents(),
    "identifier_label_correlation_events": o_identifier_label_correlation_events(),
    "feature_label_corr_change_events": o_feature_label_corr_change_events(),
    "multimodal_dims_documents": o_multimodal_dims_documents(),
    "streaming_dedup_events": o_streaming_dedup_events(),
    "referential_integrity_orders": o_referential_integrity_orders(),
    "performance_embeddings": o_performance_embeddings(),
    # round-4: predictions-column model-evaluation surface
    "confusion_matrix_embeddings": o_confusion_matrix_embeddings(),
    "train_test_performance_embeddings": o_train_test_performance_embeddings(),
    "regression_performance_lineitem": o_regression_performance_lineitem(),
    "weak_segments_orders": o_weak_segments_orders(),
    "roc_auc_embeddings": o_roc_auc_embeddings(),
    "calibration_embeddings": o_calibration_embeddings(),
    "lsh_autotune_recall_embeddings": o_lsh_autotune_recall_embeddings(),
    "regression_error_dist_lineitem": o_regression_error_dist_lineitem(),
    "simple_model_comparison_embeddings": o_simple_model_comparison_embeddings(),
    "simple_model_comparison_strategies_embeddings":
        o_simple_model_comparison_strategies_embeddings(),
    "ivf_topk_embeddings": o_ivf_topk_embeddings(),
    "pq_topk_embeddings": o_pq_topk_embeddings(),
    "ivfadc_topk_embeddings": o_ivfadc_topk_embeddings(),
    "performance_bias_orders": o_performance_bias_orders(),
    "multi_model_embeddings": o_multi_model_embeddings(),
    "streaming_newcat_events": o_streaming_newcat_events(),
    "streaming_performance_events": o_streaming_performance_events(),
    "incremental_minhash_documents": o_incremental_minhash_documents(),
    "script_profile_documents": o_script_profile_documents(),
    "bpe_pairs_documents": o_bpe_pairs_documents(),
    "bpe_fertility_documents": o_bpe_fertility_documents(),
    "language_agreement_documents": o_language_agreement_documents(),
    "neardup_precision_documents": o_neardup_precision_documents(),
    "streaming_constraints_events": o_streaming_constraints_events(),
    "trustrank_documents": o_trustrank_documents(),
    "fuzzy_keys_documents": o_fuzzy_keys_documents(),
    "fold_accents_documents": o_fold_accents_documents(),
    "robots_compliance_documents": o_robots_compliance_documents(),
    "streaming_neardup_documents": o_streaming_neardup_documents(),
    "filter_funnel_documents": o_filter_funnel_documents(),
    "dedup_clusters_documents": o_dedup_clusters_documents(),
    # round-5: Gopher-style repetition signals + cross-corpus chunk dedup
    "domain_profile_documents": o_domain_profile_documents(),
    "containment_adjacent_documents": o_containment_adjacent_documents(),
    "crawl_churn_documents": o_crawl_churn_documents(),
    "domain_blocklist_documents": o_domain_blocklist_documents(),
    "nfc_normalize_documents": o_nfc_normalize_documents(),
    "url_spam_documents": o_url_spam_documents(),
    "boilerplate_lines_documents": o_boilerplate_lines_documents(),
    "repetition_stats_documents": o_repetition_stats_documents(),
    "duplicate_chunks_documents": o_duplicate_chunks_documents(),
    # round-5: rule filter, LM scoring, decontamination, semantic dedup
    "gopher_quality_documents": o_gopher_quality_documents(),
    "unigram_logprob_documents": o_unigram_logprob_documents(),
    "decontamination_documents": o_decontamination_documents(),
    "semantic_dedup_embeddings": o_semantic_dedup_embeddings(),
    # round-5: web-corpus cleaning (C4, PII, URL, line dedup, mixture)
    "c4_clean_documents": o_c4_clean_documents(),
    "pii_redaction_documents": o_pii_redaction_documents(),
    "url_dedup_documents": o_url_dedup_documents(),
    "line_dedup_documents": o_line_dedup_documents(),
    "domain_mixture_documents": o_domain_mixture_documents(),
    # round-5 (late): learned quality filter, stupid-backoff bigram LM,
    # CCNet perplexity buckets
    "quality_classifier_documents": o_quality_classifier_documents(),
    "bigram_logprob_documents": o_bigram_logprob_documents(),
    "perplexity_buckets_documents": o_perplexity_buckets_documents(),
    "repeated_spans_documents": o_repeated_spans_documents(),
    "incremental_dedup_documents": o_incremental_dedup_documents(),
    "mixture_sampling_documents": o_mixture_sampling_documents(),
    "pack_sequences_documents": o_pack_sequences_documents(),
    "token_shards_documents": o_token_shards_documents(),
    "dsir_resample_documents": o_dsir_resample_documents(),
    "rebalance_classes_documents": o_rebalance_classes_documents(),
    "embedding_integrity_embeddings": o_embedding_integrity_embeddings(),
    "fd_discovery_lineitem": o_fd_discovery_lineitem(),
    "candidate_keys_lineitem": o_candidate_keys_lineitem(),
    "benford_lineitem": o_benford_lineitem(),
    "segment_completeness_documents": o_segment_completeness_documents(),
    "freshness_events": o_freshness_events(),
    "asof_join_events": o_asof_join_events(),
    "range_join_events": o_range_join_events(),
    "sessionize_events": o_sessionize_events(),
    "heavy_hitters_events": o_heavy_hitters_events(),
    "skew_profile_orders": o_skew_profile_orders(),
    # round-5 (continuation): bloom-prefiltered incremental dedup — the
    # amortized batch-vs-corpus scale shape, oracle shared with the
    # exact path because the output is provably identical
    "bloom_incremental_dedup_documents": o_bloom_incremental_dedup_documents(),
    # round-5 (continuation): leakage-safe group split — md5-prefix
    # arithmetic recomputed verbatim by the oracle
    "group_split_documents": o_group_split_documents(),
    "partitioned_bloom_dedup_documents": o_partitioned_bloom_dedup_documents(),
}
