"""Temporal/relational operator tests: as-of join, range join,
sessionization, Misra-Gries heavy hitters, skew profiler
(deepchecks_spark/pipeline/relational.py) — hand-computed fixtures,
tie/tolerance/empty edges, and the scale-shape plan pins."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from deepchecks_spark.pipeline.relational import (
    asof_join,
    heavy_hitters,
    range_join,
    session_stats,
    sessionize,
    skew_profile,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


T0 = datetime(2024, 1, 1, 10, 0, 0)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, px): the "right"/reference side
    return spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(10), 2.0), ("a", _ts(20), 3.0),
         ("b", _ts(5), 10.0)],
        "k string, ts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    # (key, ts, qty): the "left" side
    return spark.createDataFrame(
        [("a", _ts(0), 1), ("a", _ts(9), 2), ("a", _ts(10), 3),
         ("a", _ts(25), 4), ("b", _ts(4), 5), ("c", _ts(1), 6)],
        "k string, ts timestamp, qty int")


class TestAsofJoin:
    def test_backward_semantics(self, trades, quotes):
        out = asof_join(trades, quotes, on=["k"], ts_col="ts")
        got = {(r["k"], r["qty"]): r["px"] for r in out.collect()}
        # exact-timestamp right rows match; earlier ones carry forward;
        # no right row yet (or no key) -> NULL
        assert got == {("a", 1): 1.0, ("a", 2): 1.0, ("a", 3): 2.0,
                       ("a", 4): 3.0, ("b", 5): None, ("c", 6): None}
        row = {r["qty"]: r["ts_right"] for r in out.collect()}
        assert row[3] == _ts(10) and row[1] == _ts(0) and row[5] is None

    def test_forward_semantics(self, trades, quotes):
        out = asof_join(trades, quotes, on=["k"], ts_col="ts",
                        direction="forward")
        got = {(r["k"], r["qty"]): r["px"] for r in out.collect()}
        assert got == {("a", 1): 1.0, ("a", 2): 2.0, ("a", 3): 2.0,
                       ("a", 4): None, ("b", 5): 10.0, ("c", 6): None}

    def test_tolerance_voids_stale_matches(self, trades, quotes):
        out = asof_join(trades, quotes, on=["k"], ts_col="ts",
                        tolerance_seconds=5 * 60)
        got = {r["qty"]: r["px"] for r in out.collect()}
        # qty=4 at +25min is 5min past the last quote at +20 -> keeps it
        # (exactly at tolerance); qty=2 at +9 is 9min past +0 -> voided
        assert got[4] == 3.0 and got[2] is None and got[1] == 1.0

    def test_left_rows_and_columns_preserved(self, trades, quotes):
        out = asof_join(trades, quotes, on=["k"], ts_col="ts")
        assert out.count() == trades.count()
        assert out.columns == ["k", "ts", "qty", "ts_right", "px"]

    def test_equal_right_timestamps_pick_greatest_payload(self, spark):
        left = spark.createDataFrame([("a", _ts(1), 1)],
                                     "k string, ts timestamp, qty int")
        right = spark.createDataFrame(
            [("a", _ts(0), 1.0), ("a", _ts(0), 9.0)],
            "k string, ts timestamp, px double")
        out = asof_join(left, right, on=["k"], ts_col="ts")
        assert out.collect()[0]["px"] == 9.0

    def test_equal_right_timestamps_forward_pick_greatest_payload(self, spark):
        left = spark.createDataFrame([("a", _ts(0), 1)],
                                     "k string, ts timestamp, qty int")
        right = spark.createDataFrame(
            [("a", _ts(1), 1.0), ("a", _ts(1), 9.0)],
            "k string, ts timestamp, px double")
        out = asof_join(left, right, on=["k"], ts_col="ts",
                        direction="forward")
        assert out.collect()[0]["px"] == 9.0

    def test_empty_right(self, spark, trades):
        right = spark.createDataFrame([], "k string, ts timestamp, px double")
        out = asof_join(trades, right, on=["k"], ts_col="ts")
        assert out.count() == trades.count()
        assert all(r["px"] is None for r in out.collect())

    def test_single_exchange_plan(self, trades, quotes):
        plan = _plan(asof_join(trades, quotes, on=["k"], ts_col="ts"))
        assert plan.count("Exchange") == 1
        assert "hashpartitioning(k" in plan
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct",
                    "SortMergeJoin"):
            assert bad not in plan

    def test_matches_duckdb_asof(self, spark, trades, quotes):
        duckdb = pytest.importorskip("duckdb")
        con = duckdb.connect()
        con.register("l", trades.toPandas())
        con.register("r", quotes.toPandas())
        want = sorted(map(tuple, con.sql(
            "SELECT l.k, l.ts, l.qty, r.ts, r.px FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts").fetchall()), key=repr)
        got = sorted(map(tuple, asof_join(
            trades, quotes, on=["k"], ts_col="ts").collect()), key=repr)
        assert got == want


class TestRangeJoin:
    @pytest.fixture(scope="class")
    def points(self, spark):
        return spark.createDataFrame(
            [("u", _ts(m), m) for m in (0, 3, 7, 12, 30)]
            + [("v", _ts(5), 100)],
            "k string, ts timestamp, pid int")

    @pytest.fixture(scope="class")
    def windows(self, spark):
        return spark.createDataFrame(
            [("u", _ts(2), _ts(8), 1), ("u", _ts(6), _ts(13), 2),
             ("v", _ts(0), _ts(1), 3)],
            "k string, w_start timestamp, w_end timestamp, wid int")

    def test_inclusive_containment_pairs(self, points, windows):
        out = range_join(points, windows, "ts", "w_start", "w_end", on=["k"])
        pairs = {(r["pid"], r["wid"]) for r in out.collect()}
        assert pairs == {(3, 1), (7, 1), (7, 2), (12, 2)}

    def test_explicit_bin_width_same_result(self, points, windows):
        out = range_join(points, windows, "ts", "w_start", "w_end",
                         on=["k"], bin_width_seconds=60)
        pairs = {(r["pid"], r["wid"]) for r in out.collect()}
        assert pairs == {(3, 1), (7, 1), (7, 2), (12, 2)}

    def test_numeric_domain_and_boundaries(self, spark):
        pts = spark.createDataFrame([(1.0, 1), (2.0, 2), (3.5, 3)],
                                    "x double, pid int")
        ivs = spark.createDataFrame([(1.0, 2.0, 10), (3.5, 3.5, 11)],
                                    "lo double, hi double, wid int")
        out = range_join(pts, ivs, "x", "lo", "hi")
        pairs = {(r["pid"], r["wid"]) for r in out.collect()}
        # both ends inclusive; zero-length interval matches its point
        assert pairs == {(1, 10), (2, 10), (3, 11)}

    def test_inverted_and_null_intervals_dropped(self, spark):
        pts = spark.createDataFrame([(5.0, 1)], "x double, pid int")
        ivs = spark.createDataFrame([(9.0, 1.0, 1), (None, 9.0, 2)],
                                    "lo double, hi double, wid int")
        assert range_join(pts, ivs, "x", "lo", "hi").count() == 0

    def test_overwide_interval_raises(self, spark):
        pts = spark.createDataFrame([(5.0, 1)], "x double, pid int")
        ivs = spark.createDataFrame([(0.0, 100.0, 1)], "lo double, hi double, wid int")
        out = range_join(pts, ivs, "x", "lo", "hi", bin_width_seconds=0.001,
                         max_bins_per_interval=10)
        with pytest.raises(Exception, match="range_join"):
            out.collect()

    def test_no_nested_loop_join(self, points, windows):
        plan = _plan(range_join(points, windows, "ts", "w_start", "w_end",
                                on=["k"], bin_width_seconds=60))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_matches_duckdb_nonequi(self, spark, points, windows):
        duckdb = pytest.importorskip("duckdb")
        con = duckdb.connect()
        con.register("p", points.toPandas())
        con.register("w", windows.toPandas())
        want = sorted(con.sql(
            "SELECT pid, wid FROM p JOIN w ON p.k = w.k "
            "AND w.w_start <= p.ts AND p.ts <= w.w_end").fetchall())
        got = sorted((r["pid"], r["wid"]) for r in range_join(
            points, windows, "ts", "w_start", "w_end", on=["k"]).collect())
        assert got == want


class TestSessionize:
    @pytest.fixture(scope="class")
    def clicks(self, spark):
        rows = [("u", _ts(0)), ("u", _ts(10)), ("u", _ts(41)),
                ("u", _ts(41)), ("u", _ts(80)), ("w", _ts(0)),
                ("w", None)]
        return spark.createDataFrame(rows, "user string, ts timestamp")

    def test_session_assignment(self, clicks):
        out = sessionize(clicks, ["user"], "ts", gap_seconds=30 * 60)
        got = sorted((r["user"], r["ts"], r["session_id"])
                     for r in out.collect())
        # strict >30min gaps split; 31min gap splits, 39min gap splits,
        # equal timestamps share; NULL ts dropped
        assert got == [("u", _ts(0), 1), ("u", _ts(10), 1),
                       ("u", _ts(41), 2), ("u", _ts(41), 2),
                       ("u", _ts(80), 3), ("w", _ts(0), 1)]

    def test_exact_gap_does_not_split(self, spark):
        df = spark.createDataFrame([("u", _ts(0)), ("u", _ts(30))],
                                   "user string, ts timestamp")
        out = sessionize(df, ["user"], "ts", gap_seconds=30 * 60)
        assert {r["session_id"] for r in out.collect()} == {1}

    def test_session_stats(self, clicks):
        out = session_stats(clicks, ["user"], "ts", gap_seconds=30 * 60)
        rows = {(r["user"], r["session_id"]):
                (r["n_events"], r["session_start"], r["session_end"],
                 r["duration_seconds"]) for r in out.collect()}
        assert rows[("u", 1)] == (2, _ts(0), _ts(10), 600.0)
        assert rows[("u", 2)] == (2, _ts(41), _ts(41), 0.0)
        assert rows[("u", 3)] == (1, _ts(80), _ts(80), 0.0)
        assert rows[("w", 1)] == (1, _ts(0), _ts(0), 0.0)

    def test_single_partitioned_exchange(self, clicks):
        plan = _plan(sessionize(clicks, ["user"], "ts", 1800))
        assert plan.count("Exchange") == 1
        assert "hashpartitioning(user" in plan

    def test_numeric_time_domain(self, spark):
        df = spark.createDataFrame([("u", 0.0), ("u", 5.0), ("u", 100.0)],
                                   "user string, t double")
        out = sessionize(df, ["user"], "t", gap_seconds=10)
        got = {r["t"]: r["session_id"] for r in out.collect()}
        assert got == {0.0: 1, 5.0: 1, 100.0: 2}


class TestHeavyHitters:
    def test_exact_counts_above_threshold(self, spark):
        rows = [("hot",)] * 500 + [("warm",)] * 120 + \
            [(f"cold{i}",) for i in range(400)]
        df = spark.createDataFrame(rows, "v string").repartition(8)
        out = heavy_hitters(df, "v", k=50, threshold=100)
        got = {r["value"]: r["count"] for r in out.collect()}
        assert got == {"hot": 500, "warm": 120}

    def test_unrecoverable_threshold_raises_with_min_k(self, spark):
        df = spark.createDataFrame([(str(i % 7),) for i in range(700)],
                                   "v string")
        with pytest.raises(ValueError, match="use k >="):
            heavy_hitters(df, "v", k=2, threshold=3)

    def test_default_threshold_is_n_over_k(self, spark):
        # n=300, k=10 -> threshold 30: only values with >=30 occurrences
        rows = [("a",)] * 40 + [("b",)] * 30 + [("c",)] * 29 + \
            [(f"x{i}",) for i in range(201)]
        df = spark.createDataFrame(rows, "v string").repartition(4)
        got = {r["value"]: r["count"]
               for r in heavy_hitters(df, "v", k=10).collect()}
        assert got == {"a": 40, "b": 30}

    def test_nulls_ignored_and_int_column_stringified(self, spark):
        rows = [(7,)] * 50 + [(None,)] * 50 + [(i, ) for i in range(50)]
        df = spark.createDataFrame(rows, "v int").repartition(4)
        got = {r["value"]: r["count"]
               for r in heavy_hitters(df, "v", k=20, threshold=40).collect()}
        assert got == {"7": 51}  # 50 planted + value 7 from the range

    def test_mg_summary_bounded_per_partition(self, spark):
        # 10k distinct values, k=16: the mapInPandas output stays <= k+1
        # rows per partition (the O(k)-state claim, not just correctness)
        df = spark.createDataFrame([(f"v{i}",) for i in range(10_000)],
                                   "v string").repartition(4)
        from deepchecks_spark.pipeline.relational import _mg_map_factory
        summary = df.mapInPandas(_mg_map_factory("v", 16),
                                 schema="value string, weight long, total long")
        per_part = summary.groupBy(F.spark_partition_id().alias("p")) \
            .count().collect()
        assert all(r["count"] <= 17 for r in per_part)


class TestSkewProfile:
    def test_topk_share_ratio_salt(self, spark):
        rows = [("hot",)] * 60 + [("mid",)] * 30 + [("a",)] * 5 + [("b",)] * 5
        df = spark.createDataFrame(rows, "k string")
        out = skew_profile(df, ["k"], top_k=3, target_rows_per_task=25)
        got = [tuple(r) for r in out.collect()]
        # mean group size = 100/4 = 25
        assert got[0] == ("hot", 60, 0.6, 60 / 25.0, 3)
        assert got[1] == ("mid", 30, 0.3, 30 / 25.0, 2)
        assert got[2][0] in ("a", "b") and got[2][4] == 1
        assert got[2] == ("a", 5, 0.05, 0.2, 1)  # tie -> key ascending

    def test_null_keys_counted(self, spark):
        df = spark.createDataFrame([(None,)] * 9 + [("x",)], "k string")
        out = skew_profile(df, ["k"], top_k=1)
        top = out.collect()[0]
        assert top["k"] is None and top["count"] == 9

    def test_single_scan_take_ordered(self, spark):
        df = spark.range(100).select((F.col("id") % 5).alias("k"))
        plan = _plan(skew_profile(df, ["k"], top_k=2))
        assert "TakeOrderedAndProject" in plan
        assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 2


def test_fuzzy_key_matches_equals_brute_force_at_distance_one(spark):
    from pyspark.sql import functions as F

    from deepchecks_spark.pipeline.relational import fuzzy_key_matches

    a = spark.createDataFrame(
        [("example.com/page1",), ("example.com/page2",), ("other.net/x",),
         ("abc",), (None,)], "url string")
    b = spark.createDataFrame(
        [("example.com/page1",),     # exact
         ("example.com/pge1",),      # deletion
         ("example.com/pagge2",),    # insertion
         ("example.com/pagE2",),     # substitution
         ("totally-different",), ("ab",), ("abcd",)], "url string")
    got = sorted(map(tuple, fuzzy_key_matches(a, b, "url").collect()))
    # brute-force ground truth (recall is provably complete at d=1)
    want = sorted(map(tuple, (
        a.filter(F.col("url").isNotNull()).alias("l")
        .crossJoin(b.alias("r"))
        .select(F.col("l.url").alias("key_a"), F.col("r.url").alias("key_b"),
                F.levenshtein("l.url", "r.url").alias("dist"))
        .filter(F.col("dist") <= 1).collect())))
    assert got == want
    pairs = {(r[0], r[1]): r[2] for r in got}
    assert pairs[("example.com/page1", "example.com/page1")] == 0
    assert pairs[("example.com/page1", "example.com/pge1")] == 1
    assert pairs[("example.com/page2", "example.com/pagge2")] == 1
    assert pairs[("example.com/page2", "example.com/pagE2")] == 1
    assert pairs[("abc", "ab")] == 1 and pairs[("abc", "abcd")] == 1
    assert not any(k[1] == "totally-different" for k in pairs)


def test_fuzzy_key_matches_rejects_wider_distance(spark):
    from deepchecks_spark.pipeline.relational import fuzzy_key_matches

    df = spark.createDataFrame([("a",)], "url string")
    with pytest.raises(ValueError, match="max_dist=1"):
        fuzzy_key_matches(df, df, "url", max_dist=2)


def test_fuzzy_key_matches_plan_has_no_cartesian(spark):
    from deepchecks_spark.pipeline.relational import fuzzy_key_matches

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .selectExpr("source AS url")
    plan = (fuzzy_key_matches(df, df, "url")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_fuzzy_key_matches_recall_property(spark):
    """Property: for random strings and a random single edit
    (insert/delete/substitute), the blocked join ALWAYS surfaces the
    pair — the symmetric-delete completeness claim, exercised across
    alphabets and lengths in one Spark job (one randomized corpus,
    seeded)."""
    import random

    rng = random.Random(20260820)
    alphabet = "abcxyz01._/"
    originals, edited = [], []
    for i in range(300):
        n = rng.randint(1, 24)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        op = rng.choice(["ins", "del", "sub", "eq"])
        pos = rng.randint(0, max(0, n - 1))
        if op == "ins":
            t = s[:pos] + rng.choice(alphabet) + s[pos:]
        elif op == "del" and n > 1:
            t = s[:pos] + s[pos + 1:]
        elif op == "sub":
            c = rng.choice(alphabet.replace(s[pos], "") or "q")
            t = s[:pos] + c + s[pos + 1:]
        else:
            t = s
        originals.append((f"L{i}:{s}",))
        edited.append((f"L{i}:{t}",))  # shared prefix keeps pairs aligned
    from deepchecks_spark.pipeline.relational import fuzzy_key_matches

    left = spark.createDataFrame(originals, "url string")
    right = spark.createDataFrame(edited, "url string")
    got = {(r["key_a"], r["key_b"])
           for r in fuzzy_key_matches(left, right, "url").collect()}
    for (a,), (b,) in zip(originals, edited):
        assert (a, b) in got, (a, b)
