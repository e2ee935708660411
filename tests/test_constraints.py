"""Declarative schema/constraint validation: verdict semantics per
constraint kind, NULL conventions, gates, and the single-fused-scan
plan shape."""

import pytest
from pyspark.sql import functions as F

from deepchecks_spark.checks.constraints import (
    fused_constraint_agg,
    has_column,
    has_dtype,
    in_range,
    in_set,
    matches_regex,
    min_rows,
    not_null,
    unique,
    validate_constraints,
)


@pytest.fixture(scope="module")
def contract_df(spark):
    return spark.createDataFrame(
        [(1, "a@x.com", 5, "en"),
         (2, None, 15, "en"),
         (3, "bad", 7, "xx"),
         (3, "c@y.org", None, "fr")],
        "id long, email string, score int, lang string")


def test_constraint_verdicts_hand_computed(spark, contract_df):
    cons = [
        not_null("email"),                      # 1 NULL
        unique("id"),                           # id 3 twice
        in_range("score", 0, 10),               # 15 out; NULL ignored
        in_set("lang", ["en", "fr", "de"]),     # 'xx' out
        matches_regex("email", r"[^@]+@[^@]+\.[a-z]+"),  # 'bad'; NULL ignored
        has_column("id"),
        has_column("nope"),                     # absent -> violation, no raise
        has_dtype("id", "bigint"),
        has_dtype("score", "string"),           # int -> violation
        has_dtype("nope", "string"),            # absent column -> violation
        min_rows(3),
        min_rows(10),
    ]
    rows = validate_constraints(contract_df, cons).collect()
    got = {(r["constraint"], r["column"]): (r["n_violations"], r["passed"])
           for r in rows}
    assert len(rows) == len(cons)  # input order preserved, one row each
    assert got[("not_null", "email")] == (1, False)
    assert got[("unique", "id")] == (1, False)
    assert got[("in_range[0, 10]", "score")] == (1, False)
    assert got[("in_set[3 values]", "lang")] == (1, False)
    assert got[("has_column", "nope")] == (1, False)
    assert got[("has_dtype[bigint]", "id")] == (0, True)
    assert got[("has_dtype[string]", "score")] == (1, False)
    assert got[("has_dtype[string]", "nope")] == (1, False)
    assert got[("min_rows[3]", None)] == (0, True)
    assert got[("min_rows[10]", None)] == (1, False)
    fracs = {(r["constraint"], r["column"]): r["violation_frac"] for r in rows}
    assert fracs[("not_null", "email")] == 0.25
    assert fracs[("min_rows[10]", None)] == 1.0


def test_constraint_null_conventions(spark):
    """NULLs violate not_null but are ignored by value constraints and
    by unique (the SQL UNIQUE/CHECK convention)."""
    df = spark.createDataFrame(
        [(None, None), (None, 1), (1, 2)], "a int, b int")
    rows = {r["constraint"]: r for r in validate_constraints(
        df, [not_null("a"), in_range("a", 0, 0), unique("a")]).collect()}
    assert rows["not_null"]["n_violations"] == 2
    assert rows["in_range[0, 0]"]["n_violations"] == 1  # only the 1
    assert rows["unique"]["n_violations"] == 0          # two NULLs don't collide


def test_constraint_gates(spark, contract_df):
    with pytest.raises(ValueError, match="absent"):
        validate_constraints(contract_df, [not_null("nope")])
    with pytest.raises(ValueError, match="no constraints"):
        validate_constraints(contract_df, [])
    with pytest.raises(ValueError, match="plan-size"):
        in_set("lang", [str(i) for i in range(1001)])


def test_constraint_fused_plan_single_scan_no_expand(spark):
    """All row-local constraints fuse into ONE scan with NO Expand (the
    count_distinct trap); uniqueness runs separately."""
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cons = [not_null("o_custkey"), in_range("o_totalprice", 0.0, 1e6),
            in_set("o_orderstatus", ["O", "F", "P"]),
            matches_regex("o_orderpriority", r"[1-5]-[A-Z ]+")]
    plan = fused_constraint_agg(df, cons)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Expand" not in plan
    assert plan.count("Scan parquet") == 1
    assert "partial_count" in plan or "partial_sum" in plan
    # scan prunes to exactly the constrained columns
    scan = plan[plan.find("ReadSchema"):][:300]
    assert "o_custkey" in scan and "o_orderdate" not in scan
