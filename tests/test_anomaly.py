"""Metric-history anomaly detection (checks/anomaly.py): hand-computed
rule semantics, trailing-window clamp, and the runner's cross-run
history stage (append → score → anomaly_verdicts)."""

import os

import pytest

from deepchecks_spark.checks.anomaly import metric_anomalies
from deepchecks_spark.runner import run_job


@pytest.fixture(scope="module")
def corpus_parquet(tmp_path_factory, spark):
    from deepchecks_spark.corpus import generate_corpus_spark

    path = str(tmp_path_factory.mktemp("anomaly") / "webpages")
    generate_corpus_spark(spark, 400, seed=42, partitions=4) \
        .write.mode("overwrite").parquet(path)
    return path

HIST_DDL = "metric string, run_ts bigint, value double"


def _hist(spark, rows):
    return spark.createDataFrame(rows, HIST_DDL)


def _by_metric(df):
    return {r.metric: r for r in df.collect()}


def test_rule_semantics_hand_computed(spark):
    rows = (
        [("m_stable", t, 10.0) for t in range(1, 5)]
        + [("m_jump", 1, 10.0), ("m_jump", 2, 10.0), ("m_jump", 3, 10.0),
           ("m_jump", 4, 20.0)]
        + [("m_drift", 1, 10.0), ("m_drift", 2, 12.0), ("m_drift", 3, 11.0),
           ("m_drift", 4, 30.0)]
        + [("m_new", 9, 5.0)]
    )
    out = _by_metric(metric_anomalies(
        _hist(spark, rows), max_relative_change=0.5, z_threshold=3.0))

    st = out["m_stable"]
    assert (st.status, st.latest_value, st.prev_value, st.rel_change) == (
        "PASS", 10.0, 10.0, 0.0)
    assert st.z_score is None  # zero std ⇒ rule not evaluable
    assert st.n_hist == 3 and st.mean_hist == 10.0 and st.std_hist == 0.0

    j = out["m_jump"]
    assert j.status == "FAIL" and j.failed_rules == "max_relative_change"
    assert j.rel_change == 1.0 and j.z_score is None  # std(10,10,10)=0

    d = out["m_drift"]
    # hist = (10, 12, 11): mean 11, sample std 1; z = (30-11)/1 = 19
    assert d.mean_hist == 11.0 and d.std_hist == 1.0 and d.z_score == 19.0
    assert d.rel_change == round((30.0 - 11.0) / 11.0, 6)
    assert d.failed_rules == "max_relative_change,z_threshold"

    n = out["m_new"]
    assert n.status == "PASS" and n.prev_value is None and n.n_hist == 0
    assert n.latest_ts == 9


def test_absolute_bounds(spark):
    rows = [("m", 1, 5.0), ("m", 2, 0.5), ("lo", 1, -1.0)]
    out = _by_metric(metric_anomalies(
        _hist(spark, rows), min_value=0.0, max_value=1.0))
    assert out["m"].status == "PASS"  # latest 0.5 inside [0, 1]
    assert out["lo"].failed_rules == "min_value"
    out2 = _by_metric(metric_anomalies(_hist(spark, rows), max_value=0.4))
    assert out2["m"].failed_rules == "max_value"


def test_trailing_window_clamp(spark):
    # 10 runs, max_runs=3 ⇒ history is exactly the 2 runs before latest
    rows = [("m", t, float(t)) for t in range(1, 11)]
    r = metric_anomalies(_hist(spark, rows), max_runs=3).collect()[0]
    assert (r.latest_value, r.prev_value, r.n_hist) == (10.0, 9.0, 2)
    assert r.mean_hist == 8.5  # mean(8, 9)


def test_min_history_gates_z(spark):
    rows = [("m", 1, 10.0), ("m", 2, 20.0), ("m", 3, 100.0)]
    r = metric_anomalies(_hist(spark, rows), z_threshold=1.0,
                         min_history=3).collect()[0]
    assert r.z_score is None and r.status == "PASS"  # only 2 prior runs
    r2 = metric_anomalies(_hist(spark, rows), z_threshold=1.0,
                          min_history=2).collect()[0]
    assert r2.z_score is not None and r2.status == "FAIL"


def test_single_shuffle_plan(spark):
    df = metric_anomalies(_hist(spark, [("m", 1, 1.0)]), z_threshold=3.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one groupBy(metric), nothing else


def test_runner_anomaly_stage_cross_run(spark, tmp_path, corpus_parquet):
    hist = str(tmp_path / "history")
    out1 = str(tmp_path / "out1")
    run_job(spark, corpus_parquet, out1, cat_features=["lang"],
            metrics_history=hist)
    v1 = {r.metric: r for r in
          spark.read.parquet(os.path.join(out1, "anomaly_verdicts")).collect()}
    assert v1["rows"].status == "PASS" and v1["rows"].n_hist == 0

    # second run over a 25%-sized snapshot of the same corpus: the rows
    # metric drops by 75% ⇒ max_relative_change(0.5) fires
    small = str(tmp_path / "small")
    spark.read.parquet(corpus_parquet).limit(100).write.parquet(small)
    out2 = str(tmp_path / "out2")
    run_job(spark, small, out2, cat_features=["lang"], metrics_history=hist)
    v2 = {r.metric: r for r in
          spark.read.parquet(os.path.join(out2, "anomaly_verdicts")).collect()}
    r = v2["rows"]
    assert (r.latest_value, r.prev_value) == (100.0, 400.0)
    assert r.status == "FAIL" and "max_relative_change" in r.failed_rules
    assert r.latest_ts == 2 and r.n_hist == 1
    # history accumulated both runs
    hist_df = spark.read.parquet(hist)
    assert hist_df.select("run_ts").distinct().count() == 2
    # resume: re-running run 2 skips the manifest-gated stage — no append
    run_job(spark, small, out2, cat_features=["lang"], metrics_history=hist)
    assert spark.read.parquet(hist).count() == hist_df.count()


def test_runner_anomaly_crash_resume_no_double_append(spark, tmp_path,
                                                      corpus_parquet):
    """A crash AFTER the history append but BEFORE the verdict write
    must not double-append on resume: the run's run_ts is pinned in the
    manifest and the append is skipped when rows at that ts already
    exist."""
    import json

    hist = str(tmp_path / "history_crash")
    out = str(tmp_path / "out_crash")
    run_job(spark, corpus_parquet, out, cat_features=["lang"],
            metrics_history=hist)
    before = spark.read.parquet(hist).count()

    # simulate the crash: history rows for run_ts=1 exist (append done),
    # but the manifest says the anomaly stage never completed
    mpath = os.path.join(out, "_manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    assert manifest["anomaly_run_ts"] == 1
    del manifest["stages"]["anomaly"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    run_job(spark, corpus_parquet, out, cat_features=["lang"],
            metrics_history=hist)
    hist_df = spark.read.parquet(hist)
    assert hist_df.count() == before  # no duplicate rows
    assert hist_df.select("run_ts").distinct().count() == 1


def test_runner_anomaly_unreadable_history_raises(spark, tmp_path,
                                                  corpus_parquet):
    """Only a MISSING history path means 'first run'; a corrupt/
    unreadable history must raise instead of silently restarting the
    run index at 1 (which would pollute the history on append)."""
    import pytest

    hist = str(tmp_path / "history_corrupt")
    os.makedirs(hist)
    with open(os.path.join(hist, "part-00000.parquet"), "w") as f:
        f.write("not parquet at all")
    out = str(tmp_path / "out_corrupt")
    with pytest.raises(Exception):
        run_job(spark, corpus_parquet, out, cat_features=["lang"],
                metrics_history=hist)
