"""DSIR importance resampling: weights prefer target-like documents,
the math matches a local reimplementation exactly, selection is
deterministic, and the plan keeps its bounded-shuffle shape."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from deepchecks_spark.pipeline.dsir import (
    dsir_importance_weights,
    dsir_resample,
    gumbel_key_expr,
)

N_BUCKETS = 97  # small + prime so the test exercises real collisions


def _grams(text, include_bigrams=True):
    toks = text.strip().split() if text.strip() else []
    out = list(toks)
    if include_bigrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _bucket(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:7], 16) % N_BUCKETS


def _local_weights(raw_rows, target_rows):
    """Reference reimplementation of the hashed-ngram importance model."""
    def counts(rows):
        c = {}
        for _, text in rows:
            for g in _grams(text):
                c[_bucket(g)] = c.get(_bucket(g), 0) + 1
        return c

    cr, ct = counts(raw_rows), counts(target_rows)
    nr, nt = sum(cr.values()), sum(ct.values())
    out = {}
    for doc_id, text in raw_rows:
        gs = _grams(text)
        if not gs:
            out[doc_id] = (0, None)
            continue
        w = sum(
            math.log((ct.get(_bucket(g), 0) + 1) / (nt + N_BUCKETS))
            - math.log((cr[_bucket(g)] + 1) / (nr + N_BUCKETS))
            for g in gs
        )
        out[doc_id] = (len(gs), w)
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    raw_rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "buy cheap pills online casino bonus click here now"),
        (2, "the history of the roman empire spans many centuries"),
        (3, "click here casino casino bonus free spins now"),
        (4, "ancient rome built roads across the empire"),
        (5, "   "),
    ]
    target_rows = [
        (100, "the roman empire and its history of conquest"),
        (101, "rome built an empire of roads and law"),
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    return raw, target, raw_rows, target_rows


def test_weights_match_local_model_exactly(spark, corpora):
    raw, target, raw_rows, target_rows = corpora
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_importance_weights(
            raw, target, "doc_id", "text", n_buckets=N_BUCKETS
        ).collect()
    }
    want = _local_weights(raw_rows, target_rows)
    assert set(got) == set(want)
    for doc_id, (n, w) in want.items():
        assert got[doc_id][0] == n
        if w is None:
            assert got[doc_id][1] is None
        else:
            assert got[doc_id][1] == pytest.approx(w, abs=1e-9)


def test_weights_prefer_target_like_docs(spark, corpora):
    raw, target, _, _ = corpora
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(
            raw, target, "doc_id", "text", n_buckets=N_BUCKETS
        ).collect()
    }
    # per-gram mean removes the length confound: history/empire docs
    # must out-rank the spam docs under a rome-flavored target
    n = {
        r["doc_id"]: r["n_grams"]
        for r in dsir_importance_weights(
            raw, target, "doc_id", "text", n_buckets=N_BUCKETS
        ).collect()
    }
    per_gram = {d: w[d] / n[d] for d in w if w[d] is not None}
    assert min(per_gram[2], per_gram[4]) > max(per_gram[1], per_gram[3])


def test_resample_deterministic_and_excludes_blank(spark, corpora):
    raw, target, _, _ = corpora
    sel1 = dsir_resample(raw, target, "doc_id", "text", k=3,
                         n_buckets=N_BUCKETS, seed=11).collect()
    sel2 = dsir_resample(raw, target, "doc_id", "text", k=3,
                         n_buckets=N_BUCKETS, seed=11).collect()
    assert [r["doc_id"] for r in sel1] == [r["doc_id"] for r in sel2]
    assert len(sel1) == 3
    assert all(r["doc_id"] != 5 for r in sel1)  # blank doc holds no ticket
    # keys are strictly ordered and equal log_weight + gumbel(id, seed)
    for r in sel1:
        g = r["sample_key"] - r["log_weight"]
        u = (int(hashlib.md5(f"{r['doc_id']}:11".encode()).hexdigest()[:7], 16)
             + 0.5) / 268_435_456
        assert g == pytest.approx(-math.log(-math.log(u)), abs=1e-9)


def test_different_seed_can_change_selection_but_not_weights(spark, corpora):
    raw, target, _, _ = corpora
    a = dsir_importance_weights(raw, target, "doc_id", "text",
                                n_buckets=N_BUCKETS).collect()
    b = dsir_importance_weights(raw, target, "doc_id", "text",
                                n_buckets=N_BUCKETS).collect()
    assert sorted((r["doc_id"], r["log_weight"]) for r in a) == \
        sorted((r["doc_id"], r["log_weight"]) for r in b)


def test_unigram_only_mode(spark, corpora):
    raw, target, raw_rows, _ = corpora
    got = {
        r["doc_id"]: r["n_grams"]
        for r in dsir_importance_weights(
            raw, target, "doc_id", "text",
            n_buckets=N_BUCKETS, include_bigrams=False
        ).collect()
    }
    for doc_id, text in raw_rows:
        assert got[doc_id] == len(text.split())


def test_plan_shape(spark, corpora):
    """Top-k plans as TakeOrderedAndProject (never a global Sort+Limit)
    and the weight-table join is a broadcast, not a shuffle join."""
    raw, target, _, _ = corpora
    plan = dsir_resample(raw, target, "doc_id", "text", k=2,
                         n_buckets=N_BUCKETS)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
