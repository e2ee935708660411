"""Pipeline operators: near-dup detection finds planted near-duplicates,
similarity search returns correct neighbors, multimodal plumbing keeps
schema/alignment invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepchecks_spark.pipeline.dedup import (
    jaccard_adjacent,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    minhash_signatures,
    simhash,
    simhash_near_duplicates,
)
from deepchecks_spark.pipeline.multimodal import (
    decode_features,
    frame_sample_stub,
    resize_stub,
    with_media_metadata,
)
from deepchecks_spark.pipeline.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def neardup_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far away "
            "into the deep dark forest to find some food for the long cold winter")
    variant = base.replace("lazy", "sleepy")          # near-dup of 0
    distinct1 = "completely different content about spark dataframes and shuffles here"
    distinct2 = "yet another unrelated document mentioning neither foxes nor dogs at all"
    rows = [(0, base), (1, variant), (2, base), (3, distinct1), (4, distinct2)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_signatures_shape(spark, neardup_docs):
    sig = minhash_signatures(neardup_docs, "doc_id", "text", num_hashes=32).collect()
    assert len(sig) == 5
    assert all(len(r["signature"]) == 32 for r in sig)
    by_id = {r["doc_id"]: r["signature"] for r in sig}
    assert by_id[0] == by_id[2]  # identical docs → identical signature


def test_minhash_finds_near_duplicates(spark, neardup_docs):
    pairs = minhash_near_duplicates(neardup_docs, "doc_id", "text",
                                    threshold=0.5, num_hashes=32, bands=16).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 2) in found          # exact duplicate pair
    assert (0, 1) in found or (1, 2) in found  # near-dup (one word changed)
    assert all({a, b} <= {0, 1, 2} for a, b in found)  # distinct docs never pair


def test_minhash_candidates_exclude_unrelated(spark, neardup_docs):
    cands = minhash_lsh_candidates(neardup_docs, "doc_id", "text",
                                   num_hashes=32, bands=8).collect()
    ids = {r["id_a"] for r in cands} | {r["id_b"] for r in cands}
    assert 3 not in ids and 4 not in ids


def test_simhash_near_duplicates(spark, neardup_docs):
    fps = {r["doc_id"]: r["simhash"] for r in simhash(neardup_docs, "doc_id", "text").collect()}
    assert fps[0] == fps[2]
    pairs = simhash_near_duplicates(neardup_docs, "doc_id", "text", max_hamming=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 2) in found
    assert not any({a, b} & {3, 4} and {a, b} & {0, 1, 2} for a, b in found)


def test_jaccard_adjacent_values(spark):
    rows = [(0, "a b c d"), (1, "a b c e"), (2, "x y z w")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in
           jaccard_adjacent(df, "doc_id", "text").collect()}
    assert out[(0, 1)] == pytest.approx(3 / 5)
    assert out[(1, 2)] == pytest.approx(0.0)


def test_brute_force_topk_correctness(spark):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = brute_force_topk(df.filter(F.col("id") == 0), df, k=5).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    # numpy oracle
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    order = [i for i in np.argsort(-sims) if i != 0][:5]
    assert [g[0] for g in got] == order


def test_lsh_topk_recall(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((200, 8))
    vecs[5] = vecs[0] * 0.9 + rng.standard_normal(8) * 0.01  # near neighbor of 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = lsh_topk(df.filter(F.col("id") == 0), df, dim=8, k=5, n_planes=4).collect()
    assert any(r["neighbor_id"] == 5 for r in out)  # same bucket w.h.p.


# -- multimodal plumbing ------------------------------------------------------

@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(1, b"\x89PNG fake image bytes one"), (2, b"RIFF fake audio bytes"), (3, None)]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_media_metadata(spark, media_df):
    out = {r["id"]: r["media_meta"] for r in with_media_metadata(media_df, "payload").collect()}
    assert out[1]["n_bytes"] == 25
    assert out[1]["magic"] == "8950"[:2] + "4E47"[:2] or len(out[1]["magic"]) == 8
    assert out[3]["n_bytes"] is None


def test_decode_features_fake_deterministic(spark, media_df):
    a = {r["id"]: r["features"] for r in decode_features(media_df, "payload").collect()}
    b = {r["id"]: r["features"] for r in decode_features(media_df, "payload").collect()}
    assert a == b  # deterministic across runs
    assert len(a[1]) == 8 and all(0 <= x <= 1 for x in a[1])
    assert a[3] is None  # null propagates
    assert a[1] != a[2]  # content-derived


def test_decode_features_real_raises(spark, media_df):
    with pytest.raises(Exception) as err:
        decode_features(media_df, "payload", decoder="real").collect()
    assert "NotImplementedError" in str(err.value) or "not available" in str(err.value)


def test_resize_and_frames_plumbing(spark, media_df):
    resized = {r["id"]: r["resized"] for r in resize_stub(media_df, "payload", 4, 4).collect()}
    assert len(resized[1]) == 16 and resized[3] is None
    frames = {r["id"]: r["frames"] for r in frame_sample_stub(media_df, "payload", every_n=5).collect()}
    assert frames[3] is None
    assert all(len(f) <= 5 for f in frames[1])


def test_lsh_topk_or_amplification_improves_candidates(spark):
    from pyspark.sql import functions as F
    from deepchecks_spark.pipeline.similarity import brute_force_topk, lsh_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = df.selectExpr(
        "vec_id",
        "transform(sequence(0, 15), d -> CAST((CASE WHEN d = CAST(vec_id % 10 AS INT) "
        "THEN 40 ELSE 2 END) + ((vec_id * 7 + d * 13) % 5) - 2 AS DOUBLE)) AS embedding",
    )
    queries = df.filter(F.col("vec_id") < 10)
    truth = set(map(tuple, brute_force_topk(queries, df, k=3, id_col="vec_id")
                    .select("query_id", "neighbor_id").collect()))
    got1 = set(map(tuple, lsh_topk(queries, df, dim=16, k=3, n_tables=1, id_col="vec_id")
                   .select("query_id", "neighbor_id").collect()))
    got8 = set(map(tuple, lsh_topk(queries, df, dim=16, k=3, n_tables=8, id_col="vec_id")
                   .select("query_id", "neighbor_id").collect()))
    assert len(got8 & truth) >= len(got1 & truth)
    assert got8 == truth  # full recall on clustered data with 8 tables


def test_ivf_topk_full_probe_matches_brute_force(spark):
    """With nprobe = nlist the IVF index scores every cell, so the
    result must equal the exact brute-force top-k including rank."""
    from deepchecks_spark.pipeline.similarity import ivf_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((120, 8))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    queries = df.filter(F.col("id") < 5)
    exact = set(map(tuple, brute_force_topk(queries, df, k=4)
                    .select("query_id", "neighbor_id", "rank").collect()))
    got = set(map(tuple, ivf_topk(queries, df, dim=8, k=4, nlist=6, nprobe=6,
                                  sample_size=120)
                  .select("query_id", "neighbor_id", "rank").collect()))
    assert got == exact


def test_ivf_topk_recall_on_clustered_data(spark):
    """On well-clustered vectors a small nprobe recovers the exact
    neighbors: each query's true neighbors share its dominant axis, so
    they land in the same k-means cell."""
    from deepchecks_spark.pipeline.similarity import ivf_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = df.selectExpr(
        "vec_id",
        "transform(sequence(0, 15), d -> CAST((CASE WHEN d = CAST(vec_id % 10 AS INT) "
        "THEN 40 ELSE 2 END) + ((vec_id * 7 + d * 13) % 5) - 2 AS DOUBLE)) AS embedding",
    )
    queries = df.filter(F.col("vec_id") < 10)
    truth = set(map(tuple, brute_force_topk(queries, df, k=3, id_col="vec_id")
                    .select("query_id", "neighbor_id").collect()))
    got = set(map(tuple, ivf_topk(queries, df, dim=16, k=3, nlist=10, nprobe=2,
                                  id_col="vec_id", sample_size=1000)
                  .select("query_id", "neighbor_id").collect()))
    assert got == truth  # full recall on clustered data


def test_ivf_assign_arrow_path_matches_expression(spark):
    """The pandas-UDF assignment (large-nlist path) and the codegen'd
    argmax expression must agree cell-for-cell, including ties."""
    from deepchecks_spark.pipeline import similarity as sim

    rng = np.random.default_rng(3)
    cents = rng.standard_normal((5, 6))
    vecs = rng.standard_normal((80, 6))
    vecs[7] = 0.0  # all-scores-equal tie → lowest cell id on both paths
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    rows.append((99, None))  # null vector → null cell on BOTH paths
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    expr = {r["id"]: r["c"] for r in df.select(
        "id", sim.ivf_assign_col("embedding", cents).alias("c")).collect()}
    old = sim._IVF_EXPR_MAX_LITERALS
    sim._IVF_EXPR_MAX_LITERALS = 0  # force the Arrow path
    try:
        arrow = {r["id"]: r["c"] for r in df.select(
            "id", sim.ivf_assign_col("embedding", cents).alias("c")).collect()}
    finally:
        sim._IVF_EXPR_MAX_LITERALS = old
    assert expr == arrow
    assert expr[7] == 0
    assert expr[99] is None


def test_ivf_near_duplicates_recovers_planted_pairs(spark):
    """Planted near-identical pairs must all survive the cell join:
    near-duplicates share their probe cells (nearly identical centroid
    scores), so both-side nprobe probing recovers every pair."""
    from deepchecks_spark.pipeline.similarity import ivf_near_duplicates

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 8))
    for i in range(10):  # vec[100+i] is a near-duplicate of vec[i]
        vecs[100 + i] = vecs[i] + rng.standard_normal(8) * 0.01
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = ivf_near_duplicates(df, dim=8, threshold=0.99, nlist=8, nprobe=3,
                              sample_size=200).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert {(i, 100 + i) for i in range(10)} <= pairs
    assert all(r["cosine"] >= 0.99 for r in got)


def test_train_ivf_centroids_deterministic_and_unit_norm(spark):
    from deepchecks_spark.pipeline.similarity import train_ivf_centroids

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 8))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    a = train_ivf_centroids(df, nlist=4, sample_size=300)
    b = train_ivf_centroids(df, nlist=4, sample_size=300)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
    with pytest.raises(ValueError, match="nlist"):
        train_ivf_centroids(df.limit(3), nlist=4, sample_size=300)


def test_minhash_recall_is_total_on_planted_duplicates(spark):
    from deepchecks_spark.pipeline.dedup import (
        brute_force_jaccard_pairs,
        minhash_near_duplicates,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = set(map(tuple, brute_force_jaccard_pairs(df, "doc_id", "text", 0.7)
                    .select("id_a", "id_b").collect()))
    found = set(map(tuple, minhash_near_duplicates(df, "doc_id", "text", 0.7, verify="shingles")
                    .select("id_a", "id_b").collect()))
    assert truth, "fixture should contain planted near-duplicates"
    assert truth <= found or truth == found
    assert found <= truth  # verification keeps only true pairs → found == truth


def test_parse_media_header_known_formats():
    import struct
    from deepchecks_spark.pipeline.multimodal import parse_media_header

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00")
    assert parse_media_header(png) == (640, 480, "png")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    assert parse_media_header(gif) == (320, 200, "gif")
    # JPEG with an APP0 segment before the SOF0 frame header
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 600, 800) + b"\x03"
    assert parse_media_header(b"\xff\xd8" + app0 + sof0) == (800, 600, "jpeg")
    # progressive JPEG (SOF2) also carries dimensions
    sof2 = b"\xff\xc2" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 10, 20) + b"\x03"
    assert parse_media_header(b"\xff\xd8" + sof2) == (20, 10, "jpeg")


def test_parse_media_header_rejects_garbage():
    from deepchecks_spark.pipeline.multimodal import parse_media_header

    assert parse_media_header(None) is None
    assert parse_media_header(b"") is None
    assert parse_media_header(b"plain text payload") is None
    assert parse_media_header(b"\x89PNG\r\n\x1a\n1234NOPE") is None  # not IHDR
    assert parse_media_header(b"\xff\xd8\xff\xdb\x00\x04\x00\x00") is None  # no SOF
    # DHT (C4) must NOT be treated as a frame header
    assert parse_media_header(b"\xff\xd8\xff\xc4\x00\x04\x00\x00") is None


def test_with_media_dimensions_arrow_path(spark):
    import struct
    from deepchecks_spark.pipeline.multimodal import with_media_dimensions

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 33, 44) + b"\x08\x06\x00\x00\x00")
    rows = [(1, bytearray(png)), (2, bytearray(b"not an image")), (3, None)]
    df = spark.createDataFrame(rows, "id int, payload binary")
    got = {r["id"]: (r["media_width"], r["media_height"], r["media_format"])
           for r in with_media_dimensions(df, "payload").collect()}
    assert got[1] == (33, 44, "png")
    assert got[2] == (None, None, None)
    assert got[3] == (None, None, None)


def test_autotune_lsh_params_model_properties(spark):
    # closed-form model sanity on a tiny synthetic frame
    import math

    from deepchecks_spark.pipeline.similarity import autotune_lsh_params

    rows = [(i, [float(((i * 7 + d * 13) % 9) - 4) for d in range(8)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    params = autotune_lsh_params(df, threshold=0.8, target_recall=0.9,
                                 max_planes=12, max_tables=40)
    b, t = params["n_planes"], params["n_tables"]
    assert 1 <= b <= 12 and 1 <= t <= 40
    # the chosen configuration meets the recall target under the model
    p0 = 1 - math.acos(0.8) / math.pi
    assert 1 - (1 - p0 ** b) ** t >= 0.9
    assert params["expected_recall"] == pytest.approx(1 - (1 - p0 ** b) ** t)
    assert -1.0 <= params["background_similarity"] <= 1.0


def test_autotuned_near_duplicates_hit_target_recall(spark):
    # planted pairs at cosine exactly 1/sqrt(2) (v = u + rot90(u));
    # auto-tuned OR-amplified LSH must recover >= 95% of them
    from deepchecks_spark.pipeline.similarity import (
        autotune_lsh_params,
        embedding_near_duplicates,
    )

    def u(k):
        return [((1103515245 * (k * 31 + d) + 12345) % 33) - 16 for d in range(16)]

    rows = []
    for k in range(200):
        base = u(k)
        rot = [base[d + 1] if d % 2 == 0 else -base[d - 1] for d in range(16)]
        rows.append((2 * k, [float(x) for x in base]))
        rows.append((2 * k + 1, [float(a + b) for a, b in zip(base, rot)]))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    params = autotune_lsh_params(df, threshold=0.65, target_recall=0.95,
                                 max_planes=16, max_tables=32)
    found = embedding_near_duplicates(
        df, dim=16, threshold=0.65, n_planes=params["n_planes"],
        n_tables=params["n_tables"]).select("id_a", "id_b").collect()
    got = {(r["id_a"], r["id_b"]) for r in found}
    planted = {(2 * k, 2 * k + 1) for k in range(200)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.95, recall


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    return {i: min(j for j in range(n_nodes) if find(j) == find(i))
            for i in range(n_nodes)}


def test_connected_components_random_graph_matches_union_find(spark):
    import random

    from deepchecks_spark.pipeline.dedup import connected_components

    rng = random.Random(17)
    n = 120
    edges = sorted({(min(a, b), max(a, b))
                    for a, b in ((rng.randrange(n), rng.randrange(n))
                                 for _ in range(90)) if a != b})
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in connected_components(pairs).collect()}
    want = _union_find_components(n, edges)
    touched = {a for a, _ in edges} | {b for _, b in edges}
    assert got == {i: want[i] for i in touched}


def test_deduplicate_by_pairs_keeps_one_per_cluster(spark):
    from deepchecks_spark.pipeline.dedup import deduplicate_by_pairs

    # chain 0-1-2-3 (one cluster), pair 10-11, singleton 20
    df = spark.createDataFrame([(i, f"d{i}") for i in (0, 1, 2, 3, 10, 11, 20)],
                               "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (10, 11)],
                                  "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in
                  deduplicate_by_pairs(df, pairs, "doc_id").collect())
    assert kept == [0, 10, 20]


def test_connected_components_string_ids(spark):
    # regression (r4 ADVICE): the old Σcomponent convergence probe crashed
    # with CAST_INVALID_INPUT on string ids under ANSI (and could silently
    # under-merge with ANSI off); the changed-label probe is type-agnostic
    from deepchecks_spark.pipeline.dedup import connected_components

    # chain a-b-c-d forces >1 iteration; separate pair x-y; min is lexicographic
    pairs = spark.createDataFrame(
        [("doc_c", "doc_d"), ("doc_b", "doc_c"), ("doc_a", "doc_b"),
         ("url_x", "url_y")],
        "id_a string, id_b string")
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {"doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a",
                   "doc_d": "doc_a", "url_x": "url_x", "url_y": "url_x"}


def test_connected_components_large_hash_ids(spark):
    # 64-bit hash ids near Long.MAX: the old Σ probe could overflow under ANSI
    from deepchecks_spark.pipeline.dedup import connected_components

    big = 2**62
    pairs = spark.createDataFrame(
        [(big + 3, big + 5), (big + 5, big + 7), (big + 11, big + 13)],
        "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {big + 3: big + 3, big + 5: big + 3, big + 7: big + 3,
                   big + 11: big + 11, big + 13: big + 11}


def test_connected_components_null_pairs_both_paths_agree(spark):
    # regression (r5 ADVICE): the fast path dropped half-null pairs
    # entirely while the iterative path keeps the non-null side (and the
    # NULL node) as singletons — the two labelings diverged on
    # degenerate input. Both paths must emit identical rows now.
    from deepchecks_spark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (3, None), (None, 4), (None, None)],
        "id_a bigint, id_b bigint")
    fast = sorted(
        [(r["id"], r["component"]) for r in connected_components(pairs).collect()],
        key=repr)
    iterative = sorted(
        [(r["id"], r["component"])
         for r in connected_components(pairs, small_graph_edges=0).collect()],
        key=repr)
    assert fast == iterative
    assert (3, 3) in fast and (4, 4) in fast and (None, None) in fast
    assert (1, 1) in fast and (2, 1) in fast


def test_repetition_stats_hand_computed(spark):
    """Gopher-style repetition signals against a hand-computed fixture:
    'a b a b a b c' has 7 tokens / 3 distinct (dup_word 4/7), five
    3-grams with two repeats (dup_ngram 2/5), and top gram 'a b a'
    occurring twice (char frac 2*5/13)."""
    from deepchecks_spark.pipeline.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a b c"), (2, "x y z"), (3, ""), (4, "q")],
        "id long, text string")
    rows = {r["id"]: r for r in repetition_stats(df, "text", ngram=3).collect()}
    assert abs(rows[1]["dup_word_frac"] - 4 / 7) < 1e-12
    assert abs(rows[1]["dup_ngram_frac"] - 2 / 5) < 1e-12
    assert rows[1]["top_ngram_count"] == 2
    assert abs(rows[1]["top_ngram_char_frac"] - 10 / 13) < 1e-12
    # no repeats: the single 3-gram of 'x y z' is the whole text, so
    # the top count is 1 and its characters cover everything
    assert rows[2]["dup_ngram_frac"] == 0.0
    assert rows[2]["top_ngram_count"] == 1
    assert rows[2]["top_ngram_char_frac"] == 1.0
    # empty text and sub-gram docs yield zeros, not nulls
    for i in (3, 4):
        assert rows[i]["dup_word_frac"] == 0.0
        assert rows[i]["top_ngram_count"] == 0
        assert rows[i]["top_ngram_char_frac"] == 0.0


def test_duplicate_chunk_stats_cross_corpus(spark):
    """A chunk repeated WITHIN one doc is not 'shared'; a chunk present
    in two docs is, counted once per occurrence; sub-chunk docs keep a
    zero row."""
    from deepchecks_spark.pipeline.dedup import duplicate_chunk_stats

    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6"),
         (2, "w1 w2 w3 a b"),
         (3, "z z z w4 w5 w6 z z z"),
         (4, "short")],
        "id long, text string")
    out = {r["id"]: r for r in
           duplicate_chunk_stats(df, "id", "text", chunk_words=3).collect()}
    assert (out[1]["n_chunks"], out[1]["n_shared_chunks"]) == (2, 2)
    assert (out[2]["n_chunks"], out[2]["n_shared_chunks"]) == (1, 1)
    assert (out[3]["n_chunks"], out[3]["n_shared_chunks"]) == (3, 1)
    assert abs(out[3]["shared_chunk_frac"] - 1 / 3) < 1e-12
    assert (out[4]["n_chunks"], out[4]["shared_chunk_frac"]) == (0, 0.0)


def test_gopher_quality_rules_hand_computed(spark):
    """Every Gopher rule verified on a crafted document, plus the
    empty-document degenerate path (zeros, never nulls)."""
    from deepchecks_spark.pipeline.textstats import gopher_quality_rules

    df = spark.createDataFrame(
        [(1, "the elephant and the giraffe have wandered with plenty of that grass"),
         (2, ""),                                              # empty
         (3, "aa bb cc the of"),                               # short words
         (4, "• one two\n• three four\nfive six the of and"),  # bullet lines
         (5, "ends here...\nand here…\nthe of and clean"),     # ellipsis lines
         (6, "a # b # c # the of")],                           # symbols
        "id long, text string")
    out = {r["id"]: r for r in gopher_quality_rules(
        df, "text", min_words=3, max_words=100,
        min_avg_word_len=3.0, max_avg_word_len=10.0,
        max_symbol_word_ratio=0.1, max_bullet_line_frac=0.5,
        max_ellipsis_line_frac=0.5, min_alpha_word_frac=0.7,
        min_stopword_hits=2).collect()}

    assert out[1]["quality_keep"] and out[1]["failed_rules"] == ""
    assert out[1]["n_words"] == 12 and out[1]["stopword_hits"] >= 5

    assert out[2]["n_words"] == 0 and not out[2]["quality_keep"]
    assert "word_count" in out[2]["failed_rules"]
    assert out[2]["avg_word_len"] == 0.0 and out[2]["alpha_word_frac"] == 0.0

    # "aa bb cc the of": 5 words, 11 chars -> avg 2.2 < 3.0
    assert abs(out[3]["avg_word_len"] - 2.2) < 1e-9
    assert "avg_word_length" in out[3]["failed_rules"]

    # 2 of 3 lines start with a bullet -> 2/3 > 0.5
    assert abs(out[4]["bullet_line_frac"] - 2 / 3) < 1e-6
    assert "bullet_lines" in out[4]["failed_rules"]
    # the two "•" tokens carry no alphabetic char
    assert out[4]["alpha_word_frac"] < 1.0

    assert abs(out[5]["ellipsis_line_frac"] - 2 / 3) < 1e-6
    assert "ellipsis_lines" in out[5]["failed_rules"]

    # 3 '#' over 8 words -> 0.375 > 0.1; alpha words 5/8 = 0.625 < 0.7
    assert abs(out[6]["symbol_word_ratio"] - 0.375) < 1e-6
    assert "symbol_ratio" in out[6]["failed_rules"]
    assert abs(out[6]["alpha_word_frac"] - 0.625) < 1e-9
    assert "alpha_words" in out[6]["failed_rules"]


def test_unigram_logprob_exact_and_vocab_cut(spark):
    """Smoothed probabilities verified against hand math; the top-V cut
    sends out-of-vocabulary tokens to the reserve-mass bucket; empty
    docs keep n_tokens = 0 with NULL scores."""
    import math

    from deepchecks_spark.pipeline.textstats import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")], "id long, text string")

    # full vocabulary: N=5 instances, V=3 kept, denom = 9
    out = {r["id"]: r for r in
           unigram_logprob(df, "id", "text", vocab_size=100).collect()}
    nll_a = -math.log(3 / 9)   # c=2
    nll_b = -math.log(3 / 9)   # c=2
    nll_c = -math.log(2 / 9)   # c=1
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["avg_nll"] - (2 * nll_a + nll_b) / 3) < 1e-12
    assert abs(out[2]["avg_nll"] - (nll_b + nll_c) / 2) < 1e-12
    assert abs(out[2]["pseudo_perplexity"]
               - math.exp(out[2]["avg_nll"])) < 1e-12
    assert out[3]["n_tokens"] == 0
    assert out[3]["avg_nll"] is None and out[3]["pseudo_perplexity"] is None

    # vocab_size=1 keeps only 'a' (count ties break to the smaller
    # token); b and c score as OOV: denom = N + v_kept + 1 = 7
    out1 = {r["id"]: r for r in
            unigram_logprob(df, "id", "text", vocab_size=1).collect()}
    oov = -math.log(1 / 7)
    assert abs(out1[2]["avg_nll"] - oov) < 1e-12
    assert abs(out1[1]["avg_nll"]
               - (2 * -math.log(3 / 7) + oov) / 3) < 1e-12


def test_ngram_decontamination_literal_and_join_paths(spark):
    """Both execution paths produce identical hand-computed results;
    the threshold gates is_contaminated; sub-gram docs pass through
    clean."""
    from deepchecks_spark.pipeline.decontam import ngram_decontamination

    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y"), (3, "p q r s t"), (4, "xy")],
        "doc_id long, text string")
    bench = spark.createDataFrame([("a b c",)], "text string")

    for lit_threshold in (10_000, 0):   # literal path, then join path
        out = {r["doc_id"]: r for r in ngram_decontamination(
            corpus, bench, "doc_id", "text", ngram=3,
            literal_threshold=lit_threshold).collect()}
        assert (out[1]["n_grams"], out[1]["n_contaminated"]) == (3, 1)
        assert abs(out[1]["contaminated_frac"] - 1 / 3) < 1e-12
        assert out[1]["is_contaminated"] and out[2]["is_contaminated"]
        assert (out[3]["n_contaminated"], out[3]["is_contaminated"]) == (0, False)
        assert (out[4]["n_grams"], out[4]["contaminated_frac"]) == (0, 0.0)

    # a fractional threshold above the overlap suppresses the flag
    out = {r["doc_id"]: r for r in ngram_decontamination(
        corpus, bench, "doc_id", "text", ngram=3, threshold=0.5).collect()}
    assert not out[1]["is_contaminated"] and out[1]["n_contaminated"] == 1


def test_ngram_decontamination_benchmark_gate(spark):
    from deepchecks_spark.pipeline.decontam import (
        BenchmarkTooLargeError,
        ngram_decontamination,
    )

    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    bench = spark.createDataFrame([("a b c d e f",)], "text string")
    with pytest.raises(BenchmarkTooLargeError):
        ngram_decontamination(corpus, bench, "doc_id", "text", ngram=3,
                              max_benchmark_grams=2)


def test_semantic_dedup_clusters_and_singletons(spark):
    """Exact clones collapse to min-id components; vectors with no
    near-duplicate pass through as their own representative."""
    from deepchecks_spark.pipeline.similarity import semantic_dedup

    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]), (4, [0.0, 0.0, 1.0, 0.0]),
            (5, [0.0, 0.0, 0.0, 1.0]), (6, [0.0, 0.0, 0.0, 1.0])]
    out = {r["id"]: r for r in semantic_dedup(
        spark.createDataFrame(rows, "id long, embedding array<double>"),
        dim=4, threshold=0.9, nlist=2, nprobe=2).collect()}
    assert {i: out[i]["component"] for i in out} == {
        1: 1, 2: 1, 3: 3, 4: 4, 5: 5, 6: 5}
    assert {i for i in out if out[i]["is_representative"]} == {1, 3, 4, 5}


def test_c4_clean_line_and_page_rules(spark):
    """Every C4 rule on crafted pages: line filters (terminal punct,
    min words, javascript), page drops (lorem ipsum, curly brace,
    too-few-sentences) and the rebuilt cleaned text."""
    from deepchecks_spark.pipeline.webclean import c4_clean

    df = spark.createDataFrame(
        [(1, "This is a good sentence.\nshort\nAnother fine sentence here!\n"
             "no punct line at all\nhas javascript in this line.\n"
             "Sentence two is here.\nSentence three is here.\n"
             "Sentence four is here.\nSentence five is here."),
         (2, "Lorem Ipsum dolor sit. One two three. Four five six. "
             "Seven eight nine. Ten eleven twelve."),
         (3, "code page { braces. One two three. Four five six. "
             "Seven eight nine. Ten eleven twelve."),
         (4, "Only one full sentence here.\nnothing else survives")],
        "id long, text string")
    out = {r["id"]: r for r in c4_clean(df, "text").collect()}

    r1 = out[1]
    assert r1["page_keep"] and r1["drop_reasons"] == ""
    assert r1["n_lines"] == 9 and r1["n_lines_kept"] == 6
    assert "short" not in r1["cleaned_text"]
    assert "javascript" not in r1["cleaned_text"]
    assert "no punct" not in r1["cleaned_text"]
    assert r1["cleaned_text"].startswith("This is a good sentence.")

    assert not out[2]["page_keep"] and "lorem_ipsum" in out[2]["drop_reasons"]
    assert not out[3]["page_keep"] and "curly_brace" in out[3]["drop_reasons"]
    assert not out[4]["page_keep"]
    assert out[4]["drop_reasons"] == "too_few_sentences"
    assert out[4]["n_sentences"] == 1


def test_pii_redaction_counts_and_order(spark):
    """Emails are consumed before the IP pass (an address-like token
    inside an email is counted once); counts match the rewrites."""
    from deepchecks_spark.pipeline.webclean import pii_redaction

    df = spark.createDataFrame(
        [(1, "mail a.b@test.org or 10.0.0.1 or +1 555-123-4567 end"),
         (2, "user@10.0.0.1.example.com only"),
         (3, "no pii at all here"),
         (4, "two ips 1.2.3.4 and 5.6.7.8")],
        "id long, text string")
    out = {r["id"]: r for r in pii_redaction(df, "text").collect()}

    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[1]["redacted_text"] == "mail <EMAIL> or <IP> or <PHONE> end"
    # the dotted-quad inside the email was consumed by the email pass
    assert (out[2]["n_email"], out[2]["n_ip"]) == (1, 0)
    assert out[2]["redacted_text"] == "<EMAIL> only"
    assert (out[3]["n_email"], out[3]["n_ip"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[3]["redacted_text"] == out[3]["text"]
    assert out[4]["n_ip"] == 2 and out[4]["redacted_text"].count("<IP>") == 2


def test_normalize_urls_canonical_forms(spark):
    from deepchecks_spark.pipeline.webclean import normalize_urls

    cases = [
        ("HTTP://Example.COM:80/path?utm_source=x&q=1#frag",
         "http://example.com/path?q=1"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("https://Example.com/", "https://example.com"),
        ("http://example.com/p?utm_campaign=a&utm_medium=b",
         "http://example.com/p"),
        ("http://example.com/p?q=1&fbclid=xyz", "http://example.com/p?q=1"),
        ("relative/path?gclid=1", "relative/path"),
        # anchored tracking strip: 'href='/'xref=' and path '/ref=' are
        # NOT tracking params and must survive untouched
        ("https://a.com/?href=x", "https://a.com/?href=x"),
        ("https://shop.com/product/ref=sr_1?id=9",
         "https://shop.com/product/ref=sr_1?id=9"),
        ("http://a.com/p?x=1&xref=2", "http://a.com/p?x=1&xref=2"),
        ("http://a.com/p?ref=abc&q=1", "http://a.com/p?q=1"),
        # port strip is scheme-aware and authority-anchored: ':80' in a
        # query is data; ':80' on https (and :8080 anywhere) is a real
        # non-default port naming a different origin
        ("https://a.com/page?time=12:80/x", "https://a.com/page?time=12:80/x"),
        ("https://a.com:80/path", "https://a.com:80/path"),
        ("http://a.com:443/path", "http://a.com:443/path"),
        ("http://a.com:8080/x", "http://a.com:8080/x"),
        ("http://a.com:80", "http://a.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["normalized_url"]
           for r in normalize_urls(df, "url").collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)


def test_url_duplicate_stats_collapses_variants(spark):
    from deepchecks_spark.pipeline.webclean import url_duplicate_stats

    df = spark.createDataFrame(
        [("HTTP://A.com/x?utm_source=1",), ("http://a.com/x",),
         ("http://a.com/x#frag",), ("http://b.com/only",)], "url string")
    rows = url_duplicate_stats(df, "url").collect()
    assert len(rows) == 1
    assert rows[0]["normalized_url"] == "http://a.com/x"
    assert rows[0]["n_raw"] == 3 and rows[0]["n_distinct_raw"] == 3


def test_remove_duplicated_lines_cross_corpus(spark):
    """A line shared by >=2 docs is removed everywhere (compared on the
    trimmed form); blank lines and within-doc repeats survive."""
    from deepchecks_spark.pipeline.webclean import remove_duplicated_lines

    df = spark.createDataFrame(
        [(1, "unique one\nshared boiler\n\nunique two"),
         (2, "  shared boiler  \nother unique"),
         (3, "repeat me\nrepeat me\nsolo"),
         (4, "")],
        "id long, text string")
    out = {r["id"]: r for r in
           remove_duplicated_lines(df, "id", "text").collect()}

    assert out[1]["n_lines"] == 4 and out[1]["n_lines_removed"] == 1
    assert out[1]["cleaned_text"] == "unique one\n\nunique two"
    # trimmed-form match: the padded variant is removed too
    assert out[2]["n_lines_removed"] == 1
    assert out[2]["cleaned_text"] == "other unique"
    # within-doc repeats are NOT cross-corpus duplicates
    assert out[3]["n_lines_removed"] == 0
    assert out[4]["n_lines"] == 1 and out[4]["n_lines_removed"] == 0


def test_domain_mixture_weights(spark):
    from deepchecks_spark.pipeline.webclean import domain_mixture

    df = spark.createDataFrame(
        [("a", "one two three"), ("a", "four five"), ("b", "six"), ("c", "x y")],
        "d string, text string")
    rows = {r["domain"]: r for r in
            domain_mixture(df, "d", "text", {"a": 0.5, "b": 0.5}).collect()}
    assert rows["a"]["n_docs"] == 2 and rows["a"]["n_tokens"] == 5
    assert abs(rows["a"]["token_share"] - 5 / 8) < 1e-12
    assert abs(rows["a"]["sampling_weight"] - 0.5 / (5 / 8)) < 1e-12
    assert abs(rows["b"]["sampling_weight"] - 0.5 / (1 / 8)) < 1e-12
    # no target entry -> NULL weight, stats still present
    assert rows["c"]["target_share"] is None
    assert rows["c"]["sampling_weight"] is None


# ------------------------------------------------- learned quality classifier

GOOD_DOCS = [
    "the quick brown fox jumps over the lazy dog in the morning light",
    "a careful reader will notice that the argument rests on a subtle point",
    "the committee agreed to publish the report and to revisit the question",
    "in the middle of the forest there is a clearing where the deer gather",
    "she walked to the market and bought bread cheese and a basket of plums",
    "the results of the experiment were consistent with the earlier findings",
]
BAD_DOCS = [
    "77 88 99 @@ ## $$ 1234567 !!!! 0000 9999 %% ^^ && ** (( )) 314159",
    "click here 999 free 777 win $$$ 0000 now 1111 !!! buy 2222 ??? 3333",
    "x9 z8 q7 w6 v5 u4 t3 s2 r1 q0 9z 8y 7x 6w 5v 4u 3t 2s 1r 0q 42 43",
    "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24 25",
    "## // \\ || @@ ^^ %% 55555 .. ,, ;; :: !! ?? 66666 ~~ `` 77777",
    "aaa111 bbb222 ccc333 ddd444 eee555 fff666 ggg777 hhh888 iii999 000",
]


@pytest.fixture(scope="module")
def labeled_quality(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD_DOCS)]
    rows += [(100 + i, t, 0) for i, t in enumerate(BAD_DOCS)]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_quality_features_hand_computed(spark):
    from deepchecks_spark.pipeline.classifier import quality_features

    df = spark.createDataFrame([(1, "The cat sat!"), (2, "   ")],
                               "id int, text string")
    rows = {r["id"]: r for r in quality_features(df, "text").collect()}
    r = rows[1]  # tokens: The/cat/sat! -> n=3, total_len=10
    assert abs(r["f_log_tokens"] - np.log1p(3)) < 1e-12
    assert abs(r["f_avg_token_len"] - 10 / 3) < 1e-12
    assert r["f_stopword_ratio"] == 0.0  # "The" is cased; isin is case-sensitive
    assert abs(r["f_punct_ratio"] - 1 / 12) < 1e-12
    assert abs(r["f_upper_ratio"] - 1 / 12) < 1e-12
    assert r["f_digit_ratio"] == 0.0
    blank = rows[2]
    assert all(blank[f] == 0.0 for f in
               ("f_log_tokens", "f_avg_token_len", "f_stopword_ratio",
                "f_punct_ratio", "f_upper_ratio", "f_digit_ratio"))


def test_quality_classifier_separates_planted_labels(spark, labeled_quality):
    from deepchecks_spark.pipeline.classifier import (
        score_quality, train_quality_classifier)

    model = train_quality_classifier(labeled_quality, "text", "label")
    assert set(model["weights"]) == set(model["features"])
    out = score_quality(labeled_quality, "text", model,
                        threshold=0.5).collect()
    assert all(r["quality_score_pred"] == r["label"] for r in out)
    assert all(0.0 < r["quality_score"] < 1.0 for r in out)


def test_quality_classifier_distributed_matches_local(spark, labeled_quality):
    from deepchecks_spark.pipeline.classifier import train_quality_classifier

    local = train_quality_classifier(labeled_quality, "text", "label",
                                     iters=50)
    dist = train_quality_classifier(labeled_quality, "text", "label",
                                    iters=50, distributed=True)
    assert abs(local["intercept"] - dist["intercept"]) < 1e-6
    for k in local["weights"]:
        assert abs(local["weights"][k] - dist["weights"][k]) < 1e-6


def test_quality_classifier_train_gate(spark, labeled_quality):
    from deepchecks_spark.pipeline.classifier import train_quality_classifier

    with pytest.raises(ValueError, match="max_train_rows"):
        train_quality_classifier(labeled_quality, "text", "label",
                                 max_train_rows=5)


def test_quality_filter_keeps_good(spark, labeled_quality):
    from deepchecks_spark.pipeline.classifier import (
        quality_filter, train_quality_classifier)

    model = train_quality_classifier(labeled_quality, "text", "label")
    kept = quality_filter(labeled_quality, "text", model).collect()
    assert {r["doc_id"] for r in kept} == {i for i in range(len(GOOD_DOCS))}
    assert "quality_score" not in kept[0].asDict()


# ------------------------------------------------ stupid-backoff bigram LM

def test_bigram_logprob_hand_computed(spark):
    from deepchecks_spark.pipeline.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            bigram_logprob(df, "doc_id", "text").collect()}
    # counts: c(a)=3 c(b)=2 N=5 V=2 denom=8; c(a,b)=2 c(b,a)=1
    import math
    d1 = [-math.log(4 / 8), -math.log(2 / 3), -math.log(1 / 2)]
    assert rows[1]["n_tokens"] == 3
    assert abs(rows[1]["avg_nll"] - sum(d1) / 3) < 1e-12
    d2 = [-math.log(4 / 8), -math.log(2 / 3)]
    assert rows[2]["n_tokens"] == 2
    assert abs(rows[2]["avg_nll"] - sum(d2) / 2) < 1e-12
    assert abs(rows[2]["pseudo_perplexity"]
               - math.exp(sum(d2) / 2)) < 1e-12
    assert rows[3]["n_tokens"] == 0 and rows[3]["avg_nll"] is None


def test_bigram_logprob_backoff_on_heldout_text(spark):
    from deepchecks_spark.pipeline.textstats import bigram_logprob

    train = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    score = spark.createDataFrame([(9, "b b c")], "doc_id long, text string")
    r = bigram_logprob(score, "doc_id", "text", train_df=train).collect()[0]
    # train counts: c(a)=2 c(b)=1 N=3 V=2 denom=6; bigrams {(a,b),(b,a)}
    import math
    exp = [-math.log((1 + 1) / 6),            # first token b: p1(b)
           -math.log(0.4 * (1 + 1) / 6),       # (b,b) unseen -> backoff p1(b)
           -math.log(0.4 * (0 + 1) / 6)]       # (b,c) unseen, c OOV -> p1(c)
    assert r["n_tokens"] == 3
    assert abs(r["avg_nll"] - sum(exp) / 3) < 1e-12


def test_perplexity_buckets_explicit_and_auto(spark):
    from deepchecks_spark.pipeline.textstats import perplexity_buckets

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)] + [(99, None)],
        "id long, ppl double")
    rows = {r["id"]: r["ppl_bucket"] for r in
            perplexity_buckets(df, "ppl", thresholds=[3.0, 6.0]).collect()}
    assert rows[1] == rows[3] == "head"
    assert rows[4] == rows[6] == "middle"
    assert rows[7] == rows[9] == "tail"
    assert rows[99] is None
    auto = {r["id"]: r["ppl_bucket"] for r in
            perplexity_buckets(df, "ppl").collect()}
    assert auto[1] == "head" and auto[9] == "tail"
    assert sorted(set(v for v in auto.values() if v)) == [
        "head", "middle", "tail"]
    with pytest.raises(ValueError, match="thresholds"):
        perplexity_buckets(df, "ppl", thresholds=[1.0])


def test_repeated_span_stats_hand_computed(spark):
    """Lee-et-al exact-substring semantics with w=3: a window is
    duplicated when its content occurs >=2 times corpus-wide, including
    within one document; covered tokens are the interval UNION of the
    duplicated windows (overlaps not double-counted)."""
    from deepchecks_spark.pipeline.dedup import repeated_span_stats

    df = spark.createDataFrame(
        [("d1", "a b c d e f"),
         ("d2", "x a b c d y"),
         ("d3", "p q r s p q r t p q"),
         ("d4", "z z"),
         ("d5", "")],
        "id string, text string")
    out = {r["id"]: r for r in
           repeated_span_stats(df, "id", "text", window_words=3).collect()}
    # d1/d2 share 'a b c' and 'b c d' -> two overlapping windows each,
    # union 4 tokens
    assert (out["d1"]["n_tokens"], out["d1"]["n_windows"]) == (6, 4)
    assert (out["d1"]["n_dup_windows"], out["d1"]["dup_tokens"]) == (2, 4)
    assert abs(out["d1"]["dup_token_frac"] - 4 / 6) < 1e-12
    assert (out["d2"]["n_dup_windows"], out["d2"]["dup_tokens"]) == (2, 4)
    # d3 repeats 'p q r' WITHIN itself at pos 0 and 4 -> disjoint spans,
    # 6 covered tokens of 10
    assert (out["d3"]["n_dup_windows"], out["d3"]["dup_tokens"]) == (2, 6)
    assert abs(out["d3"]["dup_token_frac"] - 6 / 10) < 1e-12
    # sub-window and empty docs keep zero rows
    for d in ("d4", "d5"):
        assert (out[d]["n_windows"], out[d]["n_dup_windows"],
                out[d]["dup_token_frac"]) == (0, 0, 0.0)
    assert out["d4"]["n_tokens"] == 2 and out["d5"]["n_tokens"] == 0


def test_remove_repeated_spans_keeps_canonical(spark):
    """The canonical (min (id, pos)) occurrence of each duplicated
    window survives; every other occurrence's tokens are cut, with
    overlapping removals unioned before the rebuild."""
    from deepchecks_spark.pipeline.dedup import remove_repeated_spans

    df = spark.createDataFrame(
        [("d1", "a b c d e f"),
         ("d2", "x a b c d y"),
         ("d3", "p q r s p q r t p q"),
         ("d4", "z z")],
        "id string, text string")
    out = {r["id"]: r["text"] for r in
           remove_repeated_spans(df, "id", "text", window_words=3).collect()}
    assert out["d1"] == "a b c d e f"        # canonical copies stay
    assert out["d2"] == "x y"                # overlapping spans 1-3,2-4 cut
    assert out["d3"] == "p q r s t p q"      # second 'p q r' at pos 4 cut
    assert out["d4"] == "z z"                # sub-window doc untouched


def test_incremental_dedup_anti_join_and_within_batch(spark):
    """Batch docs whose text exists in the seen corpus are dropped;
    within the batch one representative (min id) survives per text;
    re-running after appending survivors removes everything."""
    from deepchecks_spark.pipeline.dedup import incremental_dedup

    seen = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha beta"),      # already seen -> dropped
         (11, "epsilon zeta"),    # fresh, unique
         (12, "eta theta"),       # fresh, duplicated in-batch
         (13, "eta theta"),       # in-batch dup -> dropped (12 < 13)
         (14, "gamma delta")],    # already seen -> dropped
        "doc_id long, text string")
    out = incremental_dedup(batch, seen, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out.collect()) == [11, 12]
    assert out.columns == batch.columns
    # idempotence: after the survivors join the corpus, nothing survives
    seen2 = seen.union(out.select("doc_id", "text"))
    assert incremental_dedup(batch, seen2, "doc_id", "text").count() == 0


def test_sample_to_mixture_deterministic_and_exact(spark):
    """Every keep/replicate decision recomputes exactly from (id, seed)
    with 64-bit integer arithmetic — the python twin below IS the
    DuckDB oracle's arithmetic; missing domains drop; copy indexes are
    dense from 0."""
    from deepchecks_spark.pipeline.webclean import sample_to_mixture

    rows = [(i, "a" if i % 3 == 0 else ("b" if i % 3 == 1 else "c"))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    weights = {"a": 0.5, "b": 2.25}   # c missing -> dropped
    out = sample_to_mixture(df, "domain", "doc_id", weights, seed=7).collect()

    def n_copies(i, w, seed=7):
        u = ((i % 2147483648) * 2654435761 + seed) % 4294967296 / 4294967296
        base = int(w)
        return base + (1 if u < w - base else 0)

    expected = {}
    for i, d in rows:
        w = weights.get(d, 0.0)
        if n_copies(i, w) > 0:
            expected[i] = n_copies(i, w)
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy"])
    assert {k: len(v) for k, v in got.items()} == expected
    for k, v in got.items():
        assert sorted(v) == list(range(len(v)))   # dense 0-based replicas
    assert not any(r["domain"] == "c" for r in out)
    # b is upsampled: every b row has >= 2 copies (floor(2.25) = 2)
    assert all(len(got[i]) >= 2 for i, d in rows if d == "b")
    # determinism across invocations
    again = sample_to_mixture(df, "domain", "doc_id", weights, seed=7).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_pack_sequences_hand_computed(spark):
    """Concat-and-cut packing: offsets are the exclusive prefix sum of
    whitespace token counts in id order; docs may span sequence
    boundaries; empty docs occupy zero tokens."""
    from deepchecks_spark.pipeline.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "a b c"),            # start 0, seqs 0-0
         (2, "d e f g"),          # start 3, tokens 3..6 -> seqs 0-1
         (3, ""),                 # start 7, empty -> seqs 1-1
         (4, "h i j k l m n"),    # start 7, tokens 7..13 -> seqs 1-2
         (5, "o")],               # start 14, seqs 2-2
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           pack_sequences(df, "doc_id", "text", seq_len=5).collect()}
    expect = {1: (3, 0, 0, 0), 2: (4, 3, 0, 1), 3: (0, 7, 1, 1),
              4: (7, 7, 1, 2), 5: (1, 14, 2, 2)}
    for k, (n, s, f0, l0) in expect.items():
        r = out[k]
        assert (r["n_tokens"], r["start_offset"], r["first_seq"],
                r["last_seq"]) == (n, s, f0, l0), (k, r)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "doc_id", "text", seq_len=0)


def test_pack_sequences_partition_invariant(spark):
    """The distributed prefix scan gives the same offsets no matter how
    the input is partitioned (prefix sums compose associatively across
    the sampled range boundaries) — verified against a single-threaded
    python recomputation over 300 docs and 32 shuffle partitions."""
    from deepchecks_spark.pipeline.packing import pack_sequences

    rows = [(i, " ".join(["w"] * (i % 7))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["start_offset"], r["first_seq"], r["last_seq"])
           for r in pack_sequences(df.repartition(13), "doc_id", "text",
                                   seq_len=11).collect()}
    start = 0
    for i, text in rows:
        n = len(text.split()) if text.strip() else 0
        assert out[i] == (start, start // 11, (start + max(n - 1, 0)) // 11), i
        start += n


def test_assign_token_shards_hand_computed(spark):
    """Contiguous token-balanced shards: shard = floor(start/total * n),
    clamped; docs never split; zero-token docs take their offset's
    shard."""
    from deepchecks_spark.pipeline.packing import assign_token_shards

    df = spark.createDataFrame(
        [(1, "a b c d"),      # start 0  -> shard 0
         (2, ""),             # start 4  -> shard 1 (4/10*2=0.8? no: n=2)
         (3, "e f g"),        # start 4
         (4, "h i j")],       # start 7
        "doc_id long, text string")
    out = {r["doc_id"]: r["shard"] for r in
           assign_token_shards(df, "doc_id", "text", n_shards=2).collect()}
    # total = 10 tokens; boundary at start >= 5: doc1 (0)->0, doc2/3
    # (4)->0, doc4 (7)->1
    assert out == {1: 0, 2: 0, 3: 0, 4: 1}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_shards"):
        assign_token_shards(df, "doc_id", "text", n_shards=0)


def test_assign_token_shards_balance_and_invariance(spark):
    """Shards are contiguous in order, every doc lands in [0, n), the
    assignment is partition-invariant, and per-shard token mass deviates
    from the ideal by less than the largest document."""
    from deepchecks_spark.pipeline.packing import assign_token_shards

    rows = [(i, " ".join(["w"] * (i % 13))) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["start_offset"], r["shard"])
           for r in assign_token_shards(df.repartition(17), "doc_id",
                                        "text", n_shards=5).collect()}
    total = sum(len(t.split()) for _, t in rows if t.strip())
    start = 0
    per_shard = {}
    prev_shard = 0
    for i, text in rows:
        n = len(text.split()) if text.strip() else 0
        shard = min(int(start / total * 5), 4)
        assert got[i] == (n, start, shard), i
        assert shard >= prev_shard  # contiguous, non-decreasing
        prev_shard = shard
        per_shard[shard] = per_shard.get(shard, 0) + n
        start += n
    ideal = total / 5
    assert all(abs(v - ideal) < 13 for v in per_shard.values()), per_shard


def test_assign_token_shards_zero_token_corpus(spark):
    from deepchecks_spark.pipeline.packing import assign_token_shards

    df = spark.createDataFrame([(1, ""), (2, "  ")],
                               "doc_id long, text string")
    out = assign_token_shards(df, "doc_id", "text", n_shards=4).collect()
    assert {r["shard"] for r in out} == {0}
    assert all(r["n_tokens"] == 0 for r in out)


def test_remove_repeated_spans_merges_heavy_overlap(spark):
    """A long duplicated run produces many overlapping removal spans
    that must collapse into one merged interval: the whole duplicated
    tail is cut in a single sweep, and disjoint removals on the same
    doc are both honored."""
    from deepchecks_spark.pipeline.dedup import remove_repeated_spans

    run = " ".join(f"t{i}" for i in range(12))       # 12-token shared run
    df = spark.createDataFrame(
        [("a", run),                                  # canonical copy
         ("b", "x " + run + " y u v w " + run)],      # two duplicated runs
        "id string, text string")
    out = {r["id"]: r["text"] for r in
           remove_repeated_spans(df, "id", "text", window_words=3).collect()}
    assert out["a"] == run
    # both embedded runs are non-canonical: every window inside them is
    # duplicated, overlapping spans merge, and only the glue survives
    assert out["b"] == "x y u v w"


def test_pack_sequences_broadcast_prefix_path(spark, monkeypatch):
    """Above PREFIX_LITERAL_MAX range partitions the prefix offsets ship
    as a broadcast-joined table, not a create_map literal (plan stays
    O(1) in partition count); both paths must agree exactly."""
    from deepchecks_spark.pipeline import packing

    rows = [(i, " ".join(["w"] * (i % 5 + 1))) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lit = sorted(map(tuple, packing.pack_sequences(
        df, "doc_id", "text", seq_len=7).collect()))
    monkeypatch.setattr(packing, "PREFIX_LITERAL_MAX", 0)
    joined = sorted(map(tuple, packing.pack_sequences(
        df, "doc_id", "text", seq_len=7).collect()))
    assert lit == joined


def test_sample_to_mixture_broadcast_weight_path(spark, monkeypatch):
    """Above WEIGHTS_LITERAL_MAX domains the weight map ships as a
    broadcast-joined table; output (including column order) must match
    the literal path exactly."""
    from deepchecks_spark.pipeline import webclean

    rows = [(i, f"d{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    weights = {"d0": 0.5, "d1": 2.25, "d3": 1.0}
    lit = webclean.sample_to_mixture(df, "domain", "doc_id", weights, seed=3)
    lit_rows = sorted(map(tuple, lit.collect()))
    monkeypatch.setattr(webclean, "WEIGHTS_LITERAL_MAX", 0)
    joined = webclean.sample_to_mixture(df, "domain", "doc_id", weights, seed=3)
    assert joined.columns == lit.columns
    assert sorted(map(tuple, joined.collect())) == lit_rows


def test_incremental_dedup_null_text_is_null_safe(spark):
    """NULL texts group together (constant xxhash64): one survives a
    NULL-free corpus, none survive a corpus that already has one."""
    from deepchecks_spark.pipeline.dedup import incremental_dedup

    batch = spark.createDataFrame(
        [(20, None), (21, None), (22, "fresh text")],
        "doc_id long, text string")
    seen_clean = spark.createDataFrame([(1, "other")], "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  incremental_dedup(batch, seen_clean, "doc_id", "text").collect())
    assert kept == [20, 22]
    seen_null = spark.createDataFrame([(1, None)], "doc_id long, text string")
    kept2 = sorted(r["doc_id"] for r in
                   incremental_dedup(batch, seen_null, "doc_id", "text").collect())
    assert kept2 == [22]


def test_semantic_decontamination_planted_copy(spark):
    """Exact copy of a benchmark vector flags at a near-1 threshold;
    orthogonal vectors don't; NULL corpus embeddings keep their spine
    row with NULL max_cosine and a false flag."""
    from deepchecks_spark.pipeline.decontam import semantic_decontamination

    bench = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])],
        "id long, embedding array<double>")
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]),      # exact copy of bench 10
         (2, [0.0, 0.0, 1.0]),      # orthogonal to both
         (3, [1.0, 1.0, 0.0]),      # cos 1/sqrt(2) to both -> tie, min id
         (4, None)],
        "id long, embedding array<double>")
    out = {r["id"]: r for r in semantic_decontamination(
        corpus, bench, "id", "embedding", threshold=0.999).collect()}
    assert out[1]["is_contaminated"] and out[1]["nearest_bench_id"] == 10
    assert abs(out[1]["max_cosine"] - 1.0) < 1e-12
    assert not out[2]["is_contaminated"] and abs(out[2]["max_cosine"]) < 1e-12
    assert out[3]["nearest_bench_id"] == 10  # deterministic tie-break
    assert out[4]["max_cosine"] is None and out[4]["is_contaminated"] is False
    assert out[4]["nearest_bench_id"] is None
    assert len(out) == 4  # full spine preserved


def test_semantic_decontamination_gates(spark):
    from deepchecks_spark.pipeline.decontam import (
        BenchmarkTooLargeError, semantic_decontamination)

    corpus = spark.createDataFrame([(1, [1.0])], "id long, embedding array<double>")
    big_bench = spark.range(10).selectExpr("id", "array(1.0) as embedding")
    with pytest.raises(BenchmarkTooLargeError):
        semantic_decontamination(corpus, big_bench, "id", "embedding",
                                 max_benchmark_rows=5)
    empty = big_bench.filter("id < 0")
    with pytest.raises(ValueError, match="non-NULL embeddings"):
        semantic_decontamination(corpus, empty, "id", "embedding")


def test_vocabulary_stats_hand_computed(spark):
    from deepchecks_spark.pipeline.textstats import top_terms, vocabulary_stats

    df = spark.createDataFrame(
        [(1, "a b b c"), (2, "   "), (3, "c c d"), (4, None)],
        "id long, text string")
    row = vocabulary_stats(df, "text").collect()[0]
    assert row["total_tokens"] == 7
    assert row["n_types"] == 4
    assert row["hapax_types"] == 2  # a, d
    assert abs(row["type_token_ratio"] - 4 / 7) < 1e-12
    assert abs(row["hapax_frac"] - 0.5) < 1e-12

    tt = top_terms(df, "text", k=3).collect()
    assert [(r["term"], r["n"], r["rank"]) for r in tt] == [
        ("c", 3, 1), ("b", 2, 2), ("a", 1, 3)]  # count desc, term asc


def test_select_by_token_budget_hand_computed(spark):
    """Greedy quality-prefix selection: rank by score desc (id asc ties),
    keep every doc whose START offset is under the budget — including
    the straddler; NULL scores rank last."""
    from deepchecks_spark.pipeline.packing import select_by_token_budget

    df = spark.createDataFrame(
        [(1, "a b c", 9.0),        # rank 1, start 0
         (2, "d e", 9.0),          # rank 2 (id tiebreak), start 3
         (3, "f g h i", 5.0),      # rank 3, start 5 -> straddles budget 6
         (4, "j", 1.0),            # rank 4, start 9 -> out
         (5, "k l", None)],        # NULL score ranks last, start 10 -> out
        "doc_id long, text string, score double")
    out = {r["doc_id"]: r for r in
           select_by_token_budget(df, "doc_id", "text", "score", 6).collect()}
    assert [(out[i]["start_offset"], out[i]["selected"]) for i in (1, 2, 3, 4, 5)] \
        == [(0, True), (3, True), (5, True), (9, False), (10, False)]
    assert out[5]["score"] is None  # NULL passes through the verdict frame
    # zero budget selects nothing
    none_sel = select_by_token_budget(df, "doc_id", "text", "score", 0)
    assert none_sel.filter("selected").count() == 0


def test_select_by_token_budget_partition_invariant(spark):
    """Same distributed-prefix-scan invariance as pack_sequences: the
    selected set is identical however the input is partitioned, and
    matches a single-threaded recomputation."""
    from deepchecks_spark.pipeline.packing import select_by_token_budget

    rows = [(i, " ".join(["w"] * (i % 6 + 1)), float((i * 37) % 50))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    got = {r["doc_id"]: (r["start_offset"], r["selected"]) for r in
           select_by_token_budget(df.repartition(17), "doc_id", "text",
                                  "score", 300).collect()}
    start, expect = 0, {}
    for i, text, score in sorted(rows, key=lambda r: (-r[2], r[0])):
        expect[i] = (start, start < 300)
        start += len(text.split())
    assert got == expect


def test_keep_latest_crawl_hand_computed(spark):
    """One row per url: the max-(ts, tiebreak) snapshot, full schema."""
    from deepchecks_spark.pipeline.webclean import keep_latest_crawl

    df = spark.createDataFrame(
        [("u1", 10, 1, "old"), ("u1", 20, 2, "new"),
         ("u2", 5, 3, "only"),
         ("u3", 7, 4, "tie-lo"), ("u3", 7, 5, "tie-hi")],
        "url string, ts long, rec_id long, text string")
    out = {r["url"]: (r["ts"], r["rec_id"], r["text"]) for r in
           keep_latest_crawl(df, "url", "ts", tiebreak_col="rec_id").collect()}
    assert out == {"u1": (20, 2, "new"), "u2": (5, 3, "only"),
                   "u3": (7, 5, "tie-hi")}
    assert keep_latest_crawl(df, "url", "ts").columns == df.columns


def test_corpus_datacard_hand_computed(spark):
    from deepchecks_spark.pipeline.textstats import corpus_datacard

    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a b c", "en"), (3, "", "de"),
         (4, None, "de"), (5, "x", None)],
        "id long, text string, lang string")
    card = {r["metric"]: r["value"] for r in
            corpus_datacard(df, "text", "lang").collect()}
    assert card["n_docs"] == 5.0
    assert card["n_null_text"] == 1.0
    assert card["n_empty_text"] == 1.0
    assert card["total_tokens"] == 7.0
    assert abs(card["mean_tokens_per_doc"] - 7 / 5) < 1e-9
    # distinct non-null texts: "a b c", "", "x" -> 3; dup frac = 1 - 3/4
    assert card["n_distinct_texts"] == 3.0
    assert abs(card["duplicate_frac"] - 0.25) < 1e-9
    assert card["n_langs"] == 3.0  # en, de, NULL bucket
    import math
    ent = -(0.4 * math.log2(0.4) + 0.4 * math.log2(0.4) + 0.2 * math.log2(0.2))
    assert abs(card["lang_entropy_bits"] - ent) < 1e-9


def test_bloom_no_false_negatives_and_fpp(spark):
    """Every corpus text probes True (Bloom filters cannot false-
    negative); fresh texts false-positive at roughly the nominal rate
    (seeded fixture, generous 5x bound)."""
    from deepchecks_spark.pipeline.dedup import build_text_bloom

    corpus = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("corpus doc "), F.col("id")).alias("text"))
    bloom = build_text_bloom(corpus, "text", expected_items=2000, fpp=0.01)
    hits = corpus.withColumn(
        "hit", bloom.might_contain(spark, "text")).filter(~F.col("hit"))
    assert hits.count() == 0  # no false negatives, ever

    fresh = spark.range(0, 4000).select(
        F.concat(F.lit("fresh doc "), F.col("id")).alias("text"))
    fp = fresh.withColumn(
        "hit", bloom.might_contain(spark, "text")).filter(F.col("hit")).count()
    assert fp / 4000.0 < 0.05  # nominal 0.01, generous slack


def test_incremental_dedup_bloom_matches_exact_path(spark):
    """The bloom-prefiltered path returns exactly the exact path's rows
    — including NULL-text convention and in-batch canonicalization —
    and a prebuilt bloom amortizes across batches."""
    from deepchecks_spark.pipeline.dedup import (
        build_text_bloom, incremental_dedup, incremental_dedup_bloom)

    seen = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, None)],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon zeta"), (12, "eta theta"),
         (13, "eta theta"), (14, "gamma delta"), (15, None)],
        "doc_id long, text string")
    exact = sorted(r["doc_id"]
                   for r in incremental_dedup(batch, seen, "doc_id", "text").collect())
    out = incremental_dedup_bloom(batch, seen, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out.collect()) == exact
    assert out.columns == batch.columns

    # amortized shape: one prebuilt bloom serves several batches
    bloom = build_text_bloom(seen, "text", expected_items=3)
    b2 = spark.createDataFrame(
        [(20, "alpha beta"), (21, "iota kappa")], "doc_id long, text string")
    got = incremental_dedup_bloom(b2, seen, "doc_id", "text", bloom=bloom)
    assert sorted(r["doc_id"] for r in got.collect()) == [21]


def test_incremental_dedup_bloom_corpus_never_shuffles(spark):
    """Scale-shape pin: the corpus branch is scan -> broadcast semi-join
    (no SortMergeJoin anywhere; both verification joins broadcast)."""
    from deepchecks_spark.pipeline.dedup import (
        build_text_bloom, incremental_dedup_bloom)

    seen = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"))
    batch = spark.range(0, 50).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.concat(F.lit("doc "), (F.col("id") * 2)).alias("text"))
    bloom = build_text_bloom(seen, "text", expected_items=100)
    plan = incremental_dedup_bloom(
        batch, seen, "doc_id", "text",
        bloom=bloom)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_incremental_dedup_bloom_candidate_gate_falls_back(spark):
    """Above max_candidate_hashes the force-broadcast verification is
    abandoned for the exact shuffled path — same output either way."""
    from deepchecks_spark.pipeline.dedup import (
        incremental_dedup, incremental_dedup_bloom)

    seen = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"))
    # re-crawl batch: every row already seen -> candidate set ~= batch
    batch = spark.range(0, 200).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"))
    exact = sorted(r["doc_id"] for r in
                   incremental_dedup(batch, seen, "doc_id", "text").collect())
    out = incremental_dedup_bloom(batch, seen, "doc_id", "text",
                                  max_candidate_hashes=10)
    assert sorted(r["doc_id"] for r in out.collect()) == exact == []


def test_split_by_group_leakage_safe_and_deterministic(spark):
    """Every row of a group lands on one side; assignment is a pure
    function of (group, seed); NULL groups travel together; the frac
    bounds behave."""
    from deepchecks_spark.pipeline.webclean import split_by_group

    rows = [(i, f"dom{i % 7}" if i % 11 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = split_by_group(df, "domain", 0.5, seed=3)
    per_group = (out.groupBy("domain")
                 .agg(F.count_distinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_group)  # no group straddles
    # deterministic: identical assignment on re-run
    a = {(r["id"], r["split"]) for r in out.collect()}
    b = {(r["id"], r["split"])
         for r in split_by_group(df, "domain", 0.5, seed=3).collect()}
    assert a == b
    # a different seed reshuffles at least one group (7 groups, 0.5)
    c = {(r["id"], r["split"])
         for r in split_by_group(df, "domain", 0.5, seed=4).collect()}
    assert c != a
    assert split_by_group(df, "domain", 0.0).filter(
        F.col("split") == "test").count() == 0
    assert split_by_group(df, "domain", 1.0).filter(
        F.col("split") == "train").count() == 0
    # zero shuffle
    plan = split_by_group(df, "domain", 0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_partitioned_bloom_matches_exact_path(spark):
    """The partitioned-bloom path (cogrouped per-bucket probe) returns
    exactly the exact path's rows, including NULL text and empty
    buckets (a batch bucket with no corpus bitmap is provably fresh);
    a prebuilt bloom table amortizes across batches."""
    from deepchecks_spark.pipeline.dedup import (
        build_partitioned_text_bloom, incremental_dedup,
        incremental_dedup_bloom_partitioned)

    seen = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, None)],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon zeta"), (12, "eta theta"),
         (13, "eta theta"), (14, "gamma delta"), (15, None),
         (16, "iota kappa")],
        "doc_id long, text string")
    exact = sorted(r["doc_id"] for r in
                   incremental_dedup(batch, seen, "doc_id", "text").collect())
    out = incremental_dedup_bloom_partitioned(
        batch, seen, "doc_id", "text", n_buckets=8)
    assert sorted(r["doc_id"] for r in out.collect()) == exact
    assert out.columns == batch.columns

    bloom = build_partitioned_text_bloom(seen, "text", n_buckets=4,
                                         expected_items=3)
    bloom.blooms = bloom.blooms.persist()  # amortized across batches
    b2 = spark.createDataFrame(
        [(20, "alpha beta"), (21, "lambda mu")], "doc_id long, text string")
    got = incremental_dedup_bloom_partitioned(
        b2, seen, "doc_id", "text", bloom=bloom)
    assert sorted(r["doc_id"] for r in got.collect()) == [21]
    # bitmap table is one row per non-empty bucket
    assert bloom.blooms.count() <= 4


def test_partitioned_bloom_no_false_negatives_larger(spark):
    """2k-document corpus across 16 buckets: every seen text probes as
    a candidate (no false negatives across bucket boundaries)."""
    from deepchecks_spark.pipeline.dedup import (
        build_partitioned_text_bloom, incremental_dedup_bloom_partitioned)

    seen = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("corpus doc "), F.col("id")).alias("text"))
    bloom = build_partitioned_text_bloom(seen, "text", n_buckets=16,
                                         expected_items=2000, fpp=0.01)
    # re-submit the whole corpus as a batch: everything is a duplicate
    batch = seen.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    out = incremental_dedup_bloom_partitioned(
        batch, seen, "doc_id", "text", bloom=bloom)
    assert out.count() == 0


def test_rebalance_classes_minority_target_and_null_label(spark):
    """Default target = minority-class count; classes downsample /
    upsample toward it via the same Knuth-hash arithmetic as
    sample_to_mixture; NULL labels form their own class (null-safe
    join); determinism across invocations."""
    from deepchecks_spark.pipeline.webclean import rebalance_classes

    rows = []
    for i in range(60):
        rows.append((i, "big"))          # 60
    for i in range(60, 80):
        rows.append((i, "mid"))          # 20
    for i in range(80, 90):
        rows.append((i, "small"))        # 10 -> minority
    for i in range(90, 95):
        rows.append((i, None))           # 5 -> actually minority
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_classes(df, "lang", "doc_id", seed=7).collect()

    def n_copies(i, w, seed=7):
        u = ((i % 2147483648) * 2654435761 + seed) % 4294967296 / 4294967296
        base = int(w)
        return base + (1 if u < w - base else 0)

    counts = {"big": 60, "mid": 20, "small": 10, None: 5}
    target = min(counts.values())        # 5
    expected = {}
    for i, lang in rows:
        w = target / counts[lang]
        n = n_copies(i, w)
        if n > 0:
            expected[i] = n
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy"])
    assert {k: len(v) for k, v in got.items()} == expected
    for k, v in got.items():
        assert sorted(v) == list(range(len(v)))
    # NULL-label rows participate (w = 1.0 -> all kept exactly once)
    null_ids = {i for i, l in rows if l is None}
    assert all(len(got[i]) == 1 for i in null_ids)
    again = rebalance_classes(df, "lang", "doc_id", seed=7).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_rebalance_classes_explicit_target_upsamples(spark):
    """target_count above every class count -> every class replicates;
    expected copies = floor(w) + Bernoulli(frac(w))."""
    from deepchecks_spark.pipeline.webclean import rebalance_classes

    rows = [(i, "a" if i < 4 else "b") for i in range(10)]  # a:4, b:6
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_classes(df, "lang", "doc_id", target_count=12, seed=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r["copy"])
    # w_a = 3.0 exactly -> every a row appears exactly 3 times
    assert all(len(got[i]) == 3 for i in range(4))
    # w_b = 2.0 exactly -> every b row appears exactly 2 times
    assert all(len(got[i]) == 2 for i in range(4, 10))


def test_rebalance_classes_gates(spark):
    from deepchecks_spark.pipeline.webclean import rebalance_classes

    df = spark.createDataFrame([(i, str(i)) for i in range(50)],
                               "doc_id long, lang string")
    with pytest.raises(ValueError, match="distinct values"):
        rebalance_classes(df, "lang", "doc_id", max_classes=10).collect()
    with pytest.raises(ValueError, match="target_count"):
        rebalance_classes(df, "lang", "doc_id", target_count=0)


def test_embedding_integrity_stats_hand_computed(spark):
    """Planted defects of every kind; the one-row profile counts each
    bucket exactly and the norm summary covers clean rows only."""
    from deepchecks_spark.pipeline.similarity import embedding_integrity_stats

    rows = [
        (1, [3.0, 4.0]),          # clean, norm 5
        (2, [0.0, 0.0]),          # zero-norm
        (3, None),                # null
        (4, []),                  # empty
        (5, [float("nan"), 1.0]), # nan
        (6, [1.0, 0.0, 0.0]),     # clean, norm 1, dim 3 -> inconsistent
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_integrity_stats(df, "embedding").collect()[0]
    assert r["n_rows"] == 6
    assert r["n_null"] == 1
    assert r["n_empty"] == 1
    assert r["n_nan"] == 1
    assert r["n_zero_norm"] == 1
    assert r["min_dim"] == 0 and r["max_dim"] == 3
    assert r["dims_consistent"] is False
    assert abs(r["min_norm"] - 0.0) < 1e-12
    assert abs(r["max_norm"] - 5.0) < 1e-12
    assert abs(r["avg_norm"] - (5.0 + 0.0 + 1.0) / 3) < 1e-12


def test_embedding_integrity_stats_single_aggregation_plan(spark):
    """The profile is ONE distributive aggregation: exactly one Exchange
    (the one-row final agg), no Expand, no Python."""
    from deepchecks_spark.pipeline.similarity import embedding_integrity_stats

    df = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(1), F.rand(2)).alias("embedding"))
    plan = embedding_integrity_stats(df, "embedding")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Expand" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_stratified_sample_exact_vs_single_window(spark):
    """The salted two-stage top-k must equal the naive single-window
    answer exactly, including on a heavily skewed stratum and with
    k larger than a small stratum's size."""
    from deepchecks_spark.pipeline.webclean import stratified_sample

    rows = ([(i, "en") for i in range(500)]          # huge stratum
            + [(1000 + i, "fr") for i in range(9)]   # medium
            + [(2000, "xx")]                          # singleton
            + [(3000, None), (3001, None)])           # NULL stratum
    df = spark.createDataFrame(rows, "doc_id long, lang string").repartition(8)
    out = stratified_sample(df, "lang", "doc_id", k=5, salt_buckets=4)
    got = sorted(((r["lang"], r["sample_rank"], r["doc_id"])
                  for r in out.collect()), key=repr)
    df.createOrReplaceTempView("strat_in")
    expected = sorted(((r["lang"], r["sample_rank"], r["doc_id"])
                       for r in spark.sql("""
        SELECT lang, doc_id, sample_rank FROM (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(cast(doc_id AS string)),
                                             doc_id) AS sample_rank
          FROM strat_in) WHERE sample_rank <= 5""").collect()), key=repr)
    assert got == expected
    # per-stratum sizes: min(k, |stratum|)
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"en": 5, "fr": 5, "xx": 1, None: 2}
    # deterministic under a different physical layout
    again = stratified_sample(df.repartition(3), "lang", "doc_id",
                              k=5, salt_buckets=4)
    assert sorted(((r["lang"], r["sample_rank"], r["doc_id"])
                   for r in again.collect()), key=repr) == got


def test_stratified_sample_stage1_partitions_by_salt(spark):
    """Plan pin: the heavy first window must hash-partition by
    (stratum, salt) so one giant stratum splits across reducers; the
    second window then runs over the trimmed survivors only."""
    from deepchecks_spark.pipeline.webclean import stratified_sample

    df = spark.range(1000).select(F.col("id").alias("doc_id"),
                                  (F.col("id") % 3).cast("string").alias("lang"))
    plan = stratified_sample(df, "lang", "doc_id", k=3)._jdf \
        .queryExecution().executedPlan().toString()
    salted = [l for l in plan.splitlines()
              if "hashpartitioning" in l and "__salt" in l]
    assert salted, plan


def test_tfidf_terms_hand_computed(spark):
    """3 docs: 'b' appears everywhere (df=3, idf = ln(4/4)+1 = 1),
    'a' only in doc 0 (df=1, idf = ln(4/2)+1). Empty and NULL texts
    count toward N but emit no terms."""
    import math

    from deepchecks_spark.pipeline.textstats import tfidf_terms

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "b"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = {(r["doc_id"], r["term"]): r for r in
           tfidf_terms(df, "doc_id", "text", k=2).collect()}
    idf1 = math.log(6.0 / 2.0) + 1.0  # df=1, N=5
    idf3 = math.log(6.0 / 4.0) + 1.0  # df=3
    assert out[(0, "a")]["tf"] == 2 and out[(0, "a")]["doc_freq"] == 1
    assert abs(out[(0, "a")]["tfidf"] - round(2 * idf1, 6)) < 1e-9
    assert out[(0, "a")]["rank"] == 1  # 2*idf1 > 1*idf3
    assert abs(out[(0, "b")]["tfidf"] - round(idf3, 6)) < 1e-9
    assert (3, "") not in out and all(k[0] != 3 and k[0] != 4 for k in out)
    # ties (equal score) break by term asc: doc 1 has b,c both tf=1
    assert out[(1, "c")]["rank"] == 1  # idf(c)=idf1 > idf(b)=idf3
    assert out[(1, "b")]["rank"] == 2


def test_zipf_fit_exact_line(spark):
    """A corpus whose top terms follow counts = round(C / rank) exactly
    on a power law fits slope -1 with r2 ~ 1."""
    from deepchecks_spark.pipeline.textstats import zipf_fit

    # term t_r appears 2^(8-r) times: ln(n) = (8-r) ln 2, x = ln(r) —
    # not a perfect line in ln(rank); instead plant n = 64/r exactly
    rows = []
    for r, n in [(1, 60), (2, 30), (3, 20), (4, 15), (5, 12), (6, 10)]:
        rows.extend([(f"t{r:02d}",)] * n)
    df = spark.createDataFrame([(" ".join(t for (t,) in rows),)], "text string")
    out = zipf_fit(df, "text", top_n=6).first()
    assert out["n_terms_fit"] == 6
    assert abs(out["zipf_slope"] + 1.0) < 1e-6  # n = 60/rank exactly
    assert abs(out["r2"] - 1.0) < 1e-6


def test_ngram_overlap_hand_computed(spark):
    from deepchecks_spark.pipeline.decontam import ngram_overlap

    a = spark.createDataFrame(
        [("w x y z",), ("p q r",), ("",), (None,)], "text string")
    b = spark.createDataFrame(
        [("x y z w2",), ("p q r",)], "text string")
    # A grams: {w x y, x y z, p q r}; B grams: {x y z, y z w2, p q r}
    out = ngram_overlap(a, b, "text", ngram=3).first()
    assert (out["n_grams_a"], out["n_grams_b"], out["n_common"]) == (3, 3, 2)
    assert abs(out["jaccard"] - 0.5) < 1e-9
    assert abs(out["containment_a_in_b"] - round(2 / 3, 6)) < 1e-9
    assert abs(out["containment_b_in_a"] - round(2 / 3, 6)) < 1e-9


def test_char_entropy_hand_computed(spark):
    import math

    from deepchecks_spark.pipeline.textstats import char_entropy

    df = spark.createDataFrame(
        [(0, "aabb"), (1, "aaaa"), (2, "abcd"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in char_entropy(df, "text").collect()}
    assert abs(out[0]["char_entropy"] - round(math.log(2), 6)) < 1e-9
    assert out[0]["n_chars"] == 4 and out[0]["n_distinct_chars"] == 2
    assert out[1]["char_entropy"] == 0.0  # single symbol: zero entropy
    assert abs(out[2]["char_entropy"] - round(math.log(4), 6)) < 1e-9
    # empty and NULL texts score 0.0 with zero counts, never NULL/NaN
    for i in (3, 4):
        assert out[i]["char_entropy"] == 0.0
        assert out[i]["n_chars"] == 0 and out[i]["n_distinct_chars"] == 0


def test_pii_stats_hand_computed(spark):
    from deepchecks_spark.pipeline.webclean import pii_stats

    df = spark.createDataFrame(
        [("mail a@b.com and c@d.org",),       # 2 emails
         ("ip 10.0.0.7 ok",),                  # 1 ip
         ("call +1 555-123-4567 now",),        # 1 phone
         ("clean text",),
         (None,)],
        "text string")
    r = pii_stats(df, "text").first()
    assert r["n_docs"] == 5
    assert r["n_docs_with_pii"] == 3
    assert abs(r["pct_docs_with_pii"] - 0.6) < 1e-9
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (2, 1, 1)


def test_pii_stats_sequential_semantics(spark):
    # digits inside an email must be counted as EMAIL only — the
    # sequential-replacement convention pii_redaction documents
    from deepchecks_spark.pipeline.webclean import pii_stats

    df = spark.createDataFrame([("reach me at 555-123-4567x@mail.com",)],
                               "text string")
    r = pii_stats(df, "text").first()
    assert (r["n_email"], r["n_phone"]) == (1, 0)


def test_cluster_size_profile_hand_computed(spark):
    from deepchecks_spark.pipeline.dedup import cluster_size_profile

    docs = spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    out = {r["cluster_size"]: r for r in
           cluster_size_profile(docs, pairs, "id").collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_clusters"], out[1]["n_docs"], out[1]["n_removable"]) == (3, 3, 0)
    assert (out[2]["n_clusters"], out[2]["n_docs"], out[2]["n_removable"]) == (1, 2, 1)
    assert (out[3]["n_clusters"], out[3]["n_docs"], out[3]["n_removable"]) == (1, 3, 2)
    # sum(n_docs) == corpus rows; pct sums to 1
    assert sum(r["n_docs"] for r in out.values()) == 8
    assert abs(sum(r["pct_of_corpus"] for r in out.values()) - 1.0) < 1e-6


def test_temporal_drift_hand_computed(spark):
    """Two days, 2 bins over [0,10]: day 1 (baseline) splits 50/50,
    day 2 is 75/25 -> psi = 0.25*ln(2/3)*(-1) + 0.25*ln(2) by hand;
    day 1 vs itself is 0."""
    import math

    from deepchecks_spark.drift.spark import temporal_drift

    rows = [("2024-01-01 05:00:00", 0.0), ("2024-01-01 06:00:00", 0.0),
            ("2024-01-01 07:00:00", 10.0), ("2024-01-01 08:00:00", 10.0),
            ("2024-01-02 05:00:00", 0.0), ("2024-01-02 06:00:00", 0.0),
            ("2024-01-02 07:00:00", 0.0), ("2024-01-02 08:00:00", 10.0)]
    df = spark.createDataFrame(rows, "ts string, value double") \
        .selectExpr("cast(ts as timestamp) ts", "value")
    out = {r["window_start"]: r for r in
           temporal_drift(df, "ts", "value", "day", n_bins=2).collect()}
    assert out["2024-01-01 00:00:00"]["psi"] == 0.0
    assert out["2024-01-01 00:00:00"]["n_rows"] == 4
    expected = (0.5 - 0.75) * math.log(0.5 / 0.75) + (0.5 - 0.25) * math.log(0.5 / 0.25)
    assert abs(out["2024-01-02 00:00:00"]["psi"] - round(expected, 6)) < 1e-9


def test_temporal_drift_floor_on_empty_bin(spark):
    """A bin with zero mass takes the 0.01 floor on that side, never
    a log-of-zero NaN."""
    import math

    from deepchecks_spark.drift.spark import temporal_drift

    rows = [("2024-01-01 05:00:00", 0.0), ("2024-01-01 06:00:00", 10.0),
            ("2024-01-02 05:00:00", 0.0), ("2024-01-02 06:00:00", 0.0)]
    df = spark.createDataFrame(rows, "ts string, value double") \
        .selectExpr("cast(ts as timestamp) ts", "value")
    out = {r["window_start"]: r["psi"] for r in
           temporal_drift(df, "ts", "value", "day", n_bins=2).collect()}
    # day2: a=(1.0, floor .01) vs e=(.5,.5)
    expected = (0.5 - 1.0) * math.log(0.5 / 1.0) + (0.5 - 0.01) * math.log(0.5 / 0.01)
    assert abs(out["2024-01-02 00:00:00"] - round(expected, 6)) < 1e-9
    assert not math.isnan(out["2024-01-02 00:00:00"])


def test_contamination_report_hand_computed(spark):
    from deepchecks_spark.pipeline.decontam import contamination_report

    corpus = spark.createDataFrame(
        [(0, "a b c d e f"),        # grams: 'a b c d e', 'b c d e f'
         (1, "a b c d e"),          # gram:  'a b c d e'
         (2, "p q r s t"),          # gram:  'p q r s t'
         (3, "x y")],               # sub-gram: none
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [("A", "a b c d e"),        # hits docs 0 and 1
         ("B", "p q r s t u")],     # grams 'p q r s t','q r s t u' -> hits doc 2
        "bench_name string, text string")
    out = {r["benchmark"]: r for r in contamination_report(
        corpus, bench, "doc_id", "text", "bench_name", ngram=5).collect()}
    assert (out["A"]["n_bench_grams"], out["A"]["n_docs_contaminated"]) == (1, 2)
    assert (out["B"]["n_bench_grams"], out["B"]["n_docs_contaminated"]) == (2, 1)
    assert abs(out["A"]["pct_docs_contaminated"] - 0.5) < 1e-9


def test_contamination_report_gate_raises(spark):
    import pytest as _pytest

    from deepchecks_spark.pipeline.decontam import (
        BenchmarkTooLargeError, contamination_report)

    corpus = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [("A", "a b c d e f g h i j")], "bench_name string, text string")
    with _pytest.raises(BenchmarkTooLargeError):
        contamination_report(corpus, bench, "doc_id", "text", "bench_name",
                             ngram=5, max_benchmark_grams=3).collect()


def test_unigram_js_divergence_hand_computed(spark):
    """corpus A = 'a a b' (P: a=2/3,b=1/3), B = 'a c' (Q: a=1/2,c=1/2):
    JSD = .5[(2/3)ln(8/7)+(1/3)ln2] + .5[(1/2)ln(6/7)+(1/2)ln2] by hand;
    absent types contribute only the present side's term."""
    import math

    from deepchecks_spark.pipeline.textstats import unigram_js_divergence

    a = spark.createDataFrame([("a a b",)], "text string")
    b = spark.createDataFrame([("a c",)], "text string")
    r = unigram_js_divergence(a, b, "text").collect()[0]
    assert (r["n_tokens_a"], r["n_tokens_b"]) == (3, 2)
    assert (r["n_types_a"], r["n_types_b"], r["n_types_union"]) == (2, 2, 3)
    expected = 0.5 * ((2 / 3) * math.log((2 / 3) / (7 / 12))
                      + (1 / 3) * math.log((1 / 3) / (1 / 6))) \
        + 0.5 * ((1 / 2) * math.log((1 / 2) / (7 / 12))
                 + (1 / 2) * math.log((1 / 2) / (1 / 4)))
    assert abs(r["js_divergence"] - round(expected, 6)) < 1e-9
    assert abs(r["js_normalized"] - round(expected / math.log(2), 6)) < 1e-9


def test_unigram_js_divergence_identical_is_zero(spark):
    from deepchecks_spark.pipeline.textstats import unigram_js_divergence

    a = spark.createDataFrame([("x y z",), ("", ), ("x",)], "text string")
    r = unigram_js_divergence(a, a, "text").collect()[0]
    assert r["js_divergence"] == 0.0 and r["js_normalized"] == 0.0
    assert r["n_tokens_a"] == r["n_tokens_b"] == 4  # blank doc contributes 0


def test_embedding_drift_numpy_parity(spark):
    """The one-agg Spark estimate equals the straight numpy RFF MMD^2
    and centroid cosine on the same seeded projections."""
    import numpy as np

    from deepchecks_spark.drift.embedding import embedding_drift, rff_params

    rng = np.random.default_rng(7)
    A = rng.normal(size=(40, 8))
    B = rng.normal(size=(40, 8)) + 0.5
    ref = spark.createDataFrame([(r.tolist(),) for r in A], "embedding array<double>")
    cur = spark.createDataFrame([(r.tolist(),) for r in B], "embedding array<double>")
    out = embedding_drift(ref, cur, "embedding", dim=8, n_features=32).collect()[0]
    w, b = rff_params(8, 32, 1.0 / 8)
    W, bb = np.array(w), np.array(b)
    za = np.cos(A @ W.T + bb).mean(axis=0)
    zb = np.cos(B @ W.T + bb).mean(axis=0)
    mmd2 = (2.0 / 32) * ((za - zb) ** 2).sum()
    ca, cb = A.mean(axis=0), B.mean(axis=0)
    cos = ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb))
    assert (out["n_ref"], out["n_cur"]) == (40, 40)
    assert abs(out["mmd2"] - round(float(mmd2), 6)) < 2e-6
    assert abs(out["centroid_cos"] - round(float(cos), 6)) < 2e-6


def test_embedding_drift_self_is_null_drift(spark):
    from deepchecks_spark.drift.embedding import embedding_drift

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_drift(emb, emb, "embedding", dim=64, n_features=16).collect()[0]
    assert out["mmd2"] == 0.0 and out["centroid_cos"] == 1.0


def test_embedding_drift_excludes_null_and_wrong_dim(spark):
    from deepchecks_spark.drift.embedding import embedding_drift

    ref = spark.createDataFrame(
        [([1.0, 0.0],), (None,), ([1.0, 0.0, 5.0],)], "embedding array<double>")
    cur = spark.createDataFrame([([1.0, 0.0],)], "embedding array<double>")
    out = embedding_drift(ref, cur, "embedding", dim=2, n_features=8).collect()[0]
    assert (out["n_ref"], out["n_cur"]) == (1, 1)
    assert out["mmd2"] == 0.0 and out["centroid_cos"] == 1.0


def test_embedding_drift_timeseries_numpy_parity(spark):
    """Three windows of seeded vectors: baseline window reports 0.0,
    each later window equals the straight numpy RFF MMD^2 vs window 0."""
    import numpy as np

    from deepchecks_spark.drift.embedding import (
        embedding_drift_timeseries, rff_params)

    rng = np.random.default_rng(11)
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    mats = [rng.normal(size=(30, 4)) + i for i in range(3)]
    rows = [(f"{d} {i:02d}:00:00", v.tolist())
            for d, m in zip(days, mats) for i, v in enumerate(m[:24])]
    df = spark.createDataFrame(rows, "ts string, embedding array<double>") \
        .selectExpr("cast(ts as timestamp) ts", "embedding")
    out = {r["window_start"]: r for r in embedding_drift_timeseries(
        df, "ts", "embedding", dim=4, n_features=32).collect()}
    assert out["2024-01-01 00:00:00"]["mmd2"] == 0.0
    w, b = rff_params(4, 32, 1.0 / 4)
    W, bb = np.array(w), np.array(b)
    z = [np.cos(m[:24] @ W.T + bb).mean(axis=0) for m in mats]
    for i in (1, 2):
        expected = (2.0 / 32) * ((z[i] - z[0]) ** 2).sum()
        got = out[f"{days[i]} 00:00:00"]["mmd2"]
        assert abs(got - round(float(expected), 6)) < 2e-6
        assert out[f"{days[i]} 00:00:00"]["n_rows"] == 24


def test_extract_domain_and_spam_signals_hand_computed(spark):
    from deepchecks_spark.pipeline.webclean import extract_domain, url_spam_scores

    df = spark.createDataFrame(
        [
            (1, "http://user:pw@Sub1.Sub2.Example.COM:8080/a/b/c?x=1&y=2&z=3"),
            (2, "https://ex4mple99.com"),
            (3, "not a url"),
        ],
        "id long, url string",
    )
    doms = {r["id"]: r["domain"] for r in extract_domain(df, "url").collect()}
    # userinfo and port stripped, host lower-cased; non-URL -> empty
    assert doms == {1: "sub1.sub2.example.com", 2: "ex4mple99.com", 3: ""}

    rows = {r["id"]: r for r in url_spam_scores(df, "url").collect()}
    r1 = rows[1]
    assert r1["path_depth"] == 3          # /a/b/c
    assert r1["n_params"] == 3            # x, y, z
    assert r1["n_subdomains"] == 2        # sub1, sub2 before example.com
    assert r1["host_digit_ratio"] == pytest.approx(2 / 21)  # '1','2' of 21 chars
    r2 = rows[2]
    assert (r2["path_depth"], r2["n_params"], r2["n_subdomains"]) == (0, 0, 0)
    assert r2["host_digit_ratio"] == pytest.approx(3 / 13)  # 4,9,9 of ex4mple99.com
    r3 = rows[3]
    # no scheme -> empty host/path/query: every signal bottoms out
    assert (r3["path_depth"], r3["n_params"], r3["n_subdomains"],
            r3["host_digit_ratio"]) == (0, 0, 0, 0.0)
    expected_1 = (0.25 * min(r1["url_len"] / 200.0, 1.0) + 0.25 * (2 / 21)
                  + 0.20 * min(3 / 5.0, 1.0) + 0.15 * min(3 / 8.0, 1.0)
                  + 0.15 * min(2 / 4.0, 1.0))
    assert r1["spam_score"] == pytest.approx(expected_1)
    assert bool(r1["is_spam"]) == (expected_1 >= 0.5)


def test_domain_profile_hand_computed(spark):
    from deepchecks_spark.pipeline.webclean import domain_profile

    df = spark.createDataFrame(
        [
            ("http://A.com/1", "x y"),
            ("http://a.com:80/2", "x y"),      # duplicate text of doc 1
            ("http://a.com/3", "z"),
            ("http://b.com/1", "only one doc"),
        ],
        "url string, text string",
    )
    rows = {r["domain"]: r for r in domain_profile(df, "url", "text").collect()}
    a = rows["a.com"]
    assert a["n_docs"] == 3 and a["n_unique_texts"] == 2
    assert a["dup_ratio"] == pytest.approx(1 / 3)
    assert a["n_tokens"] == 5               # 2 + 2 + 1
    assert a["avg_chars"] == pytest.approx((3 + 3 + 1) / 3)
    b = rows["b.com"]
    assert (b["n_docs"], b["n_unique_texts"], b["dup_ratio"]) == (1, 1, 0.0)
    assert b["n_tokens"] == 3


def test_boilerplate_lines_report_hand_computed(spark):
    from deepchecks_spark.pipeline.webclean import boilerplate_lines

    df = spark.createDataFrame(
        [
            (1, "shared\nshared\nunique one\n  \n"),  # in-doc repeat counts ONCE
            (2, " shared \nother"),                   # trimmed form matches
            (3, "shared\nother"),
            (4, ""),                                  # blank doc still in the total
        ],
        "id long, text string",
    )
    out = boilerplate_lines(df, "text", min_docs=2, k=10).collect()
    assert [(r["line"], r["n_docs"]) for r in out] == [("shared", 3), ("other", 2)]
    assert out[0]["frac_docs"] == pytest.approx(3 / 4)
    # k cuts the report deterministically at the (n_docs desc, line) order
    top1 = boilerplate_lines(df, "text", min_docs=2, k=1).collect()
    assert [(r["line"], r["n_docs"]) for r in top1] == [("shared", 3)]


def test_containment_adjacent_hand_computed(spark):
    from deepchecks_spark.pipeline.dedup import containment_adjacent

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d"), (3, "x y")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id_a"], r["doc_id_b"]): r
            for r in containment_adjacent(df, "doc_id", "text").collect()}
    # doc 1 ("a b") is fully contained in doc 2 ("a b c d")
    r12 = rows[(1, 2)]
    assert r12["containment_a_in_b"] == pytest.approx(1.0)
    assert r12["containment_b_in_a"] == pytest.approx(0.5)
    # disjoint pair
    r23 = rows[(2, 3)]
    assert r23["containment_a_in_b"] == 0.0 and r23["containment_b_in_a"] == 0.0


def test_crawl_churn_hand_computed(spark):
    from deepchecks_spark.pipeline.webclean import crawl_churn

    old = spark.createDataFrame(
        [("u1",), ("u2",), ("u3",), ("u3",)], "url string")  # dup collapses
    new = spark.createDataFrame(
        [("u2",), ("u3",), ("u4",), ("u5",)], "url string")
    r = crawl_churn(old, new, "url").collect()[0]
    assert (r["n_old"], r["n_new"], r["n_retained"]) == (3, 4, 2)
    assert (r["n_added"], r["n_removed"]) == (2, 1)
    assert r["retention_rate"] == pytest.approx(2 / 3)
    assert r["growth_rate"] == pytest.approx(2 / 3)


def test_crawl_churn_empty_old_is_null_rates(spark):
    from deepchecks_spark.pipeline.webclean import crawl_churn

    old = spark.createDataFrame([], "url string")
    new = spark.createDataFrame([("u1",)], "url string")
    r = crawl_churn(old, new, "url").collect()[0]
    assert (r["n_old"], r["n_new"], r["n_added"]) == (0, 1, 1)
    assert r["retention_rate"] is None and r["growth_rate"] is None


def test_domain_blocklist_literal_and_dataframe_paths_agree(spark):
    from deepchecks_spark.pipeline.webclean import filter_by_domain_blocklist

    df = spark.createDataFrame(
        [
            (1, "http://bad.com/x"),
            (2, "http://ads.bad.com/x"),        # subdomain of blocked
            (3, "http://notbad.com/x"),         # suffix must NOT over-match
            (4, "http://good.com/x"),
            (5, "http://deep.sub.bad.com/x"),
        ],
        "id long, url string",
    )
    blocked = ["bad.com"]
    lit_ids = sorted(r["id"] for r in
                     filter_by_domain_blocklist(df, "url", blocked).collect())
    bl_df = spark.createDataFrame([(b,) for b in blocked], "domain string")
    df_ids = sorted(r["id"] for r in
                    filter_by_domain_blocklist(df, "url", bl_df).collect())
    assert lit_ids == df_ids == [3, 4]
    # the DataFrame path preserves the original columns
    out = filter_by_domain_blocklist(df, "url", bl_df)
    assert out.columns == ["id", "url"]


def test_normalize_text_nfc_hand_computed(spark):
    import unicodedata

    from deepchecks_spark.pipeline.webclean import normalize_text_nfc

    decomposed = "café Å"
    df = spark.createDataFrame(
        [(1, decomposed), (2, "plain ascii"), (3, None)],
        "id long, text string",
    )
    rows = {r["id"]: r for r in normalize_text_nfc(df, "text").collect()}
    assert rows[1]["nfc_text"] == unicodedata.normalize("NFC", decomposed)
    assert rows[1]["nfc_text"] != decomposed and bool(rows[1]["changed"])
    assert rows[2]["nfc_text"] == "plain ascii" and not rows[2]["changed"]
    assert rows[3]["nfc_text"] is None and rows[3]["changed"] is None


def test_extract_page_metadata_hand_computed(spark):
    from deepchecks_spark.pipeline.webclean import extract_page_metadata

    rows = [
        # uppercase tags, whitespace-padded title, both meta forms
        (1, '<html><head><TITLE> Hi &amp; bye </title>'
            '<meta name="description" content="a desc">'
            '<meta name="robots" content="NOINDEX, nofollow">'
            '<link rel="canonical" href="https://x.example/c"></head>'
            '<body><a href="/1">x</a><A HREF="/2">y</a></body></html>'),
        # reversed attribute order for meta/link
        (2, '<meta content="rev desc" name="description">'
            '<meta content="noindex" name="robots">'
            '<link href="https://y.example/c" rel="canonical">'),
        # first-match-wins on duplicate tags
        (3, '<title>first</title><title>second</title>'),
        (4, '<p>no metadata at all</p>'),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, html string")
    got = {r["doc_id"]: r for r in
           extract_page_metadata(df, "html", keep_cols=["doc_id"]).collect()}
    # entities stay raw (documented); title trimmed
    assert got[1]["title"] == "Hi &amp; bye"
    assert got[1]["meta_description"] == "a desc"
    assert got[1]["robots_noindex"] is True   # case-insensitive, in a list
    assert got[1]["canonical_url"] == "https://x.example/c"
    assert got[1]["n_anchors"] == 2           # <a> and <A> both counted
    assert got[2]["meta_description"] == "rev desc"
    assert got[2]["robots_noindex"] is True
    assert got[2]["canonical_url"] == "https://y.example/c"
    assert got[3]["title"] == "first"
    assert got[4]["title"] is None and got[4]["meta_description"] is None
    assert got[4]["robots_noindex"] is False and got[4]["n_anchors"] == 0
    assert got[5]["title"] is None and got[5]["robots_noindex"] is False


def test_connected_components_union_find_matches_iterative(spark):
    from deepchecks_spark.pipeline.dedup import connected_components

    # pseudo-random pair soup: chains, bridges and singleton pairs
    pairs = [(i % 37, (i * 17 + 5) % 41) for i in range(120)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    fast = {(r["id"], r["component"])
            for r in connected_components(df).collect()}
    slow = {(r["id"], r["component"])
            for r in connected_components(df, small_graph_edges=0).collect()}
    assert fast == slow and len(fast) > 0

    # string ids take the same fast path (the probe is type-agnostic)
    sdf = df.selectExpr("'d' || CAST(id_a AS STRING) AS id_a",
                        "'d' || CAST(id_b AS STRING) AS id_b")
    got = {(r["id"], r["component"])
           for r in connected_components(sdf).collect()}
    # lexicographic min can differ from numeric min: expected comes from
    # the iterative path on the SAME string frame, not from `slow`
    want = {(r["id"], r["component"])
            for r in connected_components(sdf, small_graph_edges=0).collect()}
    assert got == want


def test_pq_topk_exact_when_codebook_contains_corpus(spark):
    """PQ with m=1 and a codebook holding every distinct corpus vector
    has zero quantization error, so the ADC ranking must equal the
    exact L2 top-k (ties -> neighbor_id asc)."""
    from deepchecks_spark.pipeline.similarity import pq_topk

    rng = np.random.default_rng(11)
    protos = rng.integers(-50, 50, size=(12, 8)).astype(float)
    vecs = protos[[i % 12 for i in range(60)]]
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    queries = df.filter(F.col("id") < 5)
    got = set(map(tuple, pq_topk(queries, df, dim=8, k=4, m=1, ksub=12,
                                 codebooks=protos[None].transpose(1, 0, 2)
                                 .reshape(1, 12, 8))
                  .select("query_id", "neighbor_id", "rank").collect()))
    want = set()
    for qid in range(5):
        d = ((vecs - vecs[qid]) ** 2).sum(axis=1)
        order = sorted((float(d[n]), n) for n in range(60) if n != qid)
        want |= {(qid, n, r + 1) for r, (_, n) in enumerate(order[:4])}
    assert got == want


def test_pq_encode_arrow_path_matches_expression(spark):
    """The pandas-UDF encoder (large-codebook path) and the codegen'd
    argmin expression must agree code-for-code, including ties and
    null vectors."""
    from deepchecks_spark.pipeline import similarity as sim

    rng = np.random.default_rng(5)
    books = rng.standard_normal((2, 4, 3))
    books[0, 2] = books[0, 1]  # duplicate codeword -> tie -> lowest code
    vecs = rng.standard_normal((50, 6))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    expr = {r["id"]: r["c"] for r in df.select(
        "id", sim.pq_encode_col("embedding", books).alias("c")).collect()}
    old = sim._PQ_EXPR_MAX_LITERALS
    sim._PQ_EXPR_MAX_LITERALS = 0
    try:
        arrow = {r["id"]: (None if r["c"] is None else list(r["c"]))
                 for r in df.select(
                     "id", sim.pq_encode_col("embedding", books).alias("c"))
                 .collect()}
    finally:
        sim._PQ_EXPR_MAX_LITERALS = old
    assert {k: (None if v is None else list(v)) for k, v in expr.items()} == arrow
    assert arrow[99] is None
    # the tied codeword pair never emits code 2 (first-minimum tie-break)
    assert all(v[0] != 2 for v in arrow.values() if v is not None)


def test_pq_topk_trained_recall_on_clustered_data(spark):
    """Trained codebooks on well-separated clusters: quantization error
    is small vs cluster separation, so ADC recovers the exact L2 top-3
    in full."""
    from deepchecks_spark.pipeline.similarity import pq_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = df.selectExpr(
        "vec_id",
        "transform(sequence(0, 15), d -> CAST((CASE WHEN d = CAST(vec_id % 10 AS INT) "
        "THEN 40 ELSE 2 END) + ((vec_id * 7 + d * 13) % 5) - 2 AS DOUBLE)) AS embedding",
    )
    rows = {r["vec_id"]: np.asarray(r["embedding"])
            for r in df.collect()}
    queries = df.filter(F.col("vec_id") < 10)
    got = set(map(tuple, pq_topk(queries, df, dim=16, k=3, m=4, ksub=10,
                                 id_col="vec_id", sample_size=1000)
                  .select("query_id", "neighbor_id").collect()))
    want = set()
    for qid in range(10):
        order = sorted((float(((v - rows[qid]) ** 2).sum()), n)
                       for n, v in rows.items() if n != qid)
        want |= {(qid, n) for _, n in order[:3]}
    assert got == want


def test_train_pq_codebooks_deterministic(spark):
    from deepchecks_spark.pipeline.similarity import train_pq_codebooks

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = train_pq_codebooks(df, dim=64, m=4, ksub=8, id_col="vec_id",
                           vec_col="embedding", sample_size=500)
    b = train_pq_codebooks(df, dim=64, m=4, ksub=8, id_col="vec_id",
                           vec_col="embedding", sample_size=500)
    assert a.shape == (4, 8, 16)
    assert np.array_equal(a, b)


def test_ivfadc_full_probe_matches_pq(spark):
    """With nprobe = nlist the IVF pruning is off, so IVFADC must equal
    pq_topk exactly (same codebooks -> same ADC ranking)."""
    from deepchecks_spark.pipeline.similarity import (
        deterministic_int_centroids,
        deterministic_int_codebooks,
        ivfadc_topk,
        pq_topk,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = df.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) AS embedding")
    queries = df.filter(F.col("vec_id") < 5)
    books = deterministic_int_codebooks(m=4, ksub=8, dsub=16)
    cents = deterministic_int_centroids(nlist=4, dim=64)
    want = set(map(tuple, pq_topk(queries, df, dim=64, k=3, m=4, ksub=8,
                                  id_col="vec_id", codebooks=books)
                   .select("query_id", "neighbor_id", "rank").collect()))
    got = set(map(tuple, ivfadc_topk(queries, df, dim=64, k=3, nlist=4,
                                     nprobe=4, m=4, ksub=8, id_col="vec_id",
                                     centroids=cents, codebooks=books)
                  .select("query_id", "neighbor_id", "rank").collect()))
    assert got == want and len(got) == 15


def test_ivfadc_trained_recall_on_clustered_data(spark):
    """Trained quantizer + codebooks on well-separated clusters: a small
    nprobe plus compressed scoring still recovers the exact L2 top-3."""
    from deepchecks_spark.pipeline.similarity import ivfadc_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = df.selectExpr(
        "vec_id",
        "transform(sequence(0, 15), d -> CAST((CASE WHEN d = CAST(vec_id % 10 AS INT) "
        "THEN 40 ELSE 2 END) + ((vec_id * 7 + d * 13) % 5) - 2 AS DOUBLE)) AS embedding",
    )
    rows = {r["vec_id"]: np.asarray(r["embedding"]) for r in df.collect()}
    queries = df.filter(F.col("vec_id") < 10)
    got = set(map(tuple, ivfadc_topk(queries, df, dim=16, k=3, nlist=10,
                                     nprobe=2, m=4, ksub=10, id_col="vec_id",
                                     sample_size=1000)
                  .select("query_id", "neighbor_id").collect()))
    want = set()
    for qid in range(10):
        order = sorted((float(((v - rows[qid]) ** 2).sum()), n)
                       for n, v in rows.items() if n != qid)
        want |= {(qid, n) for _, n in order[:3]}
    assert got == want


def test_ivfadc_residual_with_zero_centroid_matches_pq(spark):
    """With a single all-zero centroid the residual IS the raw vector,
    so by_residual=True must reproduce pq_topk exactly (same explicit
    codebooks, pruning off at nlist=1)."""
    from deepchecks_spark.pipeline.similarity import (
        deterministic_int_codebooks,
        ivfadc_topk,
        pq_topk,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = df.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE)) AS embedding")
    queries = df.filter(F.col("vec_id") < 5)
    books = deterministic_int_codebooks(m=4, ksub=8, dsub=16)
    want = set(map(tuple, pq_topk(queries, df, dim=64, k=3, m=4, ksub=8,
                                  id_col="vec_id", codebooks=books)
                   .select("query_id", "neighbor_id", "rank").collect()))
    got = set(map(tuple, ivfadc_topk(queries, df, dim=64, k=3, nlist=1,
                                     nprobe=1, m=4, ksub=8, id_col="vec_id",
                                     centroids=[[0] * 64], codebooks=books,
                                     by_residual=True)
                  .select("query_id", "neighbor_id", "rank").collect()))
    assert got == want and len(got) == 15


def test_ivfadc_residual_trained_recall_on_clustered_data(spark):
    """Residual encoding (the FAISS default) on well-separated clusters:
    codebooks fitted on (vector - centroid) residuals still recover the
    exact L2 top-3 at a small nprobe."""
    from deepchecks_spark.pipeline.similarity import ivfadc_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = df.selectExpr(
        "vec_id",
        "transform(sequence(0, 15), d -> CAST((CASE WHEN d = CAST(vec_id % 10 AS INT) "
        "THEN 40 ELSE 2 END) + ((vec_id * 7 + d * 13) % 5) - 2 AS DOUBLE)) AS embedding",
    )
    rows = {r["vec_id"]: np.asarray(r["embedding"]) for r in df.collect()}
    queries = df.filter(F.col("vec_id") < 10)
    got = set(map(tuple, ivfadc_topk(queries, df, dim=16, k=3, nlist=10,
                                     nprobe=2, m=4, ksub=10, id_col="vec_id",
                                     sample_size=1000, by_residual=True)
                  .select("query_id", "neighbor_id").collect()))
    want = set()
    for qid in range(10):
        order = sorted((float(((v - rows[qid]) ** 2).sum()), n)
                       for n, v in rows.items() if n != qid)
        want |= {(qid, n) for _, n in order[:3]}
    assert got == want


def test_pq_topk_null_query_vectors_are_dropped(spark):
    """A NULL query vector must be dropped, not ranked: its adist would
    be NULL and the ascending rank window sorts NULLS FIRST."""
    from deepchecks_spark.pipeline.similarity import (
        deterministic_int_codebooks,
        pq_topk,
    )

    rows = [(i, [float((i * 7 + d) % 11) for d in range(8)]) for i in range(20)]
    rows.append((100, None))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    books = deterministic_int_codebooks(m=2, ksub=4, dsub=4)
    out = pq_topk(df.filter(F.col("id").isin(0, 100)), df, dim=8, k=3,
                  m=2, ksub=4, codebooks=books).collect()
    assert {r["query_id"] for r in out} == {0}
    assert all(r["adist"] is not None for r in out)


def test_incremental_minhash_flags_exact_and_near_corpus_dups(spark):
    from deepchecks_spark.pipeline.dedup import (
        incremental_minhash_candidates,
        incremental_minhash_dedup,
        minhash_signatures,
    )

    base = ("the quick brown fox jumps over the lazy dog and then runs far away "
            "into the deep dark forest to find some food for the long cold winter")
    corpus = spark.createDataFrame(
        [(1, base),
         (2, "completely different corpus text about spark distributed plans"),
         (3, "planted duplicate corpus segment alpha beta gamma delta epsilon")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "planted duplicate corpus segment alpha beta gamma delta epsilon"),
         (11, base.replace("lazy", "sleepy")),
         (12, "a genuinely fresh document with no counterpart in the index at all")],
        "doc_id long, text string")
    sigs = minhash_signatures(corpus, "doc_id", "text")
    cand = incremental_minhash_candidates(batch, sigs, "doc_id", "text",
                                          threshold=0.5)
    by_batch = {r["batch_id"]: r for r in cand.collect()}
    assert by_batch[10]["corpus_id"] == 3
    assert by_batch[10]["est_jaccard"] == 1.0   # identical text → identical signature
    assert by_batch[11]["corpus_id"] == 1
    assert 0.5 <= by_batch[11]["est_jaccard"] < 1.0
    assert 12 not in by_batch
    surv = incremental_minhash_dedup(batch, sigs, "doc_id", "text", threshold=0.5)
    assert sorted(r["doc_id"] for r in surv.collect()) == [12]


def test_incremental_minhash_broadcast_path_parity_and_plan(spark):
    """broadcast_batch=True must return the identical matches, and its
    plan must never shuffle-join the corpus side: all three joins
    (bucket collision, candidate probe, batch-signature attach) are
    broadcast hash joins — the corpus signature table is only scanned."""
    from deepchecks_spark.pipeline.dedup import (
        incremental_minhash_candidates,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(50)
    sigs = minhash_signatures(corpus, "doc_id", "text").persist()
    try:
        default = incremental_minhash_candidates(
            batch, sigs, "doc_id", "text", threshold=0.3)
        bcast = incremental_minhash_candidates(
            batch, sigs, "doc_id", "text", threshold=0.3, broadcast_batch=True)
        assert (sorted(map(tuple, default.collect()))
                == sorted(map(tuple, bcast.collect())))
        plan = bcast._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 3
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    finally:
        sigs.unpersist()


def test_incremental_minhash_rerun_after_append_is_idempotent(spark):
    """Appending the survivors' signatures to the index then re-running
    the same batch must flag every row (nothing survives twice)."""
    from deepchecks_spark.pipeline.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [(1, "some indexed corpus document with enough words to shingle properly")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "a genuinely fresh document with no counterpart in the index at all"),
         (11, "another fresh document that also has no match inside the index yet")],
        "doc_id long, text string")
    sigs = minhash_signatures(corpus, "doc_id", "text")
    surv = incremental_minhash_dedup(batch, sigs, "doc_id", "text", threshold=0.7)
    assert surv.count() == 2
    grown = sigs.unionByName(minhash_signatures(surv, "doc_id", "text"))
    again = incremental_minhash_dedup(batch, grown, "doc_id", "text", threshold=0.7)
    assert again.count() == 0


def test_script_profile_counts_and_main_script(spark):
    from deepchecks_spark.pipeline.textstats import script_profile

    df = spark.createDataFrame(
        [(1, "plain english text"),
         (2, "привет мир это кириллица"),
         (3, "数据流处理引擎测试"),
         (4, "pаypal sеcure login"),        # 2 Cyrillic homoglyphs in latin text
         (5, ""),
         (6, None),
         (7, "mixed latin と かな text ここ")],
        "id long, text string")
    out = {r["id"]: r for r in script_profile(df, "text").collect()}
    assert out[1]["main_script"] == "latin" and out[1]["n_latin"] == 16
    assert out[2]["main_script"] == "cyrillic" and out[2]["n_latin"] == 0
    assert out[3]["main_script"] == "cjk" and out[3]["n_cjk"] == 9
    assert out[4]["main_script"] == "latin" and out[4]["n_cyrillic"] == 2
    assert out[4]["mixed_script"] and out[4]["n_scripts"] == 2
    for i in (5, 6):
        assert out[i]["main_script"] == "none" and out[i]["n_letters"] == 0
        assert not out[i]["mixed_script"]
    assert out[7]["mixed_script"] and out[7]["n_kana"] == 5
    assert not out[1]["mixed_script"] and not out[2]["mixed_script"]


def test_script_profile_minor_threshold_ignores_trace_scripts(spark):
    """A script below minor_threshold of the letters must not count
    toward n_scripts: 2 Cyrillic chars inside 200 Latin letters are
    noise at the default 5%, signal at threshold 0."""
    from deepchecks_spark.pipeline.textstats import script_profile

    text = ("a" * 200) + "ве"
    df = spark.createDataFrame([(1, text)], "id long, text string")
    r = script_profile(df, "text").collect()[0]
    assert r["n_latin"] == 200 and r["n_cyrillic"] == 2
    assert r["n_scripts"] == 1 and not r["mixed_script"]
    r0 = script_profile(df, "text", minor_threshold=0.0).collect()[0]
    assert r0["n_scripts"] == 2 and r0["mixed_script"]


def test_script_profile_is_shuffle_free(spark):
    from deepchecks_spark.pipeline.textstats import script_profile

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (script_profile(df, "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_bpe_merges_match_sennrich_fixture(spark):
    """The canonical fixture from Sennrich et al. 2016: vocab
    {low:5, lower:2, newest:6, widest:3} trains merges
    (e,s) (es,t) (est,</w>) (l,o) (lo,w) in that order."""
    from deepchecks_spark.pipeline.bpe import learn_bpe

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "id long, text string")
    model = learn_bpe(df, "text", num_merges=5)
    assert model["merges"] == [("e", "s"), ("es", "t"), ("est", "</w>"),
                               ("l", "o"), ("lo", "w")]
    assert model["vocab"][:2] == ["e", "</w>"]          # freq-desc chars first
    assert model["vocab"][-5:] == ["es", "est", "est</w>", "lo", "low"]


def test_bpe_incremental_trainer_handles_repeated_pairs(spark):
    """A pair occurring twice in one word ('aaaa' → (a,a)×3) exercises
    the Counter-delta bookkeeping; the trainer must not corrupt its
    index maps and must merge greedily left-to-right."""
    from deepchecks_spark.pipeline.bpe import _encode_word, _train_merges

    merges = _train_merges([("aaaa", 3), ("ab", 1)], 3)
    assert merges[0] == ("a", "a")
    ranks = {p: i for i, p in enumerate(merges)}
    assert "".join(_encode_word("aaaa", ranks)).replace("</w>", "") == "aaaa"


def test_apply_bpe_roundtrip_and_null_safety(spark):
    from deepchecks_spark.pipeline.bpe import apply_bpe, learn_bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    model = learn_bpe(docs, "text", num_merges=200)
    out = apply_bpe(docs, "text", model["merges"]).select("doc_id", "text", "bpe_tokens")
    for r in out.collect():
        joined = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
        assert joined == " ".join(r["text"].strip().split())
    nulls = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert apply_bpe(nulls, "text", model["merges"]).collect()[0]["bpe_tokens"] == []


def test_word_frequencies_plan_has_mapside_partial_agg(spark):
    """The one corpus-volume pass of BPE training must partial-aggregate
    before its single Exchange and cap via TakeOrderedAndProject —
    never a global sort of the type table."""
    from deepchecks_spark.pipeline.bpe import word_frequencies

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (word_frequencies(df, "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    before_exchange = plan.split("Exchange hashpartitioning")[1]
    assert "partial_count" in before_exchange or "partial" in before_exchange
    assert "TakeOrderedAndProject" in plan


def test_filter_funnel_monotone_and_consistent_with_keep(spark):
    from deepchecks_spark.pipeline.textstats import (
        filter_funnel,
        gopher_quality_rules,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r["stage"]: r for r in filter_funnel(docs, "text").collect()}
    surv = [rows["input"]["n_surviving"]] + [
        rows[s]["n_surviving"] for s in
        ("word_count", "avg_word_length", "symbol_ratio", "bullet_lines",
         "ellipsis_lines", "alpha_words", "stopwords")]
    assert all(a >= b for a, b in zip(surv, surv[1:]))  # monotone funnel
    keep = gopher_quality_rules(docs, "text").filter("quality_keep").count()
    assert surv[-1] == keep
    assert rows["input"]["n_surviving"] == docs.count()


def test_bpe_fertility_drops_with_merges_and_matches_closed_form(spark):
    from deepchecks_spark.pipeline.bpe import bpe_fertility, learn_bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {r["lang"]: r for r in
            bpe_fertility(docs, "text", "lang", merges=[]).collect()}
    # merges=[] → every word costs len(word)+1 symbols
    import pyspark.sql.functions as SF
    want = docs.groupBy("lang").agg(
        SF.sum(SF.aggregate(
            SF.split(SF.trim("text"), r"\s+"), SF.lit(0),
            lambda a, w: a + SF.length(w) + 1)).alias("ns")).collect()
    for r in want:
        assert base[r["lang"]]["n_subwords"] == r["ns"]
    model = learn_bpe(docs, "text", num_merges=300)
    trained = {r["lang"]: r for r in
               bpe_fertility(docs, "text", "lang", model["merges"]).collect()}
    for lang in base:
        assert trained[lang]["fertility"] < base[lang]["fertility"]
        assert trained[lang]["fertility"] >= 1.0
        assert trained[lang]["n_words"] == base[lang]["n_words"]


def test_ann_recall_curve_monotone_and_exhaustive_at_full_probe(spark):
    """On clustered data the recall curve is monotone in nprobe and
    reaches exactly 1.0 when every cell is probed (ivf_topk == brute
    force at nprobe=nlist, already locked by the ivf tests)."""
    from deepchecks_spark.pipeline.similarity import ann_recall_curve

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = df.selectExpr(
        "vec_id",
        "transform(sequence(0, 15), d -> CAST((CASE WHEN d = CAST(vec_id % 10 AS INT) "
        "THEN 40 ELSE 2 END) + ((vec_id * 7 + d * 13) % 5) - 2 AS DOUBLE)) AS embedding")
    queries = df.filter("vec_id < 20")
    rows = {r["nprobe"]: r for r in
            ann_recall_curve(queries, df, dim=16, k=3, nprobes=(1, 10),
                             nlist=10, sample_size=1000,
                             id_col="vec_id").collect()}
    assert rows[10]["recall"] == 1.0
    assert rows[1]["recall"] <= rows[10]["recall"]
    assert rows[1]["n_truth"] == rows[10]["n_truth"] == 60


def test_language_agreement_diagonal_on_marker_texts(spark):
    from deepchecks_spark.pipeline.textstats import language_agreement

    df = spark.createDataFrame(
        [("en", "the cat sat on the mat and that was that"),
         ("en", "this is of and to in that have with"),
         ("de", "der hund und die katze ist nicht hier"),
         ("fr", "le chat est sur la table et pas ici"),
         ("fr", "xyzzy qwerty plugh"),          # no markers → unknown
         ("zh", "the spark engine")],           # mislabeled → en
        "lang string, text string")
    rows = {(r["lang"], r["lang_pred"]): r["n_docs"]
            for r in language_agreement(df, "lang", "text").collect()}
    assert rows[("en", "en")] == 2
    assert rows[("de", "de")] == 1
    assert rows[("fr", "fr")] == 1
    assert rows[("fr", "unknown")] == 1
    assert rows[("zh", "en")] == 1


def test_neardup_precision_sample_is_deterministic_and_exact(spark):
    from deepchecks_spark.pipeline.dedup import neardup_precision_sample

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon"),       # exact dup of 1
         (3, "alpha beta gamma delta zeta"),          # 3 shared / 3+... shingles
         (4, "completely different words entirely here")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    out1 = sorted(map(tuple, neardup_precision_sample(
        pairs, docs, "doc_id", "text", n=2).collect()))
    out2 = sorted(map(tuple, neardup_precision_sample(
        pairs, docs, "doc_id", "text", n=2).collect()))
    assert out1 == out2 and len(out1) == 2      # md5 order is stable
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in neardup_precision_sample(
                pairs, docs, "doc_id", "text", n=10).collect()}
    assert full[(1, 2)] == 1.0
    assert 0.0 < full[(1, 3)] < 1.0
    assert full[(1, 4)] == 0.0


def test_incremental_minhash_drops_mismatched_signature_lengths(spark):
    """An index built with different num_hashes must be dropped, not
    silently truncated into a wrong agreement estimate."""
    from deepchecks_spark.pipeline.dedup import (
        incremental_candidates_from_signatures,
        minhash_signatures,
    )

    batch = spark.createDataFrame(
        [(10, "some corpus document with enough words to shingle properly")],
        "doc_id long, text string")
    bsig = minhash_signatures(batch, "doc_id", "text", num_hashes=64)
    # 32-hash "index": prefix-identical to the 64-hash signature, so a
    # zip_with truncation would score agreement 32/64 = 0.5
    short = minhash_signatures(
        batch.selectExpr("1 AS doc_id", "text"), "doc_id", "text",
        num_hashes=32)
    out = incremental_candidates_from_signatures(
        bsig, short, "doc_id", num_hashes=64, threshold=0.1)
    assert out.count() == 0


def test_fold_accents_matches_python_twin_and_is_shuffle_free(spark):
    import unicodedata

    from deepchecks_spark.pipeline.textstats import fold_accents

    texts = ["café résumé naïve señor Zürich",
             "ÀÉÎÕÜ çĆčŘż", "ł ß æ œ ð untouched", "plain ascii", None]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    got = {r["id"]: r["folded"]
           for r in fold_accents(df, "text", "folded").collect()}

    def twin(t):
        if t is None:
            return None
        out = []
        for ch in t:
            d = unicodedata.normalize("NFD", ch)
            base = "".join(c for c in d if unicodedata.category(c) != "Mn")
            out.append(base if len(base) == 1 else ch)
        return "".join(out)

    for i, t in enumerate(texts):
        assert got[i] == twin(t), (t, got[i])
    assert got[0] == "cafe resume naive senor Zurich"
    assert got[2] == "ł ß æ œ ð untouched"
    plan = (fold_accents(df, "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


ROBOTS_FIXTURE = """# comments ignored
User-agent: gptbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp
Disallow:
Allow: /private/okno$
Disallow: /wild/*/cards
"""


def test_parse_robots_rules_groups_and_flags(spark):
    from deepchecks_spark.pipeline.webclean import parse_robots_rules

    df = spark.createDataFrame([("a.com", ROBOTS_FIXTURE), ("b.com", None)],
                               "host string, robots string")
    star = parse_robots_rules(df, "host", "robots").collect()
    rows = {(r["path"], r["allow"], r["wildcard"]) for r in star}
    assert rows == {("/private/", False, False), ("/private/ok", True, False),
                    ("/tmp", False, False), ("/private/okno$", True, True),
                    ("/wild/*/cards", False, True)}
    bot = parse_robots_rules(df, "host", "robots", user_agent="GPTBot").collect()
    assert {(r["path"], r["allow"]) for r in bot} == {("/", False)}


def test_robots_disallowed_longest_match_precedence(spark):
    from deepchecks_spark.pipeline.webclean import (
        parse_robots_rules,
        robots_disallowed,
    )

    robots = spark.createDataFrame([("a.com", ROBOTS_FIXTURE)],
                                   "host string, robots string")
    rules = parse_robots_rules(robots, "host", "robots")
    urls = spark.createDataFrame(
        [("http://a.com/public/x",),          # no matching rule -> allowed
         ("http://a.com/private/secret",),    # /private/ disallow
         ("http://a.com/private/ok/file",),   # longer allow wins
         ("http://a.com/tmpfile",),           # prefix match disallows
         ("http://a.com",),                   # bare host -> path '/'
         ("http://other.net/anything",)],     # no rules for host
        "url string")
    got = {r["url"]: r["robots_allowed"]
           for r in robots_disallowed(urls, rules, "url").collect()}
    assert got["http://a.com/public/x"] is True
    assert got["http://a.com/private/secret"] is False
    assert got["http://a.com/private/ok/file"] is True
    assert got["http://a.com/tmpfile"] is False
    assert got["http://a.com"] is True
    assert got["http://other.net/anything"] is True


def test_robots_disallowed_host_and_scheme_case_insensitive(spark):
    # r5 ADVICE: a mixed-case rules host never matched the lowercased
    # URL host, and an uppercase scheme extracted an empty host — both
    # silently reported robots_allowed=true
    from deepchecks_spark.pipeline.webclean import (
        parse_robots_rules,
        robots_disallowed,
    )

    robots = spark.createDataFrame([("A.Com", ROBOTS_FIXTURE)],
                                   "host string, robots string")
    rules = parse_robots_rules(robots, "host", "robots")
    urls = spark.createDataFrame(
        [("HTTP://A.COM/private/secret",),
         ("http://a.com/private/secret",)],
        "url string")
    got = {r["url"]: r["robots_allowed"]
           for r in robots_disallowed(urls, rules, "url").collect()}
    assert got["HTTP://A.COM/private/secret"] is False
    assert got["http://a.com/private/secret"] is False
