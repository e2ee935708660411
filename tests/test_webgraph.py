"""Web-graph operators: PageRank matches an independent numpy power
iteration (same update rule, dangling redistribution) on hand-built
graphs; the link-graph summary's counts are hand-computed."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepchecks_spark.pipeline.webgraph import link_graph_summary, pagerank


def _numpy_pagerank(edges, n_iterations, damping):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    dedup = sorted(set(edges))
    out_deg = np.zeros(n)
    for a, _ in dedup:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iterations):
        contrib = np.zeros(n)
        for a, b in dedup:
            contrib[idx[b]] += r[idx[a]] / out_deg[idx[a]]
        d_mass = r[out_deg == 0].sum()
        r = (1.0 - damping) / n + damping * (contrib + d_mass / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize("n_iterations", [1, 3, 10])
def test_pagerank_matches_numpy_power_iteration(spark, n_iterations):
    # cycle + chord + dangling sink (4 has no out-edge) + parallel edge
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (2, 4), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"]
           for r in pagerank(df, n_iterations=n_iterations).collect()}
    want = _numpy_pagerank(edges, n_iterations, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_self_loop_and_string_ids(spark):
    edges = [("a", "a"), ("a", "b"), ("b", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iterations=5).collect()}
    want = _numpy_pagerank(edges, 5, 0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # 'a' keeps half its own mass each round and receives all of b's:
    # it must outrank b
    assert got["a"] > got["b"]


def test_pagerank_uniform_on_symmetric_cycle(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    got = [r["rank"] for r in pagerank(df, n_iterations=7).collect()]
    assert all(r == pytest.approx(1.0 / 3, abs=1e-12) for r in got)


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, n_iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_link_graph_summary_hand_computed(spark):
    # edges after dedup: (1,2) (2,1) (2,3) (3,3) (3,4); parallel (1,2)x2
    # nodes {1,2,3,4}; 4 dangling; one self-loop; reciprocal pair 1<->2
    edges = [(1, 2), (1, 2), (2, 1), (2, 3), (3, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = link_graph_summary(df).first()
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 5
    assert row["n_dangling"] == 1
    assert row["n_self_loops"] == 1
    # directed non-loop edges: (1,2),(2,1),(2,3),(3,4) -> 2 reciprocal
    assert row["reciprocity"] == pytest.approx(2 / 4)
    assert row["avg_out_degree"] == pytest.approx(5 / 4)
    assert row["max_out_degree"] == 2  # node 2 and 3 both have 2
    assert row["max_in_degree"] == 2   # node 3: (2,3) + self-loop (3,3)


# ---------------------------------------------------------------------------
# extract_links / host_edges — html → outlink edge list
# ---------------------------------------------------------------------------

def test_extract_links_resolution_cases(spark):
    from deepchecks_spark.pipeline.webgraph import extract_links

    rows = [
        (1, "https://a.example/dir/page.html",
         '<a href="/abs">x</a><a href="rel/p">y</a><a href="//b.example/q">z'
         '</a><a href="https://c.example/r#frag">w</a><a href="mailto:x@y">m'
         '</a><a href="#top">t</a><a href="">e</a>'
         '<a href="JavaScript:void(0)">j</a>'),
        # bare-origin base: directory is origin + '/'
        (2, "https://a.example", '<a href="p2">only</a>'),
        # query/fragment on the base never leak into the directory
        (3, "http://h.example/a/b.html?q=1#f", '<a href="c">rel</a>'),
        # unparseable base emits no edges
        (4, "not a url", '<a href="/nope">dropped</a>'),
        (5, "https://a.example/x", None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string, html string")
    got = sorted(
        (r["doc_id"], r["link_url"])
        for r in extract_links(df, "html", "url", keep_cols=["doc_id"]).collect())
    assert got == [
        (1, "https://a.example/abs"),          # root-relative -> origin
        (1, "https://a.example/dir/rel/p"),    # relative -> base directory
        (1, "https://b.example/q"),            # protocol-relative -> scheme
        (1, "https://c.example/r"),            # absolute kept, fragment stripped
        (2, "https://a.example/p2"),
        (3, "http://h.example/a/c"),
    ]


def test_extract_links_binary_html_and_host_edges(spark):
    from deepchecks_spark.pipeline.webgraph import extract_links, host_edges

    # html arrives as BINARY in the input_hint schema; the cast must hold
    rows = [("https://s1.example/p", bytearray(
        b'<a href="https://S2.example/a">u</a><a href="/self">s</a>'))]
    df = spark.createDataFrame(rows, "url string, html binary")
    links = extract_links(df, "html", "url", keep_cols=["url"])
    assert links.count() == 2
    edges = sorted(map(tuple, host_edges(links, "url", "link_url").collect()))
    # intra-host /self dropped, host lower-cased, distinct
    assert edges == [("s1.example", "s2.example")]


def test_extract_links_feeds_pagerank_end_to_end(spark):
    from deepchecks_spark.pipeline.webgraph import (
        extract_links, host_edges, pagerank)

    rows = [
        ("https://a.example/1", '<a href="https://b.example/x">1</a>'),
        ("https://a.example/2", '<a href="https://b.example/y">2</a>'),
        ("https://b.example/1", '<a href="https://a.example/z">3</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    edges = host_edges(
        extract_links(df, "html", "url", keep_cols=["url"]), "url", "link_url")
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, n_iterations=20).collect()}
    # symmetric 2-cycle a<->b: uniform 1/2 each
    assert ranks["a.example"] == pytest.approx(0.5, abs=1e-9)
    assert ranks["b.example"] == pytest.approx(0.5, abs=1e-9)


def test_trustrank_matches_numpy_and_isolates_unreached_spam(spark):
    import numpy as np

    # trusted: a. Chain a->b->c; spam farm d<->e unreachable from a.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("e", "d")],
        "src string, dst string")
    from deepchecks_spark.pipeline.webgraph import trustrank

    got = {r["id"]: r["rank"]
           for r in trustrank(edges, ["a"], n_iterations=12).collect()}
    # numpy twin: nodes a b c d e; v = [1,0,0,0,0]
    idx = {n: i for i, n in enumerate("abcde")}
    out = {"a": ["b"], "b": ["c"], "d": ["e"], "e": ["d"]}
    v = np.array([1.0, 0, 0, 0, 0])
    r = v.copy()
    d = 0.85
    for _ in range(12):
        contrib = np.zeros(5)
        dm = 0.0
        for s, ds in out.items():
            for t in ds:
                contrib[idx[t]] += r[idx[s]] / len(ds)
        dm = sum(r[idx[n]] for n in "abcde" if n not in out)
        r = (1 - d) * v + d * dm * v + d * contrib
    for n in "abcde":
        assert got[n] == pytest.approx(r[idx[n]], abs=1e-12)
    assert got["d"] == 0.0 and got["e"] == 0.0       # spam isolation
    assert sum(got.values()) == pytest.approx(1.0)


def test_trustrank_input_validation(spark):
    from deepchecks_spark.pipeline.webgraph import trustrank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="non-empty seed"):
        trustrank(edges, [])
    with pytest.raises(ValueError, match="no seed appears"):
        trustrank(edges, ["zzz"])
    with pytest.raises(ValueError, match="plan literals"):
        trustrank(edges, [str(i) for i in range(10_001)])
