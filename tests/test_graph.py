"""Integer PageRank (functions/graph.py) vs an independent Python
model, plus structural sanity on a known graph."""

import pytest

from kafkadirect_spark.functions.graph import pagerank_scaled


def _model(edges, iters=2, d=85, scale=10 ** 9):
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {n: scale for n in nodes}
    teleport = (100 - d) * scale // 100
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += (d * (r[u] // deg[u])) // 100
        r = {n: teleport + s[n] for n in nodes}
    return r


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_pagerank_matches_python_model(spark, iters):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r["rank"] for r in
           pagerank_scaled(df, iters=iters).collect()}
    assert out == _model(edges, iters=iters)


def test_pagerank_hub_outranks_leaf(spark):
    # everything points at node 9; it must end far above the sources
    edges = [(i, 9) for i in range(1, 6)] + [(9, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r["rank"] for r in pagerank_scaled(df, iters=2).collect()}
    assert out[9] > 3 * out[2]
    # node 1 gets 9's mass back, so it outranks the other sources
    assert out[1] > out[2] == out[3]


def test_pagerank_dangling_node_keeps_teleport_rank(spark):
    # 2 has no out-edges: its mass is dropped (documented), but it
    # still holds teleport + inflow
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = {r.node: r["rank"] for r in pagerank_scaled(df, iters=1).collect()}
    scale = 10 ** 9
    assert out[1] == 15 * scale // 100
    assert out[2] == 15 * scale // 100 + 85 * scale // 100


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_scaled(df, iters=0)
    with pytest.raises(ValueError):
        pagerank_scaled(df, damping_pct=100)
