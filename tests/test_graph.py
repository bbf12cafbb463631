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


# ---------------------------------------------------------------------------
# triangle_stats (round 12): exact distributed triangle census with
# (degree, id) edge orientation — Suri & Vassilvitskii 2011.


def test_triangle_stats_hand_checked(spark):
    """K4 plus a pendant, with duplicate and reversed edges thrown in:
    dedup + canonicalization must not double-count."""
    import itertools

    from kafkadirect_spark.functions.graph import triangle_stats

    edges = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    edges += [(5, 1), (1, 5), (2, 1), (3, 3)]   # dup, reversed, loop
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    r = triangle_stats(df).collect()[0]
    # degrees 4,3,3,3,1 -> wedges 6+3+3+3 = 15; K4 has 4 triangles
    assert tuple(r) == (5, 7, 15, 4, 1000 * 12 // 15)


def test_triangle_stats_matches_brute_force(spark):
    """Engine == itertools brute force on a seeded random graph —
    orientation, wedge construction and closure all exact."""
    import itertools
    import random

    from kafkadirect_spark.functions.graph import triangle_stats

    random.seed(7)
    nodes = list(range(30))
    es: set = set()
    while len(es) < 120:
        a, b = random.sample(nodes, 2)
        es.add((min(a, b), max(a, b)))
    adj = {n: set() for n in nodes}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(1 for a, b, c in itertools.combinations(nodes, 3)
              if b in adj[a] and c in adj[a] and c in adj[b])
    wed = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
    df = spark.createDataFrame(sorted(es), "id_a long, id_b long")
    r = triangle_stats(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (
        30, 120, wed, tri)


def test_triangle_stats_oracle_matches_engine(spark):
    """Engine == DuckDB over the REGISTERED simhash candidate graph
    (the oracle composes _SIMHASH_PAIRS_ORACLE as its edge CTE) —
    registration-ready over the same pair surface the driver already
    verifies."""
    import duckdb

    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.functions.graph import (
        triangle_stats, triangle_stats_oracle_sql)
    from kafkadirect_spark.plans.llm_queries import _SIMHASH_PAIRS_ORACLE

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = dedup.simhash_pairs(docs, "text", "doc_id",
                                bits=32, max_hamming=3, n_bands=4)
    eng = [tuple(x) for x in
           triangle_stats(pairs.select("id_a", "id_b")).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = con.sql(
        triangle_stats_oracle_sql(_SIMHASH_PAIRS_ORACLE)).fetchall()
    assert got == eng and eng[0][3] > 0


def test_triangle_stats_plan_is_scale_safe(spark):
    """No cartesian product, no window functions at all; the wedge
    join is an equi-join on the low endpoint (hash-joinable), closure
    a left-semi equi-join."""
    import contextlib
    import io

    from kafkadirect_spark.functions.graph import triangle_stats

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)],
                               "id_a long, id_b long")
    out = triangle_stats(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan


def test_local_clustering_hand_checked_and_consistency(spark):
    """K4 + pendant: every K4 vertex closes fully except node 1,
    whose pendant edge dilutes it; per-node triangle counts sum to
    3x the census total."""
    import itertools

    from kafkadirect_spark.functions.graph import (local_clustering,
                                                   triangle_stats)

    edges = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    edges += [(5, 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.node: (r.degree, r.n_triangles,
                    r.local_clustering_permille)
           for r in local_clustering(df).collect()}
    # node 1: degree 4, its 3 K4-triangles over 6 possible pairs
    assert out[1] == (4, 3, 1000 * 2 * 3 // (4 * 3))
    for n in (2, 3, 4):
        assert out[n] == (3, 3, 1000)
    assert out[5] == (1, 0, 0)
    total = triangle_stats(df).collect()[0].n_triangles
    assert sum(t for _, t, _ in out.values()) == 3 * total


def test_local_clustering_matches_brute_force(spark):
    """Engine == per-node brute force on the seeded random graph."""
    import itertools
    import random

    from kafkadirect_spark.functions.graph import local_clustering

    random.seed(7)
    nodes = list(range(30))
    es: set = set()
    while len(es) < 120:
        a, b = random.sample(nodes, 2)
        es.add((min(a, b), max(a, b)))
    adj = {n: set() for n in nodes}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for n in nodes:
        d = len(adj[n])
        t = sum(1 for x, y in itertools.combinations(sorted(adj[n]), 2)
                if y in adj[x])
        want[n] = (d, t, 0 if d < 2 else 1000 * 2 * t // (d * (d - 1)))
    df = spark.createDataFrame(sorted(es), "id_a long, id_b long")
    got = {r.node: (r.degree, r.n_triangles,
                    r.local_clustering_permille)
           for r in local_clustering(df).collect()}
    assert got == want


def test_local_clustering_oracle_matches_engine(spark):
    """Engine == DuckDB over the registered simhash candidate graph
    (oracle composes _SIMHASH_PAIRS_ORACLE) — registration-ready."""
    import duckdb

    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.functions.graph import (
        local_clustering, local_clustering_oracle_sql)
    from kafkadirect_spark.plans.llm_queries import _SIMHASH_PAIRS_ORACLE

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = dedup.simhash_pairs(docs, "text", "doc_id",
                                bits=32, max_hamming=3, n_bands=4)
    eng = sorted(tuple(x) for x in
                 local_clustering(pairs.select("id_a", "id_b")).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = sorted(con.sql(
        local_clustering_oracle_sql(_SIMHASH_PAIRS_ORACLE)).fetchall())
    assert got == eng and eng
    assert any(r[3] not in (0, 1000) for r in eng)  # mixed closure


def test_triangle_stats_oracle_matches_engine_lsh_surface(spark):
    """Engine == DuckDB over the SELECTIVE registered MinHash-LSH
    candidate graph — the surface the r13 plan prescribes for the
    r14 graph registration (the simhash band graph is 2.4M edges at
    sf0.1; the LSH graph stays driver-sized).  Also pins that the
    registered dedup_minhash_lsh oracle IS the shared
    _MINHASH_PAIRS_ORACLE variable the composition embeds, so the
    two replays can never drift apart."""
    import duckdb

    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.functions.graph import (
        local_clustering, local_clustering_oracle_sql, triangle_stats,
        triangle_stats_oracle_sql)
    from kafkadirect_spark.plans import ORACLE_SQL
    from kafkadirect_spark.plans.llm_queries import _MINHASH_PAIRS_ORACLE

    assert ORACLE_SQL["dedup_minhash_lsh"] == _MINHASH_PAIRS_ORACLE

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", n=3)
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id")
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    eng = [tuple(x) for x in triangle_stats(pairs).collect()]
    got = con.sql(
        triangle_stats_oracle_sql(_MINHASH_PAIRS_ORACLE)).fetchall()
    assert got == eng and eng[0][1] > 0        # real edges present
    eng_lc = sorted(tuple(x) for x in local_clustering(pairs).collect())
    got_lc = sorted(con.sql(
        local_clustering_oracle_sql(_MINHASH_PAIRS_ORACLE)).fetchall())
    assert got_lc == eng_lc and eng_lc
