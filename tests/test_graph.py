"""PageRank: numeric parity with a dense NumPy power iteration, dangling and
teleport handling, conservation of mass."""

import numpy as np

from plenario_mapper_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, d=0.85, iters=200):
    """Dense reference: column-stochastic with uniform dangling completion."""
    out = {}
    for s, t in edge_list:
        out.setdefault(s, set()).add(t)
    M = np.zeros((n, n))
    for s in range(n):
        if s in out:
            for t in out[s]:
                M[t, s] = 1.0 / len(out[s])
        else:
            M[:, s] = 1.0 / n
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (M @ r)
    return r


def test_pagerank_matches_dense_reference_with_dangling_node(spark):
    # 0 -> 1, 0 -> 2, 1 -> 2, 2 -> 0, 3 -> 2, and node 4 dangling (no out),
    # reachable via 2 -> 4
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, tol=1e-10).collect()}
    want = _numpy_pagerank(5, edges)
    assert set(got) == set(range(5))
    for i in range(5):
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_parallel_edges_collapse_and_empty_graph(spark):
    dup = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 0)], "src long, dst long"
    )
    single = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    g1 = {r["node"]: r["rank"] for r in pagerank(dup, tol=1e-10).collect()}
    g2 = {r["node"]: r["rank"] for r in pagerank(single, tol=1e-10).collect()}
    for k in g1:
        assert abs(g1[k] - g2[k]) < 1e-12
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
