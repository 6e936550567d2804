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


def _brute_triangles(edge_list):
    """Per-node triangle counts by enumerating all node triples."""
    from itertools import combinations

    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    counts = dict.fromkeys(nodes, 0)
    for a, b, c in combinations(nodes, 3):
        if (a, b) in und and (b, c) in und and (a, c) in und:
            for n in (a, b, c):
                counts[n] += 1
    return {n: c for n, c in counts.items() if c}


def test_triangle_counts_match_brute_force(spark):
    import random

    from plenario_mapper_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    edges = {(rng.randrange(12), rng.randrange(12)) for _ in range(40)}
    edges = [e for e in edges if e[0] != e[1]]
    # directed duplicates + a self-loop must not change counts
    noisy = edges + [(b, a) for a, b in edges[:5]] + [(3, 3)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)


def test_triangle_counts_skewed_hub(spark):
    """A celebrity hub node: star edges alone close no triangles; adding one
    rim edge closes exactly one triangle crediting hub + both rim nodes."""
    from plenario_mapper_spark.operators.graph import triangle_counts

    star = [(0, i) for i in range(1, 9)]
    df = spark.createDataFrame(star, "src long, dst long")
    assert triangle_counts(df).count() == 0
    df2 = spark.createDataFrame(star + [(1, 2)], "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df2).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_bfs_khop_exact_distances_on_known_graph(spark):
    """graph.bfs_khop: hand-checkable path graph with a branch and an
    unreachable island; k caps the radius."""
    from plenario_mapper_spark.operators.graph import bfs_khop
    from pyspark.sql import functions as F

    # 1-2-3-4-5 path, branch 2-6; island 9-10
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (9, 10)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "a long, b long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["d"] for r in bfs_khop(edges, seeds, k=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 6: 2}
    got3 = {r["node"]: r["d"] for r in bfs_khop(edges, seeds, k=3).collect()}
    assert got3 == {1: 0, 2: 1, 3: 2, 6: 2, 4: 3}
    # multi-source takes the MIN over seeds
    seeds2 = spark.createDataFrame([(1,), (5,)], "node long")
    got_ms = {r["node"]: r["d"] for r in bfs_khop(edges, seeds2, k=1).collect()}
    assert got_ms == {1: 0, 5: 0, 2: 1, 4: 1}


def test_bfs_khop_early_stop_and_validation(spark):
    from plenario_mapper_spark.operators.graph import bfs_khop

    edges = spark.createDataFrame([(1, 2), (2, 1)], "a long, b long")
    seeds = spark.createDataFrame([(1,)], "node long")
    # graph exhausts at hop 1; k=5 must terminate early with the same answer
    got = {r["node"]: r["d"] for r in bfs_khop(edges, seeds, k=5).collect()}
    assert got == {1: 0, 2: 1}
    import pytest

    with pytest.raises(ValueError):
        bfs_khop(edges, seeds, k=-1)


def test_degree_hist_hand_checked(spark):
    """Triangle + pendant: degrees 1,2,2,3 -> histogram {1:1, 2:2, 3:1}."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    # one order with parts {1,2,3} (triangle), one with {3,4} (pendant edge)
    rows = [
        (10, 1), (10, 2), (10, 3),
        (20, 3), (20, 4),
    ]
    li = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        got = {
            r["degree"]: r for r in QUERIES["q_graph_degree_hist"](spark, d).collect()
        }
    assert got[1]["n_nodes"] == 1   # part 4
    assert got[2]["n_nodes"] == 2   # parts 1, 2
    assert got[3]["n_nodes"] == 1   # part 3 bridges
    assert abs(got[2]["share"] - 0.5) < 1e-6


def test_component_sizes_hand_checked(spark):
    """Known topology through the %20 order gate: a 3-clique, a 2-path,
    and an isolated pair -> sizes {3:1, 2:1+1}."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    # orders 20/40/60 pass the gate; order 7 (filtered) would merge the
    # components if it leaked through
    rows = [
        (20, 1), (20, 2), (20, 3),   # triangle {1,2,3}
        (40, 4), (40, 5),            # pair {4,5}
        (60, 6), (60, 7),            # pair {6,7}
        (7, 3, ), (7, 4),            # MUST be filtered out
    ]
    li = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        got = {
            r["component_size"]: r
            for r in QUERIES["q_graph_component_sizes"](spark, d).collect()
        }
    assert got[3]["n_components"] == 1 and got[3]["n_nodes"] == 3
    assert got[2]["n_components"] == 2 and got[2]["n_nodes"] == 4
    assert abs(got[3]["node_share"] - 3 / 7) < 1e-6


def test_triangle_counts_apex_batched_equals_one_pass(spark):
    """apex_batches partitions triangles by their unique apex, so the K-pass
    plan (the single-box transient-disk bound for the x100 clone) must
    return the identical per-node counts as the one-pass plan."""
    import random

    from plenario_mapper_spark.operators.graph import triangle_counts

    rng = random.Random(41)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(400)})
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src long, dst long"
    )
    one = sorted(map(tuple, triangle_counts(df).collect()))
    for k in (2, 5):
        batched = sorted(map(tuple, triangle_counts(df, apex_batches=k).collect()))
        assert batched == one, k
