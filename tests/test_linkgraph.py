"""Link-graph PageRank frontier-priority operator (linkgraph.py) vs two
independent references: a dense numpy power iteration and a DuckDB
unrolled-CTE twin of the identical recurrence."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from supercrawler_spark import linkgraph as LG


def np_pagerank(edges: list[tuple[str, str, float]], iterations: int,
                damping: float) -> dict[str, float]:
    """Independent dense reference: explicit stochastic matrix power
    iteration with uniform dangling redistribution."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for s, d, wt in edges:
        w[idx[d], idx[s]] += wt
    out = w.sum(axis=0)
    share = np.divide(w, out, out=np.zeros_like(w), where=out > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dm = r[out == 0].sum()
        r = (1 - damping) / n + damping * (share @ r + dm / n)
    return {v: r[idx[v]] for v in nodes}


def duckdb_pagerank(edges: list[tuple[str, str, float]], iterations: int,
                    damping: float) -> dict[str, float]:
    """Second independent reference: the same recurrence as unrolled SQL
    CTEs in DuckDB (the engine the driver's oracle gate uses)."""
    con = duckdb.connect()
    con.register("e", pd.DataFrame(edges, columns=["src", "dst", "weight"]))
    parts = [
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes)",
        "outw AS (SELECT src, SUM(weight)::DOUBLE AS ow FROM e GROUP BY src)",
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(iterations):
        p, c = f"r{i}", f"r{i + 1}"
        parts.append(f"""{c} AS (
            SELECT nd.node,
                   (1 - {damping})/(SELECT n FROM nn)
                   + {damping} * (COALESCE(cb.contrib, 0)
                       + (SELECT COALESCE(SUM(r.rank), 0) FROM {p} r
                          LEFT JOIN outw o ON r.node = o.src
                          WHERE o.src IS NULL)/(SELECT n FROM nn)) AS rank
            FROM nodes nd LEFT JOIN (
                SELECT e.dst AS node,
                       SUM(r.rank * e.weight / o.ow) AS contrib
                FROM e JOIN {p} r ON e.src = r.node
                       JOIN outw o ON e.src = o.src
                GROUP BY e.dst) cb ON nd.node = cb.node)""")
    rows = con.execute(
        "WITH " + ",\n".join(parts)
        + f" SELECT node, rank FROM r{iterations}").fetchall()
    con.close()
    return dict(rows)


def spark_ranks(spark, edges, iterations=3, damping=0.85) -> dict[str, float]:
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    return {r["node"]: r["rank"]
            for r in LG.pagerank(df, iterations, damping).collect()}


TINY = [("a", "b", 1.0), ("a", "c", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]


def random_graph(n_nodes=60, n_edges=400, seed=7):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, n_nodes, n_edges)
    d = rng.randint(0, n_nodes, n_edges)
    w = rng.randint(1, 5, n_edges).astype(float)
    return [(f"h{a}.test", f"h{b}.test", float(c))
            for a, b, c in zip(s, d, w) if a != b]


def assert_close(got: dict, want: dict):
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-12), k


def test_pagerank_matches_numpy_tiny(spark):
    assert_close(spark_ranks(spark, TINY, 5), np_pagerank(TINY, 5, 0.85))


def test_pagerank_matches_both_references_random_graph(spark):
    edges = random_graph()
    got = spark_ranks(spark, edges, 3)
    assert_close(got, np_pagerank(edges, 3, 0.85))
    assert_close(got, duckdb_pagerank(edges, 3, 0.85))


def test_rank_mass_sums_to_one_with_dangling(spark):
    # 'sink' has no out-edges: its mass must redistribute, not vanish
    edges = [("a", "sink", 1.0), ("b", "sink", 2.0), ("a", "b", 1.0)]
    got = spark_ranks(spark, edges, 4)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)
    assert_close(got, np_pagerank(edges, 4, 0.85))
    # the doubly-linked sink outranks its sources
    assert got["sink"] > got["a"] and got["sink"] > got["b"]


def test_duplicate_edges_equal_weighted_edge(spark):
    dup = [("a", "b", 1.0), ("a", "b", 1.0), ("b", "a", 1.0)]
    merged = [("a", "b", 2.0), ("b", "a", 1.0)]
    assert_close(spark_ranks(spark, dup, 3), spark_ranks(spark, merged, 3))


def test_host_edges_aggregates_and_drops_self_loops(spark):
    links = spark.createDataFrame(
        [("http://A.test/p1", "http://b.test/x"),
         ("http://a.test/p2", "http://B.test/y"),   # same host pair, case-insensitive
         ("http://a.test/p3", "http://a.test/p4"),  # self loop -> dropped
         ("not a url", "http://b.test/z")],         # unparsable src -> dropped
        ["src_url", "dst_url"])
    rows = {(r["src"], r["dst"]): r["weight"]
            for r in LG.host_edges(links).collect()}
    assert rows == {("a.test", "b.test"): 2}


def test_rank_priority_orders_frontier_by_authority(spark):
    ranks = LG.pagerank(
        spark.createDataFrame(TINY, ["src", "dst", "weight"]), 5)
    frontier = spark.createDataFrame(
        [("http://a/1", "a"), ("http://c/1", "c"), ("http://z/1", "z")],
        ["url", "host"])
    out = LG.rank_priority(frontier, ranks)
    by_host = {r["host"]: r["authority_priority"] for r in out.collect()}
    ref = np_pagerank(TINY, 5, 0.85)
    # priority is -rank for ranked hosts; z is unranked and sorts last (0.0)
    assert by_host["a"] == pytest.approx(-ref["a"], rel=1e-9)
    assert by_host["c"] == pytest.approx(-ref["c"], rel=1e-9)
    assert by_host["z"] == 0.0 and by_host["z"] > by_host["a"]
    assert out.count() == 3


def test_pagerank_iteration_plan_is_key_joins(spark):
    df = spark.createDataFrame(random_graph(30, 120), ["src", "dst", "weight"])
    sink = {}
    LG.pagerank(df, 2, plan_sink=sink)
    plan = sink["iteration"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the contribution sum must be a partial (map-side combinable) agg
    assert "partial_sum" in plan.lower() or "HashAggregate" in plan
