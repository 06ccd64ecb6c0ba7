"""Link-graph authority scoring — PageRank-ordered frontier priority.

The reference crawler schedules purely by insertion order or host-decay
scores (/root/reference/lib/FifoUrlList.js, lib/RedisUrlList.js:25-53);
production crawlers at web scale schedule by link authority (Cho,
Garcia-Molina & Page 1998, "Efficient crawling through URL ordering" —
PageRank-ordered frontiers find important pages first). This module
derives that signal from the engine's own outputs: discovered-link pairs
(handler output / ``links`` events) aggregated to a weighted host graph,
power-iterated entirely as DataFrame joins — no GraphX, no RDDs, no
driver-side adjacency.

Scale design (10^10-URL crawl → ~10^8-host graph):

- the URL-level link pairs are pre-aggregated to ``(src, dst, weight)``
  HOST edges first — the host graph is orders of magnitude smaller than
  the URL graph, and host authority is what frontier scheduling needs;
- the per-edge share (weight / out-weight) is iteration-invariant, so it
  is computed ONCE and checkpointed; each iteration then costs exactly
  two key shuffles: ranks ⋈ edges on ``src`` and a map-side-combinable
  ``groupBy(dst)`` contribution sum. Neither side is ever broadcast —
  a web-scale rank vector does not fit one executor;
- dangling mass (hosts with no out-links) folds back as ONE scalar
  aggregate per iteration, never a row explosion;
- ranks are localCheckpointed per iteration so the k-iteration lineage
  never compounds into a single mega-plan (``checkpoint`` on a real
  cluster); the previous iteration's pin is released as soon as the next
  one materializes.

Verified by tests/test_linkgraph.py against (a) an independent dense
numpy power iteration and (b) a DuckDB unrolled-CTE twin of the same
recurrence, plus invariant tests (rank mass sums to 1, weight semantics,
dangling redistribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_edges(links: DataFrame, src_col: str = "src_url",
               dst_col: str = "dst_url") -> DataFrame:
    """URL-level link pairs → weighted host-graph edges
    ``(src, dst, weight)``.

    Self-loops are dropped (a host linking to itself carries no
    cross-host authority signal); rows where either side has no parsable
    host are dropped. One ``groupBy`` shuffle on the (src, dst) pair —
    map-side combinable, so the exchange carries one row per distinct
    host pair per partition, not one per link.
    """
    e = links.select(
        F.lower(F.try_parse_url(F.col(src_col), F.lit("HOST"))).alias("src"),
        F.lower(F.try_parse_url(F.col(dst_col), F.lit("HOST"))).alias("dst"))
    return (e.filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                     & (F.col("src") != F.col("dst")))
             .groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("weight")))


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             weight: str | None = "weight",
             plan_sink: dict | None = None) -> DataFrame:
    """Weighted PageRank over ``(src, dst[, weight])`` edges.

    Returns ``(node, rank)`` with ``sum(rank) == 1`` (dangling mass is
    redistributed uniformly each iteration — the standard stochastic
    completion, so rank is a true probability distribution). ``weight=None``
    treats every edge as weight 1. ``iterations`` fixed-step power
    iteration: frontier scheduling needs a stable ordering signal, not
    convergence to machine epsilon — 3-5 iterations already separate
    authority tiers (Cho et al. §4).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w_col = (F.col(weight).cast("double") if weight is not None
             else F.lit(1.0))
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w_col.alias("w"))

    nodes = (e.select(F.col("src").alias("node"))
              .unionByName(e.select(F.col("dst").alias("node")))
              .distinct()
              .localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    # per-edge share of its source's rank — iteration-invariant, computed
    # once: weight / total out-weight of src (one map-combinable agg + one
    # src-keyed shuffle join)
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow"))
    share = (e.join(out_w, "src")
              .select("src", "dst", (F.col("w") / F.col("ow")).alias("share"))
              .localCheckpoint(eager=True))
    # hosts with no out-links: their mass redistributes uniformly
    dangling = (nodes.join(out_w.select(F.col("src").alias("node")),
                           "node", "left_anti")
                     .localCheckpoint(eager=True))

    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        # ONE scalar crosses to the driver per iteration (dangling mass)
        dm_row = (ranks.join(dangling, "node", "left_semi")
                       .agg(F.sum("rank").alias("dm")).collect()[0])
        dm = float(dm_row["dm"] or 0.0)
        contrib = (share.join(ranks, share.src == ranks.node)
                        .groupBy("dst")
                        .agg(F.sum(F.col("rank") * F.col("share"))
                              .alias("contrib")))
        prev = ranks
        step = (nodes.join(contrib, nodes.node == contrib.dst, "left")
                     .select(
                         "node",
                         (F.lit(base) + F.lit(damping)
                          * (F.coalesce(F.col("contrib"), F.lit(0.0))
                             + F.lit(dm / n)))
                         .alias("rank")))
        if plan_sink is not None:
            # pre-checkpoint plan of one full iteration (PLANS.md audit
            # pattern — localCheckpoint truncates lineage, crawler.py:750)
            from .crawler import plan_str
            plan_sink["iteration"] = plan_str(step)
        ranks = step.localCheckpoint(eager=True)
        # NOTE: Dataset.unpersist only releases cache-manager entries; the
        # RDD blocks pinned by a previous localCheckpoint are freed when
        # the checkpointed RDD is garbage-collected (ContextCleaner), not
        # here — so per-iteration memory release is best-effort. Rank
        # state is 2 columns x |hosts| rows (never corpus-sized), and
        # iteration counts are ~10-20, so the bounded retention is fine;
        # if aggressive release is ever needed, drop to the RDD API.
        prev.unpersist()
    return ranks


def rank_priority(frontier: DataFrame, ranks: DataFrame,
                  url_col: str = "url", host_col: str = "host") -> DataFrame:
    """Attach a link-authority priority to frontier rows: higher host
    rank → smaller ``authority_priority`` (sorts first under the engine's
    ascending next_fetch_time ordering). Hosts absent from the rank table
    (never linked) sort last. The rank side is node-sized; the frontier
    side is the big one — joined on the frontier's existing ``host``
    column, so at scale this is one key shuffle of the small rank table
    against a host-partitioned frontier scan (or a broadcast when the
    host universe fits)."""
    r = ranks.select(F.col("node").alias(host_col),
                     F.col("rank").alias("_rank"))
    return (frontier.join(r, host_col, "left")
            .withColumn("authority_priority",
                        F.when(F.col("_rank").isNotNull(), -F.col("_rank"))
                         .otherwise(F.lit(0.0)))
            .drop("_rank"))
