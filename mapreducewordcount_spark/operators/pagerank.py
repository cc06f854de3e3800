"""Fixed-point PageRank: the iterative-graph pattern, oracle-exact.

PageRank is the canonical "needs a driver loop" algorithm — each
round is join(ranks, edges) -> groupBy(dst) -> new ranks. This
implementation makes two deliberate choices:

- **Fixed iteration count, not convergence-test looping.** At 100 TB
  a convergence test is a full extra action per round; production
  systems (and the original paper's experiments) run a fixed budget.
  It also makes the computation a finite expression DAG the DuckDB
  oracle can replay as unrolled CTEs.
- **Integer fixed-point arithmetic.** Ranks live in micro-units
  (R0 = 1e6); the share a node passes each neighbour is
  ``rank div out_degree`` and damping is the rational 850/1000 —
  every operation is BIGINT ``div``/``*``/``+``, so the result is
  bit-identical on any engine, any partitioning, any summation
  order. Float PageRank cannot promise that (the per-node inbound
  sum is order-sensitive); fixed-point trades a deterministic
  sub-micro-unit leak per division for exactness of the whole
  pipeline. Overflow headroom: damping*sum needs
  ``850 * n_in * R0 < 2^63`` — fine to ~10^13 in-edges per node.

Spark shape per iteration: one broadcast-or-shuffle join
ranks⋈degrees (same key, co-partitioned after round 1 — AQE reuses
the exchange), the edge join, one groupBy(dst) with map-side partial
sums. Rank frames are O(nodes); edges are the big side and are
scanned, never mutated. For long chains, ``localCheckpoint`` every
~10 rounds cuts lineage (the SemDeDup closure-loop precedent,
``operators/semdedup.py``); at 3 rounds it is unnecessary.

The default contract requires a DANGLING-FREE edge set (every src
also appears as a dst, e.g. by symmetrizing a bipartite relation) —
the right shape for the gate's bipartite query. Real web/citation
graphs have dangling nodes (out-degree 0); ``dangling="redistribute"``
applies the standard treatment (Page et al.: a dangling node's rank
is split uniformly over ALL nodes) at the cost of one extra
aggregate per iteration — the dangling-mass sum, a 1-row frame
crossJoined back in (broadcast by construction), never a driver
action inside the loop. Total rank is then conserved up to the
deterministic integer-div leaks (property-pinned in
tests/test_pagerank.py).
Reference parity: none (extension surface §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R0 = 1_000_000  # one unit of rank, in micro-units


def pagerank_fixed_point(edges: DataFrame, *, iterations: int = 3,
                         damping_num: int = 850,
                         damping_denom: int = 1000,
                         dangling: str = "contract") -> DataFrame:
    """Ranks after ``iterations`` fixed-point rounds.

    ``edges``: (src BIGINT, dst BIGINT) — deduplicated directed
    edges. Returns ``(node, rank)`` with rank in micro-units.

    ``dangling="contract"`` (default): caller guarantees every node
    with an in-edge also has an out-edge; the node universe is the
    out-node set and no redistribution runs (the gate query's
    symmetrized-bipartite shape). ``dangling="redistribute"``: the
    node universe is src ∪ dst and each round adds the uniform
    dangling share ``dangling_mass div n_nodes`` inside the damping
    term — ``rank' = base + (d·(inbound + dmass div N)) div denom``,
    still all-BIGINT, still engine/partitioning-invariant.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if dangling not in ("contract", "redistribute"):
        raise ValueError(f"unknown dangling mode {dangling!r}")
    if dangling == "redistribute":
        return _pagerank_redistribute(edges, iterations=iterations,
                                      damping_num=damping_num,
                                      damping_denom=damping_denom)
    # deliberately NOT persisted: edges/degrees are reused every
    # iteration, but caching them hides their stats inside an
    # InMemoryRelation and AQE stops planning broadcast joins —
    # measured at sf0.1: no-persist 3.45s vs both-persisted 5.28s
    # median (the editdist star-mode lesson). Re-scanning the raw
    # relation per round is cheaper than losing BHJ; for long chains
    # prefer localCheckpoint (real stats) over persist.
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy(F.col("src").alias("node")) \
           .agg(F.count(F.lit(1)).alias("deg"))
    # node universe = out-nodes (== all nodes for dangling-free input)
    ranks = deg.select("node", F.lit(R0).cast("long").alias("rank"))
    base = (R0 * (damping_denom - damping_num)) // damping_denom

    for _ in range(iterations):
        contrib = (ranks.join(deg, "node")
                        .select("node", F.expr("rank div deg").alias("c"))
                        .join(e, F.col("node") == F.col("src"))
                        .groupBy(F.col("dst").alias("node"))
                        .agg(F.sum("c").alias("s")))
        # every node has an in-edge (dangling-free contract), so the
        # left join never actually nulls; coalesce documents intent
        ranks = (deg.select("node")
                 .join(contrib, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({damping_num} * coalesce(s, 0))"
                                   f" div {damping_denom}"))
                         .cast("long").alias("rank")))
    return ranks


def _pagerank_redistribute(edges: DataFrame, *, iterations: int,
                           damping_num: int,
                           damping_denom: int) -> DataFrame:
    """Dangling-aware variant: node universe src ∪ dst; each round's
    dangling mass (sum of ranks at out-degree-0 nodes) is shared
    uniformly via a 1-row aggregate crossJoined back in — broadcast
    by construction, O(nodes) extra work per round, no driver action
    inside the loop."""
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy(F.col("src").alias("node")) \
           .agg(F.count(F.lit(1)).alias("deg"))
    nodes = (e.select(F.col("src").alias("node"))
              .unionByName(e.select(F.col("dst").alias("node")))
              .distinct())
    # out-degree per node, 0 for dangling — the 0 marks rows whose
    # rank feeds the redistribution sum instead of the edge join
    degall = (nodes.join(deg, "node", "left")
                   .select("node", F.coalesce("deg", F.lit(0))
                           .cast("long").alias("deg")))
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.select("node", F.lit(R0).cast("long").alias("rank"))
    base = (R0 * (damping_denom - damping_num)) // damping_denom

    for _ in range(iterations):
        rd = ranks.join(degall, "node")
        contrib = (rd.filter(F.col("deg") > 0)
                     .select("node", F.expr("rank div deg").alias("c"))
                     .join(e, F.col("node") == F.col("src"))
                     .groupBy(F.col("dst").alias("node"))
                     .agg(F.sum("c").alias("s")))
        dmass = (rd.filter(F.col("deg") == 0)
                   .agg(F.coalesce(F.sum("rank"), F.lit(0))
                        .cast("long").alias("dmass")))
        share = (dmass.crossJoin(n_nodes)  # 1×1 rows — broadcast NLJ
                 .select(F.expr("dmass div n_nodes").alias("dshare")))
        ranks = (nodes
                 .join(contrib, "node", "left")
                 .crossJoin(share)
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({damping_num} *"
                                   f" (coalesce(s, 0) + dshare))"
                                   f" div {damping_denom}"))
                         .cast("long").alias("rank")))
    return ranks
