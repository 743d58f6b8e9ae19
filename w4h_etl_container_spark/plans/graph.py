"""Iterative graph analytics over the part↔supplier co-purchase graph
(SURVEY.md §2.11 extension surface) — PageRank as the representative
DataFrame-iterative algorithm (the connected-components family already
lives in operators/components.py).

The graph: one node per part (id = 2·partkey) and per supplier
(id = 2·suppkey + 1); a distinct lineitem (part, supplier) pair
contributes the edge in BOTH directions, so every node that appears has
out-degree ≥ 1 and the random walk has no dangling mass to redistribute.

Determinism across engines: ranks live in integer pico-units
(SCALE = 10^12) and every update is integer arithmetic —
``contrib = rank div outdeg``, ``rank' = (3·(SCALE div N)) div 20 +
(17·Σ contrib) div 20`` (damping 0.85 as the exact rational 17/20).
Integer sums are order-free, so the shuffle's reduction order can never
flip a hash bit — the property the e6-float contract only approximates,
made exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import read_table

PR_SCALE = 10**12
PR_ITERS = 5
PR_TOPN = 20


def _pagerank_sql() -> str:
    base = f"(3 * ((SELECT {PR_SCALE} // n FROM n)) ) // 20"
    ctes = [
        """pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)""",
        """edges AS (
      SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM pairs
    )""",
        """deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src)""",
        """n AS (SELECT COUNT(*) AS n FROM deg)""",
        f"""r0 AS (
      SELECT node, outdeg, (SELECT {PR_SCALE} // n FROM n) AS pr FROM deg
    )""",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT d.node, d.outdeg,
             {base} + (17 * COALESCE(s.acc, 0)) // 20 AS pr
      FROM deg d LEFT JOIN (
        SELECT e.dst AS node, CAST(SUM(r.pr // r.outdeg) AS BIGINT) AS acc
        FROM r{i - 1} r JOIN edges e ON e.src = r.node
        GROUP BY e.dst
      ) s ON s.node = d.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS node_id, pr AS rank_pico FROM r{PR_ITERS}
    ORDER BY pr DESC, node LIMIT {PR_TOPN}"""
    )


@register(
    "q_pagerank",
    sql=_pagerank_sql(),
    survey_ids=("EXT-GRAPH",),
    gate=False,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five damped PageRank iterations over the bipartite
    part↔supplier graph; top-20 nodes by final rank (pico-units,
    tie-break node_id).

    Spark shape: edges and degrees are built once, pre-partitioned on
    the join key and cached — each iteration is then one shuffle-free
    probe of the cached edge side plus one aggregation of the
    contribution stream (map-side combined on dst). The rank relation
    is tiny relative to edges (nodes ≪ edges), so at cluster scale the
    iteration cost is the edge-scan, not the rank join; lineage stays
    5 deep (bounded by PR_ITERS), below any checkpoint-needed
    threshold — a 50-iteration production run would localCheckpoint
    every ~10 rounds.

    The oracle unrolls the same 5 iterations as chained CTEs — possible
    only because every update is integer arithmetic (see module doc):
    the usual float-PageRank would differ across engines in the 15th
    digit by reduction order alone."""
    li = read_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    p, s = F.col("l_partkey"), F.col("l_suppkey")
    edges = (
        pairs.select((p * 2).alias("src"), (s * 2 + 1).alias("dst"))
        .unionAll(pairs.select((s * 2 + 1).alias("src"), (p * 2).alias("dst")))
        .repartition("src")
        .cache()
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumnRenamed("src", "node")
        .cache()
    )
    n = deg.count()  # scalar action; also materializes the caches
    init = PR_SCALE // n
    base = (3 * (PR_SCALE // n)) // 20
    ranks = deg.withColumn("pr", F.lit(init))
    for _ in range(PR_ITERS):
        contribs = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .select("dst", F.expr("pr div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("acc"))
        )
        ranks = (
            deg.join(contribs, deg["node"] == contribs["dst"], "left")
            .select(
                "node",
                "outdeg",
                (F.lit(base) + F.expr("(17 * coalesce(acc, 0L)) div 20")).alias("pr"),
            )
        )
    final = (
        ranks.orderBy(F.col("pr").desc(), "node")
        .limit(PR_TOPN)
        .select(F.col("node").alias("node_id"), F.col("pr").alias("rank_pico"))
        # materialize the 20-row answer, then release the iteration
        # caches — repeated calls must not accumulate cached edge RDDs
        .localCheckpoint()
    )
    edges.unpersist()
    deg.unpersist()
    return final
