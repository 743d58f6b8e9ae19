"""Connected components over near-duplicate candidate pairs — the final
stage of every corpus-scale dedup pipeline (SURVEY.md §2.11).

Candidate generators (``minhash_candidates``, ``embedding_neardup``,
``ngram_jaccard``) emit PAIRS, but removal needs CLUSTERS: if A~B and
B~C, then {A, B, C} is one duplicate group and exactly one survivor may
be kept. That grouping is connected components on the pair graph.

Engine shape — ADAPTIVE, like Spark's own broadcast-vs-shuffle join
selection: the symmetrized edge list is checkpointed first, and when it
fits a broadcast-sized cap the labels come from one driver union-find
over it (the pair graph is a small derived table — docs that collided
in some LSH bucket — not the corpus); past the cap, iterative min-label
propagation in pure DataFrame ops:

* state is one (vertex, label) table, label = smallest doc_id reached
  so far; each round joins the symmetrized edge list to the labels,
  takes the min label over each vertex's neighborhood plus itself, and
  stops when the global label sum stops falling.
* Convergence detection costs ONE scalar aggregate per round (the label
  sum is monotone non-increasing and strictly decreases until the fixed
  point) — no change-count join, no driver-side diffing of label
  tables.
* Every round does neighborhood-min HOOKING; rounds past
  ``shortcut_after`` additionally pointer-jump (label ← label of
  label — the classic Shiloach-Vishkin / hash-to-min SHORTCUT; cf.
  Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC 2014), which roughly halves distance-to-minimum per round on
  top of the hook's hop. Near-dup components are bucket overlaps —
  near-cliques with diameters of 2-4 — so the common path converges
  inside the hook-only prefix and never pays the shortcut's extra
  self-join shuffle (measured: always-on jumping cost +60% on the
  fixture pipeline for zero round savings). A path-shaped component
  of diameter d converges in ~shortcut_after + log₂ d rounds (pinned
  by a 101-vertex path test under a 12-round budget), so
  ``max_rounds=20`` covers diameters past 10⁴. The jump stays exact:
  label values are vertex ids with l(x) ≤ x, so jumping only lowers
  labels and never leaves the component.
* Each round's state is ``localCheckpoint``-ed, which truncates the
  logical plan. This is load-bearing, not hygiene: the round body
  references ``labels`` twice (message join + union), so without
  truncation the plan TREE doubles every round — 2^rounds analyzer
  copies, measured as a driver OOM on a 15-edge path graph by round 11.
  Caching alone does not help (InMemoryRelation reuse happens at the
  physical level; Catalyst still walks the exponential logical tree).
  On a multi-executor cluster swap ``localCheckpoint`` for reliable
  ``checkpoint`` (HDFS/S3-backed) — same call site, same plan shape.

At 100 TB the label table is |V| rows (only documents that appear in
some candidate pair — a small fraction of the corpus) and each round is
two shuffles on that table (hook agg + shortcut join); the edge list is
shuffled once per round on src. The full alternating large-star /
small-star edge-rewiring variant (Kiveris et al.) additionally shrinks
the EDGE list each round — worth it only when the edge list itself
dwarfs memory; the label-side shortcut already delivers the O(log d)
round bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_rounds: int = 20,
    shortcut_after: int = 3,
    driver_edge_cap: int = 200_000,
    edges_dwarf_memory: bool = False,
) -> DataFrame:
    """Cluster an undirected pair list into connected components.

    ``pairs``: two integer columns (first = one endpoint, second = the
    other; column names are taken positionally so the candidate
    generators' (doc_a, doc_b) output plugs in directly).

    ``shortcut_after``: rounds of plain min-label propagation before
    pointer-jumping turns on (see module docstring — shallow graphs
    converge before paying for it; deep graphs get O(log d) rounds).

    ``driver_edge_cap``: adaptive strategy selection, the same move AQE
    makes for broadcast-vs-shuffle joins. The candidate-pair graph is a
    small DERIVED table (docs that collided in some LSH bucket), often
    orders of magnitude smaller than the corpus; when the symmetrized
    edge list — already materialized by the checkpoint — fits the cap
    (≈ a few MB, broadcast-table-sized), a driver-side union-find with
    path compression replaces the iterative job rounds: identical
    labels (parity-pinned in tests), none of the per-round scheduling
    latency. Above the cap the distributed loop runs unchanged; pass
    ``0`` to force it.

    ``edges_dwarf_memory``: selects the Kiveris alternating
    large-star/small-star edge-rewriting variant instead of the
    label-propagation loop (see ``_edge_rewrite_cc``). Use when the EDGE
    list itself dwarfs executor memory — the boilerplate-heavy
    web-corpus case where per-round full-size edge shuffles are the
    bottleneck: edge rewriting strictly shrinks the edge list round
    over round, while label propagation re-shuffles all |E| rows every
    round. Identical labels (parity-pinned); activation bound: prefer
    it once |E| exceeds roughly what one round's shuffle can hold
    in memory across the cluster (|E|·16 bytes vs aggregate shuffle
    memory); below that the label loop's fixed two-shuffle round is
    cheaper.

    Returns (doc_id, cluster_id) — one row per distinct vertex,
    cluster_id = the smallest doc_id in its component (a deterministic,
    engine-neutral canonical choice).
    """
    a, b = pairs.columns[0], pairs.columns[1]
    if edges_dwarf_memory:
        return _edge_rewrite_cc(pairs, max_rounds)
    # Symmetrize once: each round's neighborhood min must see both
    # directions. union + distinct is one exchange, paid once, outside
    # the loop.
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint()

    if driver_edge_cap:
        # ONE capped collect decides the strategy AND delivers the edge
        # list (r17 — was a count job then a collect job): limit(cap+1)
        # returns at most cap+1 rows off the checkpointed partitions, so
        # len <= cap means we already hold the complete edge set, and
        # len == cap+1 proves the graph is over the cap without ever
        # collecting an unbounded amount to the driver.
        head = edges.limit(driver_edge_cap + 1).collect()
        if len(head) <= driver_edge_cap:
            # a driver-built LocalRelation is already materialized and
            # its row count is driver knowledge — consumers
            # (dedup_survivors) skip their checkpoint + count jobs (r17)
            return _driver_cc(pairs.sparkSession, head)

    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("l"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("l")).collect()[0][0]

    for rnd in range(max_rounds):
        # HOOK — min over {own label} ∪ {neighbors' labels}: one join on
        # the propagation side, one union, one hash-agg shuffle on v.
        msgs = edges.join(labels, edges.src == labels.v).select(
            F.col("dst").alias("v"), "l"
        )
        labels = msgs.unionByName(labels).groupBy("v").agg(F.min("l").alias("l"))
        if rnd >= shortcut_after:
            # SHORTCUT — pointer jump l ← l(l): every label value is
            # itself a vertex id present in the table, and l(x) ≤ x (own
            # id is always in x's min), so the jump only ever lowers a
            # label and roughly halves each vertex's label-chain distance
            # to the component minimum. The left join + coalesce is
            # belt-and-braces for the invariant that l is a known vertex.
            parent = labels.select(F.col("v").alias("_pv"), F.col("l").alias("_pl"))
            labels = labels.join(parent, labels.l == parent._pv, "left").select(
                "v", F.least("l", F.coalesce("_pl", "l")).alias("l")
            )
        # Lazy localCheckpoint + the convergence sum = ONE Spark job per
        # round: the sum action is what materializes the checkpoint, so
        # the round isn't computed twice, and lineage still truncates
        # (see module docstring — without it the plan tree is 2^rounds).
        labels = labels.localCheckpoint(eager=False)
        new_sum = labels.agg(F.sum("l")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("v").alias("doc_id"), F.col("l").alias("cluster_id"))


def _driver_cc(spark, edge_rows) -> DataFrame:
    """Union-find with path compression over a collected edge list —
    the small-graph strategy of ``connected_components`` (same labels:
    cluster_id = component-minimum vertex id)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in edge_rows:
        s, d = row[0], row[1]
        for v in (s, d):
            if v not in parent:
                parent[v] = v
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)  # root = smaller id
    # root chosen as the min at every union step ⇒ find(v) IS the
    # component minimum once all edges are processed
    labels = [(v, find(v)) for v in parent]
    # a TRUE LocalRelation (r18 — createDataFrame parallelizes into a
    # LogicalRDD whose every broadcast build costs a
    # defaultParallelism-task job; see operators/localrel): the loser
    # filter folds driver-side and the corpus anti-join's broadcast
    # build runs zero Spark jobs
    from pyspark.sql import types as T

    from w4h_etl_container_spark.operators.localrel import local_df

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("cluster_id", T.LongType()),
        ]
    )
    out = local_df(spark, labels, schema)
    if out is None:
        out = spark.createDataFrame(labels, "doc_id: long, cluster_id: long")
    # driver knowledge riding along: the label count, so downstream
    # consumers never pay a Spark job to re-learn it (r17)
    out._local_label_rows = len(labels)  # type: ignore[attr-defined]
    return out


def _edge_rewrite_cc(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Kiveris et al. two-phase connected components ("Connected
    Components in MapReduce and Beyond", SoCC 2014): alternate
    LARGE-STAR (every node hooks its larger neighbors to the minimum of
    its closed neighborhood) and SMALL-STAR (every node hooks its
    smaller neighbors and itself to the minimum of its small
    neighborhood) until the edge set is a star forest — each component
    one root (its minimum vertex) with direct spokes.

    Why a second strategy exists: the label-propagation loop shuffles
    the FULL edge list once per round, fine while |E| fits the
    cluster's shuffle comfortably. Here the edge list itself is the
    state and it strictly shrinks — duplicate edges collapse in the
    per-round ``distinct`` and every rewrite points spokes at
    ever-smaller hubs — with O(log² n) round convergence proven in the
    paper. Per round: two hash-agg shuffles (the per-node minima) and
    two joins that AQE sizes off the shrinking edge list.

    Implementation notes:
    * edges are canonicalized (u < v) so LARGE-STAR's "larger
      neighbors" is the v side of ``sym`` and SMALL-STAR needs no
      symmetrize at all — it groups the canonical list by its larger
      endpoint directly;
    * convergence = (count, Σ xxhash64(u,v)) fixed across one full
      round — one scalar aggregate over the checkpointed new edge
      list, the same one-job-per-round discipline as the label loop;
    * labels come from a min-aggregate over the final star edges, so a
      not-quite-converged forest under ``max_rounds`` degrades to a
      safe (still-correct-per-edge) approximation rather than garbage;
    * vertices whose only pair was a self-loop never enter the rewrite
      (self-loops carry no connectivity) and are restored as their own
      singleton clusters at the end — exact parity with the label
      loop's vertex set.
    """
    a, b = pairs.columns[0], pairs.columns[1]
    verts = (
        pairs.select(F.col(a).alias("doc_id"))
        .unionByName(pairs.select(F.col(b).alias("doc_id")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        pairs.select(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def stats(df: DataFrame) -> tuple:
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI arithmetic
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    prev = stats(e)
    for _ in range(max_rounds):
        # LARGE-STAR: symmetrize, per-node minimum over the closed
        # neighborhood, hook every LARGER neighbor to it. m ≤ u < v so
        # the emitted (m, v) is already canonical.
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), "v")
            .distinct()
        )
        # SMALL-STAR over the canonical list: group by the LARGER
        # endpoint v; neighbors u are all smaller, so the closed-small-
        # neighborhood minimum is just min(u). Hook each small neighbor
        # and v itself to it.
        mins2 = ls.groupBy("v").agg(F.min("u").alias("m"))
        joined = ls.join(mins2, "v")
        spokes = joined.where(F.col("u") != F.col("m")).select(
            F.col("m").alias("u"), F.col("u").alias("v")
        )
        hubs = joined.select(F.col("m").alias("u"), "v")
        e2 = spokes.unionByName(hubs).distinct().localCheckpoint(eager=False)
        cur = stats(e2)  # materializes the lazy checkpoint — one job
        e = e2
        if cur == prev:
            break
        prev = cur
    star = e.select(F.col("v").alias("doc_id"), F.col("u").alias("cluster_id")).unionByName(
        e.select(F.col("u").alias("doc_id"), F.col("u").alias("cluster_id"))
    )
    labels = star.groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))
    return verts.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    key: str = "doc_id",
    prefer: str | None = None,
    broadcast_cap: int = 4_000_000,
) -> DataFrame:
    """Full near-dedup resolution: candidate pairs → components → keep
    exactly one document per duplicate cluster plus every document that
    appears in no pair.

    Survivor policy: by default the smallest ``key`` (pure graph data —
    no doc lookup needed). With ``prefer`` = a numeric column name, the
    cluster keeps its max-``prefer`` member instead (ties to the
    smallest key) — the quality-aware choice a real pipeline wants
    ("keep the longest / highest-scoring copy, drop the rest"), at the
    cost of one extra join to fetch the column for the clustered
    subset.

    Returns ``docs`` filtered to survivors — the "deduplicated corpus"
    a training-data pipeline writes out. The anti-join side is the
    LOSER set (paired docs minus one survivor per cluster). Whether
    that side is broadcast is NOT assumed: web-corpus duplicate rates
    run 30-50%, so the loser set is O(corpus) in the worst case and a
    forced broadcast hint would OOM the driver at that size. Instead
    the clustered-vertex count — one cheap scan of the already
    materialized component table — gates the hint: at or under
    ``broadcast_cap`` vertices (≈ tens of MB of longs, the common
    LSH-candidate case) the corpus scan gets the broadcast anti-join
    and never shuffles; above it the hint is dropped and the join
    plans as a shuffle join, with AQE still free to demote it to a
    broadcast at runtime if the post-filter loser set turns out small.
    Pass ``broadcast_cap=0`` to never hint.
    """
    cc = connected_components(pairs)
    n_local = getattr(cc, "_local_label_rows", None)
    if n_local is None:
        # iterative result: checkpoint so the component computation is
        # never re-evaluated, one scalar job learns the size
        cc = cc.localCheckpoint()
        clustered_small = broadcast_cap > 0 and cc.count() <= broadcast_cap
    else:
        # driver union-find result: a LocalRelation — already
        # materialized (re-use costs a plan-embedded local scan, no
        # recompute) and its size is driver knowledge; the checkpoint
        # and count jobs would be pure scheduling overhead (r17)
        clustered_small = broadcast_cap > 0 and n_local <= broadcast_cap
    hint = F.broadcast if clustered_small else (lambda df: df)
    if prefer is None:
        losers = cc.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    else:
        # join the cluster table (|V| rows — the docs that collided in
        # some candidate bucket), never the full corpus; broadcast only
        # when the gate says it fits
        scored = docs.select(F.col(key).alias("doc_id"), prefer).join(
            hint(cc), "doc_id"
        )
        # arg-max per cluster with a deterministic (score desc, id asc)
        # tie-break: max_by over a packed struct — one aggregate pass
        best = scored.groupBy("cluster_id").agg(
            F.expr(f"min_by(doc_id, struct(-{prefer} AS s, doc_id AS d))").alias("keep_id")
        )
        losers = scored.join(
            best, scored.cluster_id == best.cluster_id, "inner"
        ).where(F.col("doc_id") != F.col("keep_id")).select("doc_id")
    return docs.join(
        hint(losers.withColumnRenamed("doc_id", key)), on=key, how="left_anti"
    )
