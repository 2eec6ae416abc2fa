package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — PageRank, the canonical
  * "who matters in this graph" signal over entity-relationship graphs
  * (customer↔supplier, doc↔domain, user↔item). The reference models
  * relationships only implicitly (pipeline stage graphs,
  * `nexus/task.py` descriptor wiring); at corpus scale the same
  * question — rank entities by link structure — is a first-class batch
  * operator, so it lives here as a Spark plan.
  *
  * Numeric contract (what makes the whole trajectory exactly
  * replayable in another engine):
  *   - every per-edge contribution `rank/outdeg` is a double division
  *     ROUNDED TO 12dp and summed as DECIMAL(38,12) — the sum is
  *     order-independent, so shuffle/partition order can't change it;
  *   - each round's new rank is one double expression
  *     `teleport/N + damping·contrib` rounded to 12dp — pinning the
  *     state to 12dp per round keeps round k's input bit-identical in
  *     any engine that replays rounds 1..k-1.
  *
  * Scale shape: the LINK structure (edges ⋈ outdeg, the heavy,
  * data-sized frame) is partitioned on `src` ONCE and lineage-cut, so
  * every round's join re-uses its layout; only the RANK frame (|V|
  * rows, one per node) moves per round — the textbook Spark PageRank
  * partitioning discipline. Per-round state is cut with the
  * reliable-aware [[Lineage.cutLazy]] (a multi-hour loop on a real
  * cluster must not re-derive round N from source). Driver state is
  * zero — N rides as a broadcast 1-row aggregate column, never a
  * collected scalar.
  *
  * Dangling nodes (no out-edges) keep their teleport share but
  * re-distribute nothing — the standard simplified formulation (mass
  * leaks; acceptable for ranking, and exactly mirrored in the oracle).
  * Callers wanting undirected semantics pass each edge in both
  * directions, which also removes dangling nodes by construction.
  */
object Graph {

  /** PageRank over a directed edge list `(src, dst)` (long node ids,
    * parallel edges count once per occurrence — pre-`distinct` if edge
    * multiplicity should not weight the walk). Returns `(node, rank)`
    * with rank pinned to 12dp per round. */
  def pageRank(
      edges: DataFrame,
      iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")

    // ONE edge-sized materialization: the raw edge list, laid out on
    // src (often derived from an expensive upstream join — cutting here
    // also stops that work repeating across the consumers below).
    // Degrees and the node set are |V|-sized and derive FROM the cut.
    val links = Lineage.cutLocal(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
        .repartition(col("src")))
    // outdeg rides with the RANK frame (|V| rows), not the link frame:
    // the per-round heavy join then moves only rank+degree, and the
    // links build pays no edge-sized degree join
    val deg = Lineage.cutLocal(
      links.groupBy("src").agg(count(lit(1)).as("__outdeg")))

    val nodesBase = Lineage.cutLocal(
      links.select(col("src").as("node"))
        .unionByName(links.select(col("dst").as("node"))).distinct())
    // N as a broadcast 1-row aggregate column — no driver-side count job
    val nodes = nodesBase.crossJoin(
      broadcast(nodesBase.agg(count(lit(1)).cast("double").as("__n"))))

    var ranks: DataFrame =
      nodes.withColumn("rank", round(lit(1.0) / col("__n"), 12))
    for (_ <- 1 to iterations) {
      val rs = ranks.select(col("node").as("src"), col("rank"))
        .join(deg, "src") // |V|-sized ⋈ |V|-sized — cheap every round
      val contrib = links.join(rs, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(round(col("rank") / col("__outdeg"), 12)
          .cast("decimal(38,12)")).as("__contrib"))
      ranks = Lineage.cutLazy(
        nodes.join(contrib, Seq("node"), "left")
          .withColumn("rank",
            round(lit(1.0 - damping) / col("__n") +
              lit(damping) *
                coalesce(col("__contrib").cast("double"), lit(0.0)), 12))
          .drop("__contrib"))
    }
    ranks.select("node", "rank")
  }

  /** GENERATED DuckDB oracle for the aq44 gate: [[pageRank]] over the
    * undirected-doubled customer↔supplier bipartite graph (node id
    * `2·custkey` / `2·suppkey+1`), the whole trajectory unrolled — CTE
    * `r_k` replays round k's exact 12dp-pinned arithmetic, so the final
    * ranks are bit-identical, not approximately equal. The damping /
    * teleport literals are interpolated from the same doubles the Spark
    * plan uses (`Double.toString` round-trips bit-exactly). */
  def pageRankOracleSql(
      iterations: Int, damping: Double, topK: Int): String = {
    val teleport = 1.0 - damping
    val rounds = (1 to iterations).map { i =>
      s"""|, c$i AS (
          |  SELECT e.dst AS node,
          |         sum(round(r.rank / d.outdeg, 12)::decimal(38,12)) AS contrib
          |  FROM edges e
          |  JOIN r${i - 1} r ON e.src = r.node
          |  JOIN deg d ON e.src = d.src
          |  GROUP BY 1
          |), r$i AS (
          |  SELECT n.node,
          |         round($teleport::double / (SELECT n FROM nn)
          |               + $damping::double
          |                 * coalesce(c.contrib::double, 0.0::double),
          |               12) AS rank
          |  FROM nodes n LEFT JOIN c$i c USING (node)
          |)""".stripMargin
    }.mkString("\n")
    s"""|WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), edges AS (
        |  SELECT c AS src, s AS dst FROM pairs
        |  UNION ALL SELECT s AS src, c AS dst FROM pairs
        |), deg AS (SELECT src, count(*)::bigint AS outdeg FROM edges GROUP BY 1),
        |nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
        |), nn AS (SELECT count(*)::bigint AS n FROM nodes),
        |r0 AS (
        |  SELECT node, round(1.0::double / (SELECT n FROM nn), 12) AS rank
        |  FROM nodes
        |)
        |$rounds
        |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |         AS node_type,
        |       node // 2 AS key,
        |       round(rank, 10) AS rank
        |FROM r$iterations
        |ORDER BY rank DESC, node_type, key
        |LIMIT $topK""".stripMargin
  }
}
