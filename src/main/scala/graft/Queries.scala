package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered correctness query: the Spark plan plus (optionally)
  * the equivalent DuckDB oracle SQL. Column names/aliases must match
  * the oracle exactly — the driver compare sorts columns by name and
  * hashes values. Floating-point aggregates are rounded on BOTH sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {
  private val defs = scala.collection.mutable.LinkedHashMap[String, QueryDef]()

  private def register(name: String, oracle: String = null)(
      fn: (SparkSession, String) => DataFrame): Unit =
    defs(name) = QueryDef(name, fn, Option(oracle))

  def all: Map[String, (SparkSession, String) => DataFrame] =
    defs.view.mapValues(_.fn).toMap

  def oracles: Map[String, String] =
    defs.values.flatMap(d => d.oracle.map(d.name -> _)).toMap

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q0_flagship_pipeline — the full core engine end-to-end (Pointy DSL →
  // stage graph → runner → conditional + sink), semantics oracled as plain
  // SQL. Exercises SURVEY §2.1 dataflow + §2.3 filter DSL + §2.5 agg.
  register(
    "q0_flagship_pipeline",
    """SELECT event_type,
      |       count(*)              AS n_events,
      |       round(sum(value), 2)  AS total_value,
      |       round(avg(value), 4)  AS avg_value
      |FROM events
      |WHERE event_type IS NOT NULL AND value >= 0
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
  ) { (s, dir) => Flagship.run(s, dir) }

  // ---------------------------------------------------------------------
  // q1_agg — TPC-H Q1-style pricing summary: group-agg with map-side
  // partial aggregation; the canonical "does groupBy shuffle correctly"
  // probe. Mirrors the reference's fixed-function rollups
  // (nexus/pipeline.py:581-625 metrics aggregation) generalized to a
  // full group-by surface (SURVEY §2.5).
  register(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2)                                   AS sum_qty,
      |       round(sum(l_extendedprice), 2)                              AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
      |       round(avg(l_quantity), 4)                                   AS avg_qty,
      |       count(*)                                                    AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }
}
