package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior) and range joins — operators Spark lacks as
  * primitives, composed Spark-first instead of via a custom SparkPlan.
  *
  * The as-of join uses the union-sort formulation: tag both inputs,
  * union them, and carry the last right-side row forward over a
  * (key, time) window. Cost is ONE shuffle on the key — the same
  * partitioning a sort-merge join would need — with no point-in-time
  * probe per left row and no range-duplicating blow-up. This beats both
  * the naive approach (left join all earlier rows + argmax: quadratic
  * duplication) and a custom physical operator (which would disable AQE
  * and codegen for no gain, SURVEY §7.3).
  *
  * The range join is a non-equi join against a small banding dimension,
  * broadcast so the fact side never shuffles.
  */
object AsOf {

  /** For each left row, attach the latest right row with
    * `right.timeCol <= left.timeCol` and the same key (nulls when no
    * prior right row exists). Right value columns come back prefixed. */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightValueCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns

    // side tag orders right (0) before left (1) at identical timestamps,
    // so an exactly-simultaneous right row IS visible to the left row
    // (<= semantics, matching DuckDB ASOF JOIN)
    val l = left
      .withColumn("__side", lit(1))
      .withColumns(rightValueCols.map(c => c -> lit(null)).toMap)
    val r = right
      .select((keyCol +: timeCol +: rightValueCols).map(col): _*)
      .withColumn("__side", lit(0))
      .withColumns(leftCols.filterNot(Seq(keyCol, timeCol).contains)
        .map(c => c -> lit(null)).toMap)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumns(rightValueCols.map(c =>
        s"$prefix$c" -> last(col(c), ignoreNulls = true).over(w)).toMap)

    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightValueCols.map(c => col(s"$prefix$c"))): _*)
  }

  /** Band/range join: each fact row joins the (single) band with
    * lo <= value < hi. `bands` is broadcast — the fact side keeps its
    * partitioning untouched. */
  def rangeJoin(
      facts: DataFrame,
      bands: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String): DataFrame =
    facts.join(broadcast(bands),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol),
      "left")
}
