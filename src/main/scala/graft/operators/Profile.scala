package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level data profiling — the pre-flight audit run before any
  * large training job (null rates, cardinalities, ranges per column;
  * the "ANALYZE TABLE" a curation pipeline gates ingestion on).
  *
  * ONE aggregation pass produces every column's stats simultaneously:
  * per column count/approx-free distinct/min/max, unpivoted to a
  * #columns-row result. Multiple exact COUNT(DISTINCT)s in one
  * aggregate use Spark's Expand-based plan (input replicated once per
  * distinct column) — the standard exact-profile cost, chosen over
  * per-column passes (C scans) and over approx_count_distinct (no SQL
  * twin; the aq10 trade documented the approximate variant).
  *
  * Numeric ranges report as round(double, 4); string ranges
  * lexicographically; timestamp ranges at DATE granularity (a profile
  * wants the span, and date strings print identically across engines
  * — sub-second timestamp rendering does not).
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"__nn_${f.name}"),
        countDistinct(c).as(s"__nd_${f.name}"))
      val range = f.dataType match {
        case _: NumericType => Seq(
          round(min(c).cast("double"), 4).as(s"__mn_${f.name}"),
          round(max(c).cast("double"), 4).as(s"__mx_${f.name}"))
        case TimestampType | TimestampNTZType | DateType => Seq(
          min(c).cast("date").cast("string").as(s"__ms_${f.name}"),
          max(c).cast("date").cast("string").as(s"__xs_${f.name}"))
        case _ => Seq(
          min(c.cast("string")).as(s"__ms_${f.name}"),
          max(c.cast("string")).as(s"__xs_${f.name}"))
      }
      base ++ range
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.map { f =>
      val numeric = f.dataType.isInstanceOf[NumericType]
      struct(
        lit(f.name).as("col_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"__nn_${f.name}")).as("n_null"),
        col(s"__nd_${f.name}").as("n_distinct"),
        (if (numeric) col(s"__mn_${f.name}")
         else lit(null).cast("double")).as("min_num"),
        (if (numeric) col(s"__mx_${f.name}")
         else lit(null).cast("double")).as("max_num"),
        (if (numeric) lit(null).cast("string")
         else col(s"__ms_${f.name}")).as("min_str"),
        (if (numeric) lit(null).cast("string")
         else col(s"__xs_${f.name}")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }

  /** DuckDB replay: one UNION ALL arm per column. `cols` carries
    * (name, kind) with kind ∈ num | ts | str. */
  def oracleSql(table: String, cols: Seq[(String, String)]): String =
    cols.map { case (name, kind) =>
      val (mn, mx, ms, xs) = kind match {
        case "num" => (s"round(min($name)::double, 4)",
          s"round(max($name)::double, 4)",
          "NULL::varchar", "NULL::varchar")
        case "ts" => ("NULL::double", "NULL::double",
          s"min($name)::date::varchar", s"max($name)::date::varchar")
        case _ => ("NULL::double", "NULL::double",
          s"min($name::varchar)", s"max($name::varchar)")
      }
      s"""SELECT '$name' AS col_name, count(*)::bigint AS n_rows,
         |  (count(*) - count($name))::bigint AS n_null,
         |  count(DISTINCT $name)::bigint AS n_distinct,
         |  $mn AS min_num, $mx AS max_num,
         |  $ms AS min_str, $xs AS max_str
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
}
