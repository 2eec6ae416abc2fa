package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the
  * bits of two normalized sort keys so rows close in BOTH dimensions
  * land in the same file, making file-level min/max statistics prune
  * selective predicates on EITHER column. The reference (`nexus/`) has
  * no storage layout control; this is the lake-scale extension that
  * decides whether a 100 TB scan reads 100 TB or 100 GB.
  *
  * [[zorderLayout]] computes the curve and the resulting file-level
  * clustering evidence as one plan: per Z-quadrant (= prospective
  * file), the row count and the min/max rectangle of both keys. A
  * linear (single-key) sort gives tight ranges on one column and
  * full-span ranges on the other; the Z-curve gives tight-ish ranges
  * on BOTH — exactly what the output table shows, and what a writer
  * would feed into `repartitionByRange(zvalue)` before `write`.
  *
  * Exactness: keys normalize by integer arithmetic against the 1-row
  * global min/max frame (`(x−min)·2^bits DIV (max−min+1)`), the
  * interleave is pure bit algebra, and every output stat is an
  * integer — nothing floating anywhere, so the SQL twin matches
  * bit-for-bit.
  *
  * Scale shape: one columns-pruned pass for the min/max frame (1 row,
  * broadcast), one map-side projection computing z, one aggregate
  * keyed on the quadrant id (2^(2·quadBits) groups, map-side
  * combined). No global sort — the curve itself provides the
  * ordering; a writer would range-partition on `zvalue`, which
  * samples rather than sorts. */
object Layout {

  /** Interleave the low `bits` of `a` (even positions) and `b` (odd
    * positions) into a 2·bits-wide Morton key. */
  def morton(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { k =>
      shiftleft(shiftright(a, k).bitwiseAND(lit(1L)), 2 * k)
        .plus(shiftleft(shiftright(b, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_ + _)

  def zorderLayout(
      df: DataFrame,
      aCol: String,
      bCol: String,
      bits: Int = 8,
      quadBits: Int = 3): DataFrame = {
    require(bits >= quadBits && quadBits >= 1)
    val ranges = df.agg(
      min(aCol).as("__amin"), max(aCol).as("__amax"),
      min(bCol).as("__bmin"), max(bCol).as("__bmax"))
    val scale = 1L << bits
    df.join(broadcast(ranges))
      .selectExpr(aCol, bCol,
        s"(($aCol - __amin) * ${scale}L) DIV (__amax - __amin + 1) AS __na",
        s"(($bCol - __bmin) * ${scale}L) DIV (__bmax - __bmin + 1) AS __nb")
      .select(col(aCol), col(bCol),
        morton(col("__na"), col("__nb"), bits).as("zvalue"))
      .select(col(aCol), col(bCol),
        shiftright(col("zvalue"), 2 * bits - 2 * quadBits).as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(aCol).as("min_a"), max(aCol).as("max_a"),
        min(bCol).as("min_b"), max(bCol).as("max_b"))
      .orderBy("file_id")
  }

  /** DuckDB replay of [[zorderLayout]]: identical integer arithmetic,
    * bit terms unrolled the same way. */
  def zorderOracleSql(
      table: String,
      aCol: String,
      bCol: String,
      bits: Int = 8,
      quadBits: Int = 3): String = {
    val terms = (0 until bits).map { k =>
      s"((((na >> $k) & 1) << ${2 * k}) + (((nb >> $k) & 1) << ${2 * k + 1}))"
    }.mkString(" + ")
    s"""WITH r AS (
       |  SELECT min($aCol) AS amin, max($aCol) AS amax,
       |         min($bCol) AS bmin, max($bCol) AS bmax
       |  FROM $table
       |), n AS (
       |  SELECT $aCol AS a, $bCol AS b,
       |         (($aCol - amin) * ${1L << bits}) // (amax - amin + 1) AS na,
       |         (($bCol - bmin) * ${1L << bits}) // (bmax - bmin + 1) AS nb
       |  FROM $table, r
       |), z AS (
       |  SELECT a, b, ($terms) >> ${2 * bits - 2 * quadBits} AS file_id
       |  FROM n
       |)
       |SELECT file_id, count(*)::bigint AS n_rows,
       |       min(a) AS min_a, max(a) AS max_a,
       |       min(b) AS min_b, max(b) AS max_b
       |FROM z GROUP BY 1 ORDER BY file_id""".stripMargin
  }
}
