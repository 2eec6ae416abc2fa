package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** One referential-integrity / coverage check: does every non-null
    * `childKey` in `child` resolve against `parentKey` in `parent`?
    * `broadcastParent` marks dimension-sized parents (the usual case);
    * a fact-sized parent keeps the shuffled join. */
  final case class FkCheck(
      name: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      broadcastParent: Boolean = true)

  /** Referential-integrity audit — the dbt-style relationship tests a
    * lake runs before training jobs consume a snapshot, as ONE
    * distributed plan instead of N scripted queries. Each check yields
    * one row: `(relation, child_rows, null_keys, orphan_rows,
    * orphan_keys, ok)`. NULL child keys are counted but are NOT
    * violations (SQL FK semantics); `ok` means zero orphans. Coverage
    * checks (parent → child direction, "every customer has activity")
    * are just checks whose `child` is the dimension.
    *
    * Scale shape per check: the parent collapses to DISTINCT keys
    * first (dimension-sized after dedup), broadcasts when flagged, and
    * the child streams through one left join + one 1-row aggregate —
    * the child NEVER shuffles when the parent broadcasts. Checks are
    * independent 1-row plans unioned at the end, so Spark schedules
    * them concurrently; a 100 TB fact table is scanned once per check
    * it appears in, with only the key column read (column pruning). */
  def integrityAudit(checks: Seq[FkCheck]): DataFrame = {
    require(checks.nonEmpty)
    val rows = checks.map { c =>
      val pk = c.parent.select(col(c.parentKey).as("__pk")).distinct()
      val pkSide = if (c.broadcastParent) broadcast(pk) else pk
      val k = col(c.childKey)
      val orphan = k.isNotNull && col("__pk").isNull
      c.child.select(k)
        .join(pkSide, k === col("__pk"), "left")
        .agg(
          count(lit(1)).as("child_rows"),
          count(when(k.isNull, lit(1))).as("null_keys"),
          count(when(orphan, lit(1))).as("orphan_rows"),
          countDistinct(when(orphan, k)).as("orphan_keys"))
        .select(lit(c.name).as("relation"), col("child_rows"),
          col("null_keys"), col("orphan_rows"), col("orphan_keys"),
          (col("orphan_rows") === 0).as("ok"))
    }
    rows.reduce(_.unionByName(_)).orderBy("relation")
  }

  /** One declared data expectation: a named row-level predicate that
    * should hold on every row of `df` (the dbt-test / Delta-constraint
    * shape). `violation` marks the BAD rows; NULL evaluations count as
    * violations too unless the predicate handles them — expectations
    * are about what provably holds. */
  final case class Expectation(
      name: String,
      df: DataFrame,
      violation: org.apache.spark.sql.Column)

  /** Declarative expectations audit — the dbt-tests / Delta CHECK
    * report: every named predicate sweeps its table in ONE aggregate
    * (map-side partials, no joins unless the caller's predicate frame
    * embeds one) and the result is the |rules|-row pass/fail table a
    * pipeline gates promotion on. [[integrityAudit]] covers the
    * referential rules; THIS covers everything row-local (not-null,
    * ranges, accepted values, format). Returns
    * `(rule, n_checked, n_violations, ok)` per expectation. */
  def expectations(checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty)
    checks.map { c =>
      c.df.agg(
        count(lit(1)).as("n_checked"),
        count(when(coalesce(c.violation, lit(true)), lit(1)))
          .as("n_violations"))
        .select(lit(c.name).as("rule"), col("n_checked"),
          col("n_violations"), (col("n_violations") === 0L).as("ok"))
    }.reduce(_.unionByName(_)).orderBy("rule")
  }

  /** DuckDB replay: one UNION ALL arm per check, same left-join + agg
    * shape. `rels` carries (name, childTable, childKey, parentTable,
    * parentKey). */
  def integrityOracleSql(
      rels: Seq[(String, String, String, String, String)]): String =
    rels.map { case (name, ct, ck, pt, pk) =>
      s"""SELECT '$name' AS relation,
         |  count(*)::bigint AS child_rows,
         |  count(*) FILTER ($ck IS NULL)::bigint AS null_keys,
         |  count(*) FILTER ($ck IS NOT NULL AND __p.__pk IS NULL)::bigint
         |    AS orphan_rows,
         |  count(DISTINCT $ck)
         |    FILTER ($ck IS NOT NULL AND __p.__pk IS NULL)::bigint
         |    AS orphan_keys,
         |  count(*) FILTER ($ck IS NOT NULL AND __p.__pk IS NULL) = 0 AS ok
         |FROM $ct LEFT JOIN
         |  (SELECT DISTINCT $pk AS __pk FROM $pt) __p ON $ct.$ck = __p.__pk
         |""".stripMargin
    }.mkString("", "UNION ALL\n", "ORDER BY relation")

  /** k-anonymity risk audit: quasi-identifier combinations shared by
    * FEWER than `k` records — the groups whose members a release would
    * expose to re-identification (Sweeney 2002; the privacy
    * counterpart of the PII scrub: scrubbing direct identifiers does
    * nothing when (lang, source, length-band) alone pins a person).
    * Returns the risky groups `(qid..., n)`; an empty result means the
    * projection is k-anonymous.
    *
    * Scale shape: one aggregate on the QID tuple with map-side
    * partials + the n<k filter — no joins, no windows; output is
    * bounded by the rare-combination count, which is exactly what the
    * audit is after. */
  def kAnonymityRisk(
      df: DataFrame, qidCols: Seq[String], k: Long): DataFrame = {
    require(qidCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k < 2 makes every record trivially anonymous")
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy(qidCols.map(col): _*)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the release
    * gate one notch above [[kAnonymityRisk]]: k-anonymity bounds
    * group SIZE, but a group whose sensitive attribute is uniform
    * still leaks it (the homogeneity attack). Per quasi-identifier
    * group this reports BOTH standard instantiations: distinct
    * l-diversity (≥ l distinct sensitive values) and entropy
    * l-diversity (entropy of the sensitive distribution ≥ ln l — a
    * group of 99% one value + 1% noise passes distinct-l and fails
    * here).
    *
    * Determinism contract: counts are exact; each entropy term
    * −p·ln p (p = exact-count ratio, one fixed-order double) rounds
    * to 10dp and DECIMAL-sums (value order differs between engines);
    * the entropy readout pins at 6dp; the verdict booleans compare
    * against ln(l) rounded identically.
    *
    * Scale shape: one (QI, sensitive) count aggregate + one QI-level
    * roll-up — map-side partials, output |QI groups| rows. Returns
    * `(qi..., n, n_sensitive, entropy_nats, distinct_ok,
    * entropy_ok)`. */
  def lDiversity(
      df: DataFrame,
      qidCols: Seq[String],
      sensitiveCol: String,
      l: Int): DataFrame = {
    require(qidCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2, "l < 2 makes every group trivially diverse")
    val qi = qidCols.map(col)
    val cells = df
      .groupBy(qi :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val withP = cells
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(qidCols.map(col): _*)))
      .withColumn("__p", col("__c").cast("double") / col("__n"))
      .withColumn("__e",
        round(-col("__p") * log(col("__p")), 10).cast("decimal(28,10)"))
    val lnL = math.log(l.toDouble)
    withP
      .groupBy(qi: _*)
      .agg(max(col("__n")).as("n"),
        count(lit(1)).as("n_sensitive"),
        Readout.pin(sum(col("__e")).cast("double"), 6)
          .as("entropy_nats"))
      .withColumn("distinct_ok", col("n_sensitive") >= l.toLong)
      .withColumn("entropy_ok", col("entropy_nats") >= lit(
        java.math.BigDecimal.valueOf(lnL)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
      .orderBy(qi: _*)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the notch
    * above [[lDiversity]]: a group can be diverse yet still leak by
    * DIVERGING from the population (a group that is 80% one language
    * in a 10%-language corpus identifies its members' language with
    * high confidence even at l = 5). Per quasi-identifier group this
    * reports the total-variation distance between the group's
    * sensitive-value distribution and the GLOBAL one —
    * ½ Σ_v |p_g(v) − p(v)|, the canonical categorical instantiation
    * of the paper's EMD — with the ok verdict at threshold `t`.
    *
    * Determinism contract: both distributions are exact-count ratios;
    * each |p_g − p| term is one fixed-order double rounded to 10dp
    * and DECIMAL-summed; the ×½ readout pins at 6dp. Values ABSENT
    * from a group still contribute their global mass (the left join's
    * zero arm) — dropping them would understate the distance exactly
    * for the most skewed groups.
    *
    * Scale shape: one (QI, sensitive) count + one global sensitive
    * count (broadcast, |values| rows); the (QI group × value) grid is
    * dimension-sized. Returns `(qi..., n, tvd, ok)`. */
  def tCloseness(
      df: DataFrame,
      qidCols: Seq[String],
      sensitiveCol: String,
      t: Double): DataFrame = {
    require(qidCols.nonEmpty, "need at least one quasi-identifier")
    require(t > 0.0 && t < 1.0, "t must be in (0, 1)")
    val qi = qidCols.map(col)
    val cells = df
      .groupBy(qi :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    // global distribution and group sizes both derive FROM the cells
    // frame (sum of exact cell counts == count(*)) — two dimension-
    // sized aggregates instead of two more full-table scans
    val cellsCut = Lineage.cutLocal(cells)
    val global = broadcast(cellsCut
      .groupBy("__s").agg(sum(col("__c")).as("__gc"))
      .crossJoin(broadcast(
        cellsCut.agg(sum(col("__c")).cast("double").as("__gn")))))
    val groups = cellsCut.groupBy(qi: _*).agg(sum(col("__c")).as("n"))
    // full (group × value) grid: absent values keep their global mass
    groups
      .crossJoin(global)
      .join(cellsCut, qidCols :+ "__s", "left")
      .withColumn("__term", round(
        abs(coalesce(col("__c"), lit(0L)).cast("double") / col("n") -
          col("__gc").cast("double") / col("__gn")), 10)
        .cast("decimal(28,10)"))
      .groupBy(qi :+ col("n"): _*)
      // decimal sum exact, ONE double halving (never a decimal
      // division — engine promotion rules differ), pinned readout
      .agg(Readout.pin(
        sum(col("__term")).cast("double") / 2.0, 6).as("tvd"))
      .withColumn("ok", col("tvd") <= t)
      .orderBy(qi: _*)
  }

  /** Equi-width histogram of a numeric column — the distribution
    * companion to [[profile]]'s scalar ranges (and the shape a query
    * optimizer's column statistics store): `nBins` equal-width buckets
    * between the column's min and max, one row per NON-EMPTY bucket
    * with its edges and count. NULLs are excluded; the max value lands
    * in the last bucket (half-open bins, closed at the top end); a
    * constant column degenerates to one bucket. NULLs AND NaNs are
    * excluded — Spark orders NaN above every double, so one NaN in
    * min/max would otherwise poison the width and silently collapse
    * the whole histogram into the last bucket.
    *
    * Determinism contract: bin width and bin index are single double
    * expressions (`(max-min)/nBins`, `floor((x-min)/width)`) — the
    * same IEEE operations in any engine, so bucket assignment agrees
    * bit-for-bit, including values sitting exactly on an edge.
    *
    * Scale shape: one broadcast 1-row min/max aggregate, then ONE
    * count aggregate over ≤nBins keys with map-side partials — two
    * scans, zero data-sized shuffles (the second scan streams into
    * ≤nBins partial counters). */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    val vals = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val bounds = broadcast(vals.agg(
      min("__v").as("__lo"), max("__v").as("__hi")))
    vals.crossJoin(bounds)
      .withColumn("__w", (col("__hi") - col("__lo")) / lit(nBins))
      .withColumn("bin",
        when(col("__w") === 0.0, lit(0L)).otherwise(
          least(floor((col("__v") - col("__lo")) / col("__w")),
            lit(nBins - 1L))).cast("long"))
      .groupBy("bin")
      .agg(
        round(first(col("__lo")) + col("bin") * first(col("__w")), 6)
          .as("bin_lo"),
        round(first(col("__lo")) + (col("bin") + 1) * first(col("__w")), 6)
          .as("bin_hi"),
        count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** Benford first-digit audit (Newcomb 1881; Benford 1938) — the
    * classic fabricated-numbers screen for financial/metric columns:
    * observed leading-digit counts against the Benford expectation
    * `p(d) = log₁₀(1 + 1/d)`, with per-digit χ² contributions and the
    * total χ² statistic (8 dof; > 15.5 ⇒ suspicious at 5%).
    *
    * Determinism contract: the leading digit comes from the BIGINT
    * floor of the value rendered as a string (both engines print
    * plain digits — no float formatting, no libm log10 on data); the
    * nine `p(d)` literals are Scala doubles embedded in both plans
    * (`Double.toString` round-trips); χ² terms are fixed-order double
    * expressions rounded to 6dp and DECIMAL-summed for the total
    * (the tq8 discipline). Values < 1 are excluded (no leading
    * digit).
    *
    * Scale shape: one map-side-combined 9-bucket aggregate over the
    * value column, then 9-row bounded arithmetic with a broadcast
    * 1-row total — nothing else touches the data. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = broadcast(
      (1 to 9).map(d => (d, math.log10(1.0 + 1.0 / d)))
        .toDF("digit", "p_expected"))
    val counts = df
      .select(substring(floor(col(valueCol)).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val joined = expected.join(counts, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(
        counts.agg(sum(col("n_obs")).cast("double").as("__total"))))
    val nExp = col("__total") * col("p_expected")
    val terms = joined
      .select(col("digit"), col("n_obs"),
        round(nExp, 2).as("n_expected"),
        round((col("n_obs") - nExp) * (col("n_obs") - nExp) / nExp, 6)
          .as("chi2_term"))
    // total χ² via a broadcast 1-row decimal sum, not a no-partition
    // window (9 rows, but the single-partition window shape is banned
    // on principle — and WindowExec warns on it)
    terms
      .crossJoin(broadcast(terms.agg(
        round(sum(col("chi2_term").cast("decimal(18,6)")), 6)
          .cast("double").as("chi2_total"))))
      .orderBy("digit")
  }

  /** Gini concentration per group (Gini 1912, rank formulation) — the
    * inequality audit for revenue/volume/corpus-share columns: how
    * concentrated is group g's total across its members?
    * `G = (2·Σ rankᵢ·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)` over members ranked
    * ascending by value — 0 = perfectly even, →1 = one member holds
    * everything. (The same statistic over source→token counts is the
    * corpus-diversity number a training-data mix review asks for.)
    *
    * Determinism contract: values are exact integers (e.g. cents);
    * ranks come from the packed key `x·10⁸ + id` through
    * [[Packing.groupedRank]] (unique, both engines sort identically;
    * requires `0 ≤ id < 10⁸`); both sums run as DECIMAL(38,0) so no
    * overflow; the final statistic is ONE division of two
    * exactly-representable (< 2⁵³) doubles, identical in any engine.
    *
    * Scale shape: one groupedRank pass (range-partition prefix-sum —
    * NO per-group sort window), one grouped aggregate. Returns
    * `(group, n_members, total, gini)`. */
  def giniConcentration(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String): DataFrame = {
    val packed = df.select(col(groupCol), col(idCol),
      col(valueCol).cast("long").as("__x"),
      (col(valueCol).cast("long") * lit(100000000L) +
        col(idCol).cast("long")).as("__pack"))
    Packing.groupedRank(packed, groupCol, "__pack", carryCols = Seq("__x"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_members"),
        sum(col("__x")).as("total"),
        expr("sum(cast(rank as decimal(38,0)) * __x)").as("__s1"),
        expr("sum(cast(__x as decimal(38,0)))").as("__s0"))
      .select(col(groupCol), col("n_members"), col("total"),
        // an all-zero group has no defined concentration — and ANSI
        // mode THROWS on the double division by zero it would hit
        when(col("__s0") > 0, round(
          (lit(2) * col("__s1") - (col("n_members") + 1) * col("__s0"))
            .cast("double") /
            (col("n_members") * col("__s0")).cast("double"), 6))
          .as("gini"))
      .orderBy(groupCol)
  }

  /** Hamilton largest-remainder apportionment (Hamilton 1792; the
    * quota method) — allocate an integer budget (sample quota, shard
    * count, seat total) across groups proportionally to integer
    * weights, EXACTLY: base share `⌊seats·wᵢ/W⌋` plus one extra seat
    * to the `seats − Σbase` largest remainders (ties broken on the
    * key). Σ output seats == `seats` identically — the property
    * floor-only or rounded allocation violates.
    *
    * Determinism contract: pure integer arithmetic (products, floor
    * div, mod — weights must sum positive and `seats·wᵢ` must fit a
    * long); the remainder rank is unique via the key tie-break.
    *
    * Scale shape: one grouped-weight aggregate feeds a GROUPS-sized
    * frame; the remainder rank is a dimension-sized window (the aq20
    * reasoning — groups are nations/sources, never data rows).
    * Returns `(key, weight, seats)`. */
  def apportion(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      seats: Long): DataFrame = {
    require(seats >= 0, "seats must be non-negative")
    // weights must be non-negative (a negative quota is meaningless and
    // corrupts the remainder rank), must sum POSITIVE (W = 0 would
    // hit `__qn div __W` as an ANSI divide-by-zero with no context),
    // and seats·weight must fit a long (ANSI's checked multiply throws
    // but names neither the key nor the operation). All three guards
    // ride the row path as raise_error — unprunable, one comparison
    // per (dimension-sized) row.
    val w = df.select(col(keyCol).as("key"),
      when(col(weightCol) < 0, raise_error(concat(
          lit(s"apportion: negative weight for key "), col(keyCol))))
        .otherwise(col(weightCol)).cast("long").as("weight"))
    val qn = if (seats == 0L) col("weight") * seats
      else when(col("weight") > lit(Long.MaxValue / seats),
        raise_error(concat(
          lit(s"apportion: seats * weight overflows a long " +
            s"(seats = $seats, weight = "),
          col("weight"), lit(") for key "), col("key"))))
        .otherwise(col("weight") * seats)
    val based = w
      .crossJoin(broadcast(w.agg(
        when(coalesce(sum("weight"), lit(0L)) <= 0L, raise_error(lit(
            "apportion: total weight must be positive (all weights are " +
              "zero, or the frame is empty)")))
          .otherwise(sum("weight")).as("__W"))))
      .withColumn("__qn", qn)
      .withColumn("__base", expr("__qn div __W"))
      .withColumn("__rem", expr("__qn % __W"))
    val ranked = based
      .crossJoin(broadcast(based.agg(
        (lit(seats) - sum("__base")).as("__leftover"))))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col("key"))))
    ranked.select(col("key"), col("weight"),
        (col("__base") + when(col("__rk") <= col("__leftover"), 1L)
          .otherwise(0L)).as("seats"))
      .orderBy("key")
  }

  /** GENERATED DuckDB oracle for [[benfordAudit]]: the same digit
    * extraction, the same nine embedded `p(d)` literals, the same
    * fixed-order χ² arithmetic. `valueExpr` is the value column
    * expression over `table`. */
  def benfordOracleSql(table: String, valueExpr: String): String = {
    val values = (1 to 9)
      .map(d => s"($d, ${math.log10(1.0 + 1.0 / d)})").mkString(", ")
    s"""|WITH v AS (
        |  SELECT substr(CAST(CAST(floor($valueExpr) AS BIGINT) AS VARCHAR),
        |                1, 1)::int AS digit
        |  FROM $table
        |), d AS (
        |  SELECT digit, count(*)::bigint AS n_obs FROM v
        |  WHERE digit BETWEEN 1 AND 9 GROUP BY 1
        |), e(digit, p_expected) AS (VALUES $values),
        |tot AS (SELECT sum(n_obs)::double AS total FROM d),
        |t AS (
        |  SELECT e.digit, coalesce(d.n_obs, 0)::bigint AS n_obs,
        |         round((SELECT total FROM tot) * e.p_expected, 2)
        |           AS n_expected,
        |         round((coalesce(d.n_obs, 0) -
        |                  (SELECT total FROM tot) * e.p_expected)
        |               * (coalesce(d.n_obs, 0) -
        |                  (SELECT total FROM tot) * e.p_expected)
        |               / ((SELECT total FROM tot) * e.p_expected), 6)
        |           AS chi2_term
        |  FROM e LEFT JOIN d USING (digit)
        |)
        |SELECT digit, n_obs, n_expected, chi2_term,
        |       round(sum(chi2_term::decimal(18,6)) OVER (), 6)::double
        |         AS chi2_total
        |FROM t
        |ORDER BY digit""".stripMargin
  }

  /** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among a
    * FIXED number of raters assigning each item to one of k
    * categories. The labeled-data curation gate: when several
    * annotators (or rule/model judges) label the same documents,
    * kappa says whether the label set is coherent enough to train on
    * (κ ≈ 0 means the "labels" are noise; Landis–Koch call ≥ 0.61
    * substantial).
    *
    *   P_i = (Σ_j n_ij² − n)/(n(n−1)),  P̄ = mean_i P_i,
    *   P̄_e = Σ_j p_j²,                 κ = (P̄ − P̄_e)/(1 − P̄_e).
    *
    * Determinism contract: everything is EXACT integer arithmetic up
    * to the final divisions — P̄ = A/B with A = ΣΣ n_ij² − N·n and
    * B = N·n·(n−1); P̄_e = C/D with C = Σ_j c_j², D = (N·n)²; κ is
    * the exact rational (A·D − C·B)/(B·D − C·B), all in
    * decimal(38,0)/hugeint, each read out by ONE double division
    * rounded 6dp. (Products stay inside 38 digits for N·n < 10¹⁵ —
    * any real annotation set.) Unanimous single-category input has
    * P̄_e = 1 → NULL κ; n < 2 raters → NULL everywhere.
    *
    * Scale shape: one (item, category) count aggregate (map-side
    * partials), one item-level fold, one 1-row readout; the per-item
    * rater-count contract (every item must have exactly `raters`
    * votes — Fleiss is undefined otherwise) is enforced by
    * raise_error riding the per-item count in the row path. Returns
    * ONE row `(n_items, n_raters, n_categories, p_bar, p_e, kappa)`. */
  def fleissKappa(
      votes: DataFrame,
      itemCol: String,
      categoryCol: String,
      raters: Int): DataFrame = {
    require(raters >= 2, "Fleiss' kappa needs at least 2 raters")
    val dec = "decimal(38,0)"
    val cells = votes
      .filter(col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(categoryCol).as("__c"))
      .agg(count(lit(1)).as("__nij"))
    val items = cells
      .groupBy("__i")
      .agg(sum("__nij").as("__n"),
        sum(col("__nij").cast(dec) * col("__nij").cast(dec)).as("__sq"))
      // the fixed-n contract rides the row path — unprunable
      .select(
        (col("__sq") +
          coalesce(when(col("__n") =!= raters.toLong, raise_error(concat(
            lit(s"fleissKappa: item "), col("__i"),
            lit(s" has "), col("__n"),
            lit(s" votes, expected $raters")))).cast(dec),
            lit(0L).cast(dec))).as("__sq"))
    val cats = cells.groupBy("__c")
      .agg(sum(col("__nij").cast(dec)).as("__cj"))
      .agg(count(lit(1)).as("__k"),
        sum(col("__cj") * col("__cj")).as("__c2"))
    val folded = items.agg(
      count(lit(1)).as("n_items"),
      sum(col("__sq")).as("__ssq"))
    val n = lit(raters.toLong).cast(dec)
    folded.crossJoin(broadcast(cats)).select(
      col("n_items"),
      lit(raters).as("n_raters"),
      col("__k").as("n_categories"), {
        val nItems = col("n_items").cast(dec)
        val a = col("__ssq") - nItems * n
        val b = nItems * n * (n - lit(1L).cast(dec))
        val c = col("__c2")
        val d = (nItems * n) * (nItems * n)
        val pBar = round(a.cast("double") /
          when(col("n_items") > 0L, b.cast("double")), 6).as("p_bar")
        val pE = round(c.cast("double") /
          when(col("n_items") > 0L, d.cast("double")), 6).as("p_e")
        struct(pBar, pE,
          round((a * d - c * b).cast("double") /
            when(b * d - c * b > lit(0L).cast(dec),
              (b * d - c * b).cast("double")), 6).as("kappa")).as("__r")
      })
      .select(col("n_items"), col("n_raters"), col("n_categories"),
        col("__r.p_bar").as("p_bar"), col("__r.p_e").as("p_e"),
        col("__r.kappa").as("kappa"))
  }
}
