package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Final-readout rounding with the signed zero pinned out.
  *
  * The trap: when a rounded DOUBLE-expression readout's true value is a
  * tiny negative (e.g. a least-squares slope of ≈ −8.6e-9 on a corpus
  * whose true slope is exactly zero), the two engines disagree on the
  * ZERO'S SIGN — Spark's `round` goes through `BigDecimal`, which has
  * no signed zero, and emits `+0.0`; DuckDB rounds the binary double
  * sign-preservingly and emits `-0.0`. Hash-level comparison (the
  * driver's gate) distinguishes the two even though `-0.0 == 0.0`
  * numerically.
  *
  * `round(c, n) + 0.0` erases the sign bit on both engines — IEEE 754
  * defines `-0.0 + 0.0 = +0.0` under round-to-nearest — while leaving
  * every nonzero value (and NULL) untouched. Use this instead of a bare
  * `round(c, n)` for ANY double readout that can land on zero from
  * below: slopes, z-scores, correlations and drifts on degenerate
  * groups. Decimal-summed readouts don't need it (decimal zero is
  * unsigned on both engines); the matching oracle SQL must carry the
  * literal `+ 0.0` too.
  */
private[graft] object Readout {

  /** `round(c, scale)` with `-0.0` normalized to `+0.0`. */
  def pin(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)
}
