package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the statistics hot paths (the
  * [[TextKernelExpressions]] discipline applied to Stats operators).
  */
object StatKernelExpressions {

  // one digest instance per executor thread: getInstance("MD5") is a
  // provider lookup + allocation that would otherwise run per ROW
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared eval body for [[PoissonWeights]] — also the entry point the
    * generated code calls (a Scala object method is a static forwarder
    * on the companion class, callable from Janino). */
  def poissonWeightsEval(
      input: UTF8String, replicates: Int, ts: Array[Long]): ArrayData = {
    val id = input.getBytes
    val md = md5.get()
    // id ++ ':' ++ up-to-10 ascii digits of the replicate index
    val buf = new Array[Byte](id.length + 11)
    System.arraycopy(id, 0, buf, 0, id.length)
    buf(id.length) = ':'
    val out = new Array[Any](replicates)
    var b = 0
    while (b < replicates) {
      val s = java.lang.Integer.toString(b)
      var j = 0
      while (j < s.length) {
        buf(id.length + 1 + j) = s.charAt(j).toByte
        j += 1
      }
      md.reset()
      md.update(buf, 0, id.length + 1 + s.length)
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var k = 0
      while (k < ts.length && h >= ts(k)) k += 1
      out(b) = k.toLong
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Poisson-bootstrap weight VECTOR per row: weight b (b ∈ [0,
    * `replicates`)) is the inverse-CDF bucket of the 32-bit uniform
    * taken from the first four md5 digest bytes of
    * `id ++ ":" ++ ascii(b)` — BIT-IDENTICAL to the built-in chain
    * `conv(substring(md5(concat(id, ':', b)), 1, 8), 16, 10)`
    * compared against the same driver-computed ⌊cdf·2³²⌋ `thresholds`
    * (ascending; values ≥ the last threshold take weight
    * `thresholds.length`), at a fraction of the cost: one MessageDigest
    * and one input buffer REUSED across all B replicates of a row,
    * no 32-char hex string, no substring, no base-16 parse — the r16
    * Where probe measured the built-in chain at ~49 core-seconds over
    * aq84's 6.4M-row explode at sf0.1. Emitted as an array for
    * `posexplode`, whose `pos` is exactly the old replicate index.
    * Codegen emits one static call into [[poissonWeightsEval]] (the
    * threshold table rides as a reference object), so the expression
    * keeps its operator inside the whole-stage span instead of the
    * r16 `CodegenFallback` row-boxing path. */
  case class PoissonWeights(
      child: Expression, replicates: Int, thresholds: Seq[Long])
      extends UnaryExpression {
    require(replicates >= 1 && thresholds.nonEmpty &&
      thresholds == thresholds.sorted, "ascending thresholds required")
    private val ts = thresholds.toArray
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      poissonWeightsEval(input.asInstanceOf[UTF8String], replicates, ts)
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tsRef = ctx.addReferenceObj("poissonThresholds", ts, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.StatKernelExpressions." +
          s"poissonWeightsEval($c, $replicates, $tsRef);")
    }
    override protected def withNewChildInternal(c: Expression): PoissonWeights =
      copy(child = c)
  }

  def poisson_weights(
      id: Column, replicates: Int, thresholds: Seq[Long]): Column =
    GraftSqlBridge.toColumn(PoissonWeights(
      GraftSqlBridge.toExpression(id), replicates, thresholds))
}
