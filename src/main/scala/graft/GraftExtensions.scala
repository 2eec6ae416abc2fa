package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{TextKernelExpressions => TK, VectorExpressions => VE}

/** SparkSessionExtensions registration: exposes the native graft kernel
  * expressions to SQL, so `spark.sql("SELECT simhash(text) ...")` works
  * next to the Column API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (done by
  * Sessions.tune) or `spark.sql.extensions=graft.GraftExtensions`.
  *
  * No optimizer rules or strategies are injected: SURVEY §4 establishes
  * parity needs none — Catalyst's existing rules cover this engine.
  */
object GraftExtensions {
  /** Post-hoc registration on an already-built session (getOrCreate
    * ignores withExtensions when a session exists). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    import graft.functions.{TextKernelExpressions => TK, VectorExpressions => VE}
    val ext = new GraftExtensions
    reg.createOrReplaceTempFunction("float_dot",
      exprs => VE.FloatDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("float_norm",
      exprs => VE.FloatNorm(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => TK.WordShingles(exprs(0), ext.lit(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("word_ngrams",
      exprs => TK.WordNGrams(exprs(0), ext.lit(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => TK.MinHashSig(exprs(0), ext.lit(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("simhash",
      exprs => TK.SimHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("float_maxabs",
      exprs => VE.FloatMaxAbs(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("int8_quantize",
      exprs => VE.Int8Quantize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("int_dot",
      exprs => VE.IntDot(exprs(0), exprs(1)), "scala_udf")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  private[graft] def lit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => other.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case v => throw new IllegalArgumentException(s"expected int literal, got $v")
    }
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("float_dot"),
      info("float_dot", "float_dot(a, b) - dot product of two float arrays (double)"),
      (exprs: Seq[Expression]) => VE.FloatDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("float_norm"),
      info("float_norm", "float_norm(a) - L2 norm of a float array (double)"),
      (exprs: Seq[Expression]) => VE.FloatNorm(exprs(0))))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-grams of lower(text)"),
      (exprs: Seq[Expression]) => TK.WordShingles(exprs(0), lit(exprs(1)))))
    e.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text, maxN) - all word 1..maxN-grams with multiplicity"),
      (exprs: Seq[Expression]) => TK.WordNGrams(exprs(0), lit(exprs(1)))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-hash minhash signature"),
      (exprs: Seq[Expression]) => TK.MinHashSig(exprs(0), lit(exprs(1)))))
    e.injectFunction((FunctionIdentifier("simhash"),
      info("simhash", "simhash(text) - 64-bit simhash of whitespace tokens"),
      (exprs: Seq[Expression]) => TK.SimHash(exprs(0))))
    e.injectFunction((FunctionIdentifier("float_maxabs"),
      info("float_maxabs", "float_maxabs(a) - max absolute value of a float array (double)"),
      (exprs: Seq[Expression]) => VE.FloatMaxAbs(exprs(0))))
    e.injectFunction((FunctionIdentifier("int8_quantize"),
      info("int8_quantize", "int8_quantize(a) - symmetric int8 quantization of a float array"),
      (exprs: Seq[Expression]) => VE.Int8Quantize(exprs(0))))
    e.injectFunction((FunctionIdentifier("int_dot"),
      info("int_dot", "int_dot(a, b) - dot product of two int arrays (long)"),
      (exprs: Seq[Expression]) => VE.IntDot(exprs(0), exprs(1))))
  }
}
