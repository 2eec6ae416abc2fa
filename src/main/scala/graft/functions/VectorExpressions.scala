package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for float-vector math.
  *
  * The composable route (`zip_with` + `aggregate` + per-element casts)
  * allocates an array per row pair and walks it through generic
  * SpecializedGetters — fine for one pass, ruinous inside an all-pairs
  * similarity join where the dot product is the innermost loop. These
  * expressions generate a tight primitive loop over the underlying
  * float storage (no boxing, no intermediate arrays) and stay inside
  * whole-stage codegen, with an interpreted `nullSafeEval` fallback.
  *
  * Accumulation is double (reading float32 inputs), left-to-right — the
  * exact summation semantics the DuckDB oracle reproduces.
  */
object VectorExpressions {

  /** dot(a, b): Σ a_i * b_i over two array<float> columns. */
  case class FloatDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"float_dot expects array<float> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), ys.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        s += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
        i += 1
      }
      s
    }

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): FloatDot =
      copy(left = newLeft, right = newRight)
  }

  /** norm(a): sqrt(Σ a_i²) over an array<float> column. */
  case class FloatNorm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      while (i < xs.numElements()) {
        val v = xs.getFloat(i).toDouble
        s += v * v
        i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = (double) $a.getFloat($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): FloatNorm =
      copy(child = newChild)
  }

  /** Banded signed-random-projection signature: for band b, a key whose
    * j-th bit is sign(v · plane[b*rowsPerBand + j]). `planes` is the
    * flattened row-major [numPlanes][dim] hyperplane matrix, carried as
    * a plan reference (a production deployment would broadcast it; at a
    * few MB per task binary this is acceptable and keeps the expression
    * a pure function of its inputs). One compiled pass per row — the
    * HOF route would interpret numPlanes*dim lambda calls per vector. */
  case class RhpBands(
      child: Expression,
      planes: Array[Float],
      dim: Int,
      bands: Int,
      rowsPerBand: Int) extends UnaryExpression {
    require(planes.length == bands * rowsPerBand * dim,
      s"planes length ${planes.length} != $bands*$rowsPerBand*$dim")
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), dim)
      val out = new Array[Long](bands)
      var k = 0
      var b = 0
      while (b < bands) {
        var key = 0L
        var j = 0
        while (j < rowsPerBand) {
          var s = 0.0
          val base = k * dim
          var i = 0
          while (i < n) {
            s += xs.getFloat(i).toDouble * planes(base + i)
            i += 1
          }
          if (s >= 0) key |= (1L << j)
          k += 1
          j += 1
        }
        out(b) = key
        b += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val p = ctx.addReferenceObj("rhpPlanes", planes, "float[]")
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val b = ctx.freshName("b")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val k = ctx.freshName("k")
        val s = ctx.freshName("s")
        val key = ctx.freshName("key")
        val base = ctx.freshName("base")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $dim);
           |long[] $out = new long[$bands];
           |int $k = 0;
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $key = 0L;
           |  for (int $j = 0; $j < $rowsPerBand; $j++) {
           |    double $s = 0.0;
           |    int $base = $k * $dim;
           |    for (int $i = 0; $i < $n; $i++) {
           |      $s += ((double) $a.getFloat($i)) * $p[$base + $i];
           |    }
           |    if ($s >= 0) $key |= (1L << $j);
           |    $k++;
           |  }
           |  $out[$b] = $key;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): RhpBands =
      copy(child = newChild)
  }

  def float_rhp_bands(
      vec: Column, planes: Array[Float], dim: Int,
      bands: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.toColumn(RhpBands(
      GraftSqlBridge.toExpression(vec), planes, dim, bands, rowsPerBand))

  def float_dot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(FloatDot(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  def float_norm(a: Column): Column =
    GraftSqlBridge.toColumn(FloatNorm(GraftSqlBridge.toExpression(a)))

  /** Cosine via the native expressions: dot / (||a|| * ||b||). */
  def float_cosine(a: Column, b: Column): Column =
    float_dot(a, b) / (float_norm(a) * float_norm(b))
}
