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

  /** max |a_i| over an array<float> column (0.0 for empty) — the scale
    * basis for symmetric int8 quantization. */
  case class FloatMaxAbs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      var m = 0.0
      var i = 0
      while (i < xs.numElements()) {
        val v = math.abs(xs.getFloat(i).toDouble)
        if (v > m) m = v
        i += 1
      }
      m
    }

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val m = ctx.freshName("m")
        val v = ctx.freshName("v")
        s"""
           |double $m = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
           |  if ($v > $m) $m = $v;
           |}
           |${ev.value} = $m;
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): FloatMaxAbs = copy(child = newChild)
  }

  /** Symmetric int8 quantization of an array<float>: scale =
    * 127/max|x| (1.0 for the zero vector), q_i = floor(x_i*scale + 0.5)
    * — floor-plus-half instead of a rounding-mode-dependent round() so
    * the DuckDB oracle replays bit-for-bit. Emitted as array<int> (the
    * values fit int8; int storage keeps the codegen accessors simple). */
  case class Int8Quantize(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val n = xs.numElements()
      var m = 0.0
      var i = 0
      while (i < n) {
        val v = math.abs(xs.getFloat(i).toDouble)
        if (v > m) m = v
        i += 1
      }
      val scale = if (m > 0) 127.0 / m else 1.0
      val out = new Array[Int](n)
      i = 0
      while (i < n) {
        out(i) = math.floor(xs.getFloat(i).toDouble * scale + 0.5).toInt
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        val v = ctx.freshName("v")
        val sc = ctx.freshName("sc")
        val out = ctx.freshName("out")
        s"""
           |int $n = $a.numElements();
           |double $m = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
           |  if ($v > $m) $m = $v;
           |}
           |double $sc = $m > 0 ? 127.0 / $m : 1.0;
           |int[] $out = new int[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (int) java.lang.Math.floor(
           |    ((double) $a.getFloat($i)) * $sc + 0.5);
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Int8Quantize = copy(child = newChild)
  }

  /** dot(a, b) over two array<int> columns, accumulated in long — the
    * inner loop of quantized similarity search. */
  case class IntDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
        case _                                                    => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int_dot expects array<int> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), ys.numElements())
      var s = 0L
      var i = 0
      while (i < n) {
        s += xs.getInt(i).toLong * ys.getInt(i)
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
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ((long) $a.getInt($i)) * $b.getInt($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): IntDot =
      copy(left = newLeft, right = newRight)
  }

  def float_rhp_bands(
      vec: Column, planes: Array[Float], dim: Int,
      bands: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.toColumn(RhpBands(
      GraftSqlBridge.toExpression(vec), planes, dim, bands, rowsPerBand))

  /** Product-quantization encoder: split the vector into `m` equal
    * subspaces and emit, per subspace, the index of the nearest
    * codebook centroid by squared L2 (double accumulation in dimension
    * order — the exact semantics a SQL `list_sum` over squared diffs
    * replays; ties break to the lowest centroid index). `codebook` is
    * the flat [k × dim] centroid matrix; only each centroid's own
    * subspace slice is consulted for that subspace's code. Output:
    * array<int> of length m — the 4-byte-per-subspace code word that
    * replaces a dim×4-byte vector in the ANN scan. */
  case class PqEncode(child: Expression, codebook: Array[Float], m: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData].toFloatArray()
      val dim = v.length
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val sub = dim / m
      val k = codebook.length / dim
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var j = 0
          val off = s * sub
          while (j < sub) {
            val diff = v(off + j).toDouble - codebook(c * dim + off + j).toDouble
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(s) = best
        s += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        codes.map(_.asInstanceOf[Any]))
    }
    override protected def withNewChildInternal(c: Expression): PqEncode =
      copy(child = c)
  }

  /** Shared argmax scaffold for [[CosineArgmaxId]] / [[CosineArgmaxSim]]:
    * nearest centroid by 4dp-rounded cosine, ties to the LOWEST cell id
    * — bit-identical to the previous struct-max formulation
    * (`max((round(cosine(v, cᵢ), 4), -idᵢ))`), including Spark's double
    * total order (NaN greatest) and Round's NaN/∞ pass-through.
    *
    * The centroid matrix rides as a PLAN REFERENCE (`addReferenceObj`),
    * not a literal expression tree: k `typedLit` arrays previously
    * compiled k×dim-sized Janino sources PER LLOYD ITERATION (sq14's
    * dominant first-run cost), while this kernel's generated source is
    * constant in k×dim — identical across iterations, so Janino's cache
    * compiles it once for the whole trajectory. */
  sealed trait CosineArgmaxBase extends UnaryExpression {
    def cents: Array[Array[Float]]
    def ids: Array[Long]

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"cosine_argmax expects array<float>, got ${other.simpleString}")
      }

    @transient protected lazy val cnorms: Array[Double] = cents.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { val v = c(i).toDouble; s += v * v; i += 1 }
      math.sqrt(s)
    }

    /** (bestSim, bestId) over the centroid matrix. */
    protected def argmax(xs: ArrayData): (Double, Long) = {
      var vn = 0.0
      var i = 0
      val n = xs.numElements()
      while (i < n) { val v = xs.getFloat(i).toDouble; vn += v * v; i += 1 }
      val vnorm = math.sqrt(vn)
      var bestSim = Double.NegativeInfinity
      var bestId = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        val m = math.min(n, cv.length)
        var d = 0.0
        var j = 0
        while (j < m) { d += xs.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
        val sim = VectorExpressions.round4(d / (vnorm * cnorms(c)))
        val cmp = java.lang.Double.compare(sim, bestSim)
        if (cmp > 0 || (cmp == 0 && ids(c) < bestId)) {
          bestSim = sim; bestId = ids(c)
        }
        c += 1
      }
      (bestSim, bestId)
    }

    /** Generated argmax loop; leaves `double <simVar>` / `long <idVar>`
      * in scope. Code size constant in k×dim — matrices are reference
      * slots, so the source is identical across Lloyd iterations. */
    protected def genArgmax(
        ctx: CodegenContext, a: String,
        simVar: String, idVar: String): String = {
      val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
      val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
      val cnormsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val vn = ctx.freshName("vn")
      val v = ctx.freshName("v")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val sim = ctx.freshName("sim")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $a.numElements();
         |double $vn = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $vn += $v * $v;
         |}
         |$vn = java.lang.Math.sqrt($vn);
         |double $simVar = Double.NEGATIVE_INFINITY;
         |long $idVar = Long.MAX_VALUE;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  float[] __cv = $centsRef[$c];
         |  int $m = java.lang.Math.min($n, __cv.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $d += ((double) $a.getFloat($j)) * ((double) __cv[$j]);
         |  }
         |  double $sim = graft.functions.VectorExpressions.round4(
         |    $d / ($vn * $cnormsRef[$c]));
         |  int $cmp = java.lang.Double.compare($sim, $simVar);
         |  if ($cmp > 0 || ($cmp == 0 && $idsRef[$c] < $idVar)) {
         |    $simVar = $sim; $idVar = $idsRef[$c];
         |  }
         |}
       """.stripMargin
    }
  }

  /** Nearest-centroid CELL ID (see [[CosineArgmaxBase]]). */
  case class CosineArgmaxId(
      child: Expression,
      cents: Array[Array[Float]],
      ids: Array[Long]) extends CosineArgmaxBase {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullSafeEval(a: Any): Any =
      argmax(a.asInstanceOf[ArrayData])._2
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val sim = ctx.freshName("bestSim")
        val id = ctx.freshName("bestId")
        s"""
           |${genArgmax(ctx, a, sim, id)}
           |${ev.value} = $id;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): CosineArgmaxId =
      copy(child = c)
  }

  /** WINNING 4dp cosine of the nearest centroid (see [[CosineArgmaxBase]]). */
  case class CosineArgmaxSim(
      child: Expression,
      cents: Array[Array[Float]],
      ids: Array[Long]) extends CosineArgmaxBase {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      argmax(a.asInstanceOf[ArrayData])._1
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val sim = ctx.freshName("bestSim")
        val id = ctx.freshName("bestId")
        s"""
           |${genArgmax(ctx, a, sim, id)}
           |${ev.value} = $sim;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): CosineArgmaxSim =
      copy(child = c)
  }

  /** ONE-pass `(sim, cell_id)` struct (see [[CosineArgmaxBase]]) — the
    * WithSim path needs both outputs, and two sibling expressions would
    * each rescan all k centroids per row (no subexpression elimination
    * across distinct case classes carrying array fields). */
  case class CosineArgmaxStruct(
      child: Expression,
      cents: Array[Array[Float]],
      ids: Array[Long]) extends CosineArgmaxBase {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("sim", DoubleType,
        nullable = false),
        org.apache.spark.sql.types.StructField("cell_id",
          org.apache.spark.sql.types.LongType, nullable = false)))
    override def nullSafeEval(a: Any): Any = {
      val (sim, id) = argmax(a.asInstanceOf[ArrayData])
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](sim, id))
    }
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val sim = ctx.freshName("bestSim")
        val id = ctx.freshName("bestId")
        s"""
           |${genArgmax(ctx, a, sim, id)}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
           |    new Object[]{ $sim, $id });
         """.stripMargin
      })
    override protected def withNewChildInternal(
        c: Expression): CosineArgmaxStruct = copy(child = c)
  }

  /** Spark `round(x, 4)` semantics for doubles (RoundBase): decimal
    * HALF_UP on the canonical string rendering, NaN/∞ pass through.
    * Public + JVM-static so generated code can call it. */
  def round4(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def cosine_argmax_id(
      vec: Column, centroids: Seq[(Long, Array[Float])]): Column =
    GraftSqlBridge.toColumn(CosineArgmaxId(
      GraftSqlBridge.toExpression(vec),
      centroids.map(_._2).toArray, centroids.map(_._1).toArray))

  def cosine_argmax_sim(
      vec: Column, centroids: Seq[(Long, Array[Float])]): Column =
    GraftSqlBridge.toColumn(CosineArgmaxSim(
      GraftSqlBridge.toExpression(vec),
      centroids.map(_._2).toArray, centroids.map(_._1).toArray))

  /** One-pass `(sim, cell_id)` struct. */
  def cosine_argmax_struct(
      vec: Column, centroids: Seq[(Long, Array[Float])]): Column =
    GraftSqlBridge.toColumn(CosineArgmaxStruct(
      GraftSqlBridge.toExpression(vec),
      centroids.map(_._2).toArray, centroids.map(_._1).toArray))

  def pq_encode(vec: Column, codebook: Array[Float], m: Int): Column =
    GraftSqlBridge.toColumn(PqEncode(
      GraftSqlBridge.toExpression(vec), codebook, m))

  def float_dot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(FloatDot(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  def float_norm(a: Column): Column =
    GraftSqlBridge.toColumn(FloatNorm(GraftSqlBridge.toExpression(a)))

  /** Cosine via the native expressions: dot / (||a|| * ||b||). */
  def float_cosine(a: Column, b: Column): Column =
    float_dot(a, b) / (float_norm(a) * float_norm(b))

  def float_maxabs(a: Column): Column =
    GraftSqlBridge.toColumn(FloatMaxAbs(GraftSqlBridge.toExpression(a)))

  def int8_quantize(a: Column): Column =
    GraftSqlBridge.toColumn(Int8Quantize(GraftSqlBridge.toExpression(a)))

  def int_dot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(IntDot(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
