package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** SQL access to the native kernels via SparkSessionExtensions, plus
  * deep-chain / graph-output robustness. */
class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate may return the suite-shared session (withExtensions is
  // ignored then) — the post-hoc path covers that, and is itself under
  // test here
  lazy val spark: SparkSession = {
    val s = Sessions.tune(SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2"))
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("kernel functions callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  float_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |            array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |  float_norm(array(cast(3.0 as float), cast(4.0 as float))) AS n,
        |  size(word_shingles('a b c d', 3)) AS ns,
        |  size(minhash_sig(word_shingles('a b c d', 3), 16)) AS nh,
        |  simhash('hello world') AS sh
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Double]("n") == 5.0)
    assert(row.getAs[Int]("ns") == 2)
    assert(row.getAs[Int]("nh") == 16)
    // deterministic: same value as the Column API
    import org.apache.spark.sql.functions.lit
    val viaColumn = spark.range(1)
      .select(functions.TextKernelExpressions.simhash(lit("hello world")))
      .collect()(0).getLong(0)
    assert(row.getAs[Long]("sh") == viaColumn)
  }

  test("quantization kernels callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  float_maxabs(array(cast(-2.0 as float), cast(1.0 as float))) AS m,
        |  int8_quantize(array(cast(0.5 as float), cast(-1.0 as float))) AS q,
        |  int_dot(array(3, 4), array(5, 6)) AS d
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("m") == 2.0)
    assert(row.getSeq[Int](1) == Seq(64, -127))
    assert(row.getAs[Long]("d") == 39L)
  }

  test("SQL simhash agrees with Dedup.simhash64 over documents") {
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs_ext")
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT doc_id, simhash(text) AS s FROM docs_ext ORDER BY doc_id LIMIT 20")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), operators.Dedup.simhash64(col("text")).as("s"))
      .orderBy("doc_id").limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("deep chains (2000 stages) parse and lower without stack issues") {
    val code = (1 to 2000).map(i => s"E$i").mkString(" -> ")
    val root = dsl.StageGraph.build(code)
    assert(root.event == "E1")
    assert(root.count == 2000)
  }

  test("graph rendering: ascii tree and dot output") {
    val reg = new core.EventRegistry
    Seq("A", "B", "C", "S").foreach(n =>
      reg.registerTransform(n)(ctx => ctx.spark.emptyDataFrame))
    val p = core.Pipeline.fromPointy("g", "A (0 -> B, 1 |-> C) -> S", reg)
    val tree = p.treeString
    assert(tree.contains("A") && tree.contains("[0]-> B") &&
      tree.contains("[sink]-> S"))
    val dot = p.toDot
    assert(dot.startsWith("digraph"))
    assert(dot.contains("label=\"0\"") && dot.contains("label=\"1\""))
    assert(dot.contains("label=\"sink\""))
  }
}
