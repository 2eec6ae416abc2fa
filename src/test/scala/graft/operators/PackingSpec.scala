package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packSequences assigns exact offsets, bins, and boundary flags") {
    // budget 10: offsets 0,4,9,15,22 -> bins 0,0,0,1,2
    val df = Seq((1L, 4L), (2L, 5L), (3L, 6L), (4L, 7L), (5L, 3L))
      .toDF("doc_id", "n_tokens")
    val r = Packing.packSequences(df, "doc_id", "n_tokens", budget = 10L)
      .orderBy("doc_id")
      .select("doc_id", "start_offset", "bin_id", "spans_boundary")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, false),   // [0,4)
      (2L, 4L, 0L, false),   // [4,9)
      (3L, 9L, 0L, true),    // [9,15) crosses 10
      (4L, 15L, 1L, true),   // [15,22) crosses 20
      (5L, 22L, 2L, false))) // [22,25)
  }

  test("packSequences matches the single-window oracle on any partitioning") {
    val df = (1 to 500).map(i => (i.toLong, (i * 7 % 23 + 1).toLong))
      .toDF("doc_id", "n_tokens")
    for (parts <- Seq(1, 3, 16)) {
      val got = Packing.packSequences(df, "doc_id", "n_tokens",
          budget = 64L, numParts = Some(parts))
        .orderBy("doc_id").select("doc_id", "start_offset").as[(Long, Long)]
        .collect().toSeq
      val want = df.orderBy("doc_id").as[(Long, Long)].collect().toSeq
        .scanLeft((0L, 0L)) { case ((_, acc), (id, n)) => (id, acc + n) }
        .sliding(2).map { case Seq((_, acc), (id, _)) => (id, acc) }.toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("globalRank equals the single-window rank on any partitioning") {
    val df = (1 to 300).map(i => (i.toLong, f"k${(i * 37) % 1000}%03d-$i"))
      .toDF("id", "key")
    val want = df.orderBy("key").select("id").as[Long].collect().toSeq
      .zipWithIndex.map { case (id, i) => (id, i + 1L) }.sortBy(_._1)
    for (parts <- Seq(1, 4, 11)) {
      val got = Packing.globalRank(df, "key", Seq("id"),
          numParts = Some(parts))
        .select("id", "rank").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("spark.graft.rank.assertUnique catches duplicate order keys loudly") {
    val dup = Seq((1L, "same"), (2L, "same"), (3L, "other"))
      .toDF("id", "key")
    spark.conf.set("spark.graft.rank.assertUnique", "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Packing.globalRank(dup, "key", Seq("id")).collect()
      }
      assert(e.getMessage.contains("not unique"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Packing.globalRankBy(dup, Seq(col("key").desc), "rk",
          uniqueCols = Seq(col("key"))).collect()
      }
      assert(e2.getMessage.contains("not unique"), e2.getMessage)
      // a unique key passes with the flag on
      val ok = Packing.globalRank(
        Seq((1L, "a"), (2L, "b")).toDF("id", "key"), "key", Seq("id"))
      assert(ok.count() == 2)
      // globalRankBy with no uniqueCols declared: documented silent
      // mode — no check, no crash
      assert(Packing.globalRankBy(dup, Seq(col("key").desc, col("id")), "rk")
        .count() == 3)
    } finally spark.conf.unset("spark.graft.rank.assertUnique")
  }

  test("empty inputs produce empty outputs, not exceptions") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    assert(Packing.packSequences(empty, "doc_id", "n_tokens", 10L).count() == 0)
    val emptyK = Seq.empty[(Long, String)].toDF("id", "key")
    assert(Packing.globalRank(emptyK, "key", Seq("id")).count() == 0)
  }

  test("packSequences handles zero-token docs without boundary confusion") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, 5L)).toDF("doc_id", "n_tokens")
    val r = Packing.packSequences(df, "doc_id", "n_tokens", budget = 10L)
      .orderBy("doc_id")
      .select("doc_id", "start_offset", "bin_id", "spans_boundary")
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    // doc 2 sits exactly on the boundary with zero width: bin 1, no span
    assert(r.toSeq == Seq((1L, 0L, 0L, false), (2L, 10L, 1L, false),
      (3L, 10L, 1L, false)))
  }

  test("chunkByTokens covers every token with the documented overlap") {
    // 10 tokens, window 4, stride 3 -> starts 0,3,6,9: sizes 4,4,4,1
    val doc = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Packing.chunkByTokens(doc, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_no")
      .collect().map(x => (x.getInt(1), x.getString(2), x.getInt(3)))
    assert(r.toSeq == Seq(
      (0, "t0 t1 t2 t3", 4),
      (1, "t3 t4 t5 t6", 4),
      (2, "t6 t7 t8 t9", 4),
      (3, "t9", 1)))
    // empty docs produce no chunks; stride == window means no overlap
    val two = Seq((1L, ""), (2L, "a b c d")).toDF("doc_id", "text")
    val r2 = Packing.chunkByTokens(two, "doc_id", "text", 2, 2)
      .collect().map(x => (x.getLong(0), x.getString(2)))
    assert(r2.toSeq == Seq((2L, "a b"), (2L, "c d")))
    intercept[IllegalArgumentException](
      Packing.chunkByTokens(two, "doc_id", "text", window = 2, stride = 3))
  }

  test("chunkByTokens covers every token exactly, any doc length") {
    // docs of every length 1..60 in one pass; chunk k of an n-token doc
    // must cover exactly tokens [k*stride, min(k*stride + window, n))
    val docs = (1 to 60).map(n =>
      (n.toLong, (0 until n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Packing
      .chunkByTokens(docs, "doc_id", "text", window = 7, stride = 5)
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    for (n <- 1 to 60) {
      val cs = byDoc(n.toLong).sortBy(_.getInt(1))
      assert(cs.length == (n - 1) / 5 + 1, s"chunk count for n=$n")
      cs.foreach { r =>
        val k = r.getInt(1)
        val lo = 5 * k; val hi = math.min(5 * k + 7, n)
        assert(r.getString(2).split(" ").toSeq ==
          (lo until hi).map(i => s"w$i"), s"doc $n chunk $k")
        assert(r.getInt(3) == hi - lo)
      }
    }
  }

  test("lengthBuckets: exact padding economics, truncation, empty-doc drop") {
    def words(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(10)),   // bucket 16, pad 6
      (2L, words(16)),   // bucket 16, pad 0 (boundary stays in-cap)
      (3L, words(40)),   // bucket 64, pad 24
      (4L, words(2000)), // bucket 1024, truncated 976
      (5L, "")           // empty: excluded entirely
    ).toDF("doc_id", "text")
    val r = Packing.lengthBuckets(docs, "text").orderBy("bucket_cap")
      .collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getLong(5), x.getLong(6)))
    assert(r.toSeq == Seq(
      (16, 2L, 26L, 6L, 6.0 / 32, 0L, 0L),
      (64, 1L, 40L, 24L, 0.375, 0L, 0L),
      (1024, 1L, 1024L, 0L, 0.0, 1L, 976L)))
  }

  test("lengthBuckets rejects unsorted or duplicate caps") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.lengthBuckets(docs, "text", caps = Seq(32, 16))
    }
    intercept[IllegalArgumentException] {
      Packing.lengthBuckets(docs, "text", caps = Seq(16, 16))
    }
  }

  test("groupedRank equals the per-group window row_number") {
    // 3 groups × 40 rows across MORE partitions than groups, so group
    // runs genuinely split across range-partition boundaries
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle(
      (for (g <- Seq("a", "b", "c"); i <- 1 to 40) yield (g, i.toLong)).toList)
    val df = rows.toDF("src", "id").repartition(7)
    val got = Packing.groupedRank(df, "src", "id", Nil, numParts = Some(5))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(_._2).sorted.zipWithIndex.map { case (id, i) =>
        (g, id) -> (i + 1L)
      }
    }
    assert(got == expected)
  }

  test("groupedPrefixSum equals the per-group window running sum, " +
      "non-string groups included") {
    // 3 integer groups × 50 rows over more partitions than groups so
    // group runs split across range-partition boundaries; weights vary
    val rnd = new scala.util.Random(17)
    val rows = rnd.shuffle(
      (for (g <- Seq(1L, 2L, 3L); i <- 1 to 50)
        yield (g, i.toLong, (i % 7 + 1).toLong)).toList)
    val df = rows.toDF("g", "v", "w").repartition(7)
    val got = Packing.groupedPrefixSum(df, "g", "v", "w", "cum",
        numParts = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.map(_._3).scanLeft(0L)(_ + _).drop(1)
        .zip(sorted).map { case (cum, (_, v, _)) => (g, v) -> cum }
    }
    assert(got == expected)
  }

  test("curriculumSchedule equals the window row_number over " +
      "(bucket, hash, id); buckets cap") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(23)
    val rows = rnd.shuffle((1L to 120L).map(i => (i, i * 7 % 600)).toList)
    val df = rows.toDF("id", "diff").repartition(7)
    val got = Packing.curriculumSchedule(df, "id", "diff",
        bucketWidth = 64L, maxBucket = 7L, salt = "c")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // reference: the plain window formulation of the same order
    val expected = df.select(col("id"),
        least(expr("cast(diff as bigint) div 64"), lit(7L)).as("bucket"),
        md5(concat(lit("c"), col("id").cast("string")).cast("binary"))
          .as("h"))
      .withColumn("position", row_number().over(
        Window.orderBy("bucket", "h", "id")).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    assert(got == expected)
    assert(got.values.map(_._1).max == 7L) // 599 div 64 = 9 capped to 7
  }

  test("interleaveSchedule: weights govern every prefix of the stream") {
    val df = (for (g <- Seq("hi", "lo"); i <- 1 to 50) yield (g, i.toLong))
      .toDF("src", "id")
    val sched = Sampling.interleaveSchedule(df, "src", "id",
        weights = Map("hi" -> 2L), topN = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sched.map(_._1).toSeq == (1L to 30L), "positions dense from 1")
    // weight 2 vs 1: every aligned prefix holds twice as many hi docs
    val hiAt = sched.filter(_._2 == "hi").map(_._1)
    assert(hiAt.count(_ <= 30) == 20 && sched.count(_._2 == "lo") == 10)
    // per-source id order preserved (rank order == id order)
    assert(sched.filter(_._2 == "hi").map(_._3).toSeq ==
      sched.filter(_._2 == "hi").map(_._3).sorted.toSeq)
  }

  test("quantileCalibrate: drifted source scales land on shared " +
      "corpus quantiles") {
    // global sorted values [10,20,30,40,100,200]; k=2 midpoints
    // p=0.25 -> 22.5, p=0.75 -> 85.0. A's top half and B's top half
    // both calibrate to 85.0 despite a 5x raw-scale drift.
    val docs = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (4L, "A", 40L), (5L, "B", 100L), (6L, "B", 200L))
      .toDF("id", "src", "v")
    val got = Sampling.quantileCalibrate(docs, "id", "src", "v", k = 2)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "A", 10L, 0L, 22.5),
      (2L, "A", 20L, 0L, 22.5),
      (3L, "A", 30L, 1L, 85.0),
      (4L, "A", 40L, 1L, 85.0),
      (5L, "B", 100L, 0L, 22.5),
      (6L, "B", 200L, 1L, 85.0)), got.toString)
  }

  test("zOrderKey: hand-computed Morton interleaves") {
    // spread(255) = alternating bits 0x5555; b rides the odd bits
    val rows = Seq((255L, 0L), (0L, 255L), (255L, 255L), (1L, 2L),
      (0L, 0L), (65535L, 65535L)).toDF("a", "b")
    val got = Packing.zOrderKey(rows, "a", "b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (255L, 0L, 0x5555L),
      (0L, 255L, 0xAAAAL),
      (255L, 255L, 0xFFFFL),
      (1L, 2L, 9L),              // 1 | (spread(2)=4) << 1
      (0L, 0L, 0L),
      (65535L, 65535L, 0xFFFFFFFFL)), got.toString)
    // z-locality: the four quadrant corners of the 2^16 grid land in
    // four distinct quarters of the z range (the pruning property)
    val corners = Seq((0L, 0L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L)).toDF("a", "b")
    val qs = Packing.zOrderKey(corners, "a", "b")
      .as[(Long, Long, Long)].collect()
      .map(r => r._3 / (1L << 30)).toSet
    assert(qs == Set(0L, 1L, 2L, 3L))
  }

  test("fimSplit: rational cuts, PSM serialization witness, degenerate " +
      "short docs") {
    import java.security.MessageDigest
    def md5(x: String) = MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens: np=4, ne=7
      (2L, "x"),                   // 1 token: everything in the suffix
      (3L, "   "))                 // 0 tokens: dropped
      .toDF("doc_id", "text")
    val got = Packing.fimSplit(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, 4L, 3L, 3L, md5("<PRE>a b c d<SUF>h i j<MID>e f g")),
      (2L, 1L, 0L, 0L, 1L, md5("<PRE><SUF>x<MID>"))), got.toString)
  }
}
