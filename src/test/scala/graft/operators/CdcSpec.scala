package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Content-defined chunking: tiling exactness + the edit-locality
  * property that motivates CDC. The sf-scale hash replay against the
  * DuckDB power-table oracle runs in the pq5 gate. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunksOf(rows: Seq[(Long, String)]) =
    Packing.cdcChunks(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))

  test("chunks tile the document exactly, in order") {
    val rnd = new scala.util.Random(3)
    val text = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val ch = chunksOf(Seq((1L, text))).sortBy(_._2)
    assert(ch.head._3 == 1)
    ch.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._3 + a._4, "gap or overlap")
      case _ =>
    }
    assert(ch.last._3 + ch.last._4 - 1 == text.length)
    assert(ch.length > 5, s"expected multiple chunks, got ${ch.length}")
  }

  test("an edit shifts boundaries only locally: later chunk fps survive") {
    val rnd = new scala.util.Random(9)
    val text = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "INSERTED-PREFIX-" + text
    val base = chunksOf(Seq((1L, text))).map(_._5).toSet
    val after = chunksOf(Seq((1L, edited))).map(_._5).toSet
    val survived = (base & after).size.toDouble / base.size
    // fixed-size chunking would score ~1/n here; CDC re-synchronizes
    // right after the first content-determined boundary
    assert(survived > 0.8, s"only $survived of chunk fps survived the edit")
  }

  test("short documents yield one whole-text chunk") {
    val ch = chunksOf(Seq((1L, "tiny")))
    assert(ch.toSeq == Seq((1L, 1, 1, 4, ch.head._5)))
  }
}
