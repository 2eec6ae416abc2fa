package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val neu = Seq((2L, "y"), (3L, "zz"), (4L, "w")).toDF("id", "v")
    val r = Snapshot.diff(old, neu, "id", xxhash64(col("v")))
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("diff of a snapshot against itself is empty") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    assert(Snapshot.diff(df, df, "id", xxhash64(col("v"))).isEmpty)
  }

  test("NULL content is presence, not absence: md5(NULL) never fakes a delta") {
    // md5 of NULL is NULL — membership must come from side presence
    val old = Seq((1L, null: String), (2L, "y"), (3L, null: String))
      .toDF("id", "v")
    val neu = Seq((1L, null: String), (2L, null: String), (4L, "w"))
      .toDF("id", "v")
    val r = Snapshot.diff(old, neu, "id", md5(col("v")))
      .orderBy("id").collect().map(x => (x.getLong(0), x.getString(1)))
    // 1: NULL==NULL unchanged (dropped); 2: y->NULL changed;
    // 3: removed; 4: added
    assert(r.toSeq == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("incrementalRefresh equals full recompute and touches only the delta") {
    val old = Seq((1L, "a b"), (2L, "c d e"), (3L, "f")).toDF("id", "v")
    val neu = Seq((2L, "c d e"), (3L, "f g"), (4L, "h i")).toDF("id", "v")
    def comp(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), length(col("v")).as("len"))
    var redoRows = -1L
    val out = Snapshot.incrementalRefresh(
      comp(old), old, neu, "id", xxhash64(col("v"))) { df =>
      redoRows = df.count(); comp(df)
    }
    assert(out.orderBy("id").collect().toSeq ==
      comp(neu).orderBy("id").collect().toSeq)
    // only id 3 (changed) and id 4 (added) were recomputed
    assert(redoRows == 2L)
  }

  test("multi-column checksum sees a change in any content column") {
    val old = Seq((1L, "x", "en")).toDF("id", "v", "lang")
    val neu = Seq((1L, "x", "fr")).toDF("id", "v", "lang")
    val ck = xxhash64(col("v"), col("lang"))
    val r = Snapshot.diff(old, neu, "id", ck).collect()
    assert(r.length == 1 && r(0).getString(1) == "changed")
  }
}
