package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The 30-minute-gap sessionization semantics are implemented THREE ways
  * on purpose — three API surfaces over one contract:
  *
  *  - q11_sessionize: manual lag + running-sum windows (portable SQL);
  *  - q30_session_window: Spark's built-in `session_window` expression;
  *  - st4_stateful_sessions: flatMapGroupsWithState with event-time
  *    timeouts (the streaming state machine).
  *
  * This spec pins all three to each other session-for-session on the
  * same corpus, plus to one hand-pinned oracle constant, so a future
  * edit to any single surface can't silently drift the semantics.
  */
class SessionizationParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // DuckDB replay of q11's oracle SQL at sf0.001 (tools/check.py SQL):
  // 946 sessions over 1000 events from 15 users.
  private val ExpectedSessions = 946L
  private val ExpectedEvents = 1000L

  // common projection: (user_id, per-user session ordinal, n_events)
  private def byOrdinal(df: DataFrame, orderCol: String): Set[(Long, Int, Long)] = {
    val w = Window.partitionBy("user_id").orderBy(orderCol)
    df.withColumn("k", row_number().over(w))
      .select(col("user_id"), col("k"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  test("q11 / q30 / st4 agree session-for-session and match the pinned constant") {
    val q11 = Queries.all("q11_sessionize")(spark, sf)
    val q30 = Queries.all("q30_session_window")(spark, sf)
    val st4 = Queries.all("st4_stateful_sessions")(spark, sf)

    val a = byOrdinal(q11, "session_id")
    val b = byOrdinal(q30, "start_us")
    val c = byOrdinal(st4, "start_us")
    assert(a == b, "manual lag/cumsum (q11) != session_window (q30)")
    assert(b == c, "session_window (q30) != flatMapGroupsWithState (st4)")

    assert(a.size.toLong == ExpectedSessions)
    assert(a.toSeq.map(_._3).sum == ExpectedEvents)

    // durations tie q11 to st4 beyond counts: q11's duration_us must
    // equal st4's end_us - start_us for every session ordinal
    val dA = {
      val w = Window.partitionBy("user_id").orderBy("session_id")
      q11.withColumn("k", row_number().over(w))
        .select(col("user_id"), col("k"), col("duration_us"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    }
    val dC = {
      val w = Window.partitionBy("user_id").orderBy("start_us")
      st4.withColumn("k", row_number().over(w))
        .select(col("user_id"), col("k"),
          (col("end_us") - col("start_us")).as("duration_us"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    }
    assert(dA == dC, "q11 session durations != st4 session durations")
  }
}
