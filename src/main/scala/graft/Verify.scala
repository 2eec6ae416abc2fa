package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Core dump loop, parameterized over the registry so the failure path
    * is testable with a scratch registry (VerifySpec). Writes each query
    * result to `outDir/<name>/`, `oracle_sql.json`, and a
    * `failures.json` manifest; returns the failure map (insertion order).
    * A query that throws must not silently vanish from the driver's
    * artifact — the compare walks oracle_sql.json, so a missing parquet
    * dir previously read as an omitted row, not a failure. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          queries: Seq[(String, (SparkSession, String) => DataFrame)],
          oracleSql: Map[String, String]): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage)
          .linesIterator.take(1).mkString}"
        System.err.println(s"[verify] $name failed: ${failures(name)}")
      }
    }
    val json = oracleSql
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failures.json"), failJson)
    failures.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-verify")
    // dev-only filter for targeted re-verification: SPARK_GRAFT_ONLY=dq8
    // (the driver runs unfiltered; tools/check.py walks oracle_sql.json,
    // so the dump below is filtered identically)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String): Boolean = only.forall(_.exists(name.startsWith))
    val failures = run(spark, sfDir, outDir,
      SparkEntry.queries.toSeq.filter(q => keep(q._1)),
      SparkEntry.oracleSql.filter(q => keep(q._1)))
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} quer" +
        s"${if (failures.size == 1) "y" else "ies"} failed: " +
        failures.keys.mkString(", "))
      System.exit(1)
    }
  }
}
