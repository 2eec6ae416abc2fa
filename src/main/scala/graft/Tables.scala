package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`; reads go through
  * `spark.read.parquet` so Catalyst handles column pruning + predicate
  * pushdown into the scan. At cluster scale the same call reads a
  * directory of many files — nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses unless `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * [[Sessions.tune]]). With that conf the column arrives as Long nanos;
    * normalize it to a micros TimestampType here with integer division
    * (a double division would lose precision above 2^53 ns). Queries must
    * still truncate ts on BOTH engine and oracle side before comparing —
    * DuckDB keeps the nanos we drop.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case None => df
    }
  }

  /** Register all tables as temp views so spark.sql(...) mirrors the
    * DuckDB oracle's table naming. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
