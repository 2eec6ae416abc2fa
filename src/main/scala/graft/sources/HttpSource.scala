package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Driver-fetch HTTP source — the external-API ingestion pattern of the
  * reference's user_posts_etl example (examples/user_posts_etl/
  * events.py:14-59): fetch on the driver, classify status codes into
  * typed exceptions so a RetryPolicy can target exactly the transient
  * ones, parse the JSON body, and hand rows to Spark.
  *
  * Single-document fetches are driver-side by design: an external API
  * is one rate-limited endpoint, not a partitioned dataset — the data
  * becomes distributed the moment it lands in a DataFrame. When an API
  * exposes keyed pagination, [[fetchDistributed]] distributes the PAGE
  * fetches instead: a Dataset of page URLs fans out across executors,
  * each partition opens ONE connection-pooled client inside
  * mapPartitions and applies the same status-classification per
  * request (the reference's worker-pool fetch,
  * examples/user_posts_etl/events.py:14-59, re-expressed as a
  * partitioned Spark job).
  */
object HttpSource {

  /** Typed status errors (custom_exception.py of the reference example):
    * retry policies match on exact class, so each classification the
    * reference distinguishes gets its own type. */
  class HttpStatusException(val status: Int, val url: String)
      extends RuntimeException(s"HTTP $status from $url")
  final class BadRequestException(u: String) extends HttpStatusException(400, u)
  final class NotFoundException(u: String) extends HttpStatusException(404, u)
  final class ServerErrorException(s: Int, u: String)
      extends HttpStatusException(s, u)

  private def newClient(): HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  private lazy val client: HttpClient = newClient()

  private def fetchWith(c: HttpClient, url: String, timeoutMs: Long): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build()
    val resp = c.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 400                      => throw new BadRequestException(url)
      case 404                      => throw new NotFoundException(url)
      case s if s >= 500            => throw new ServerErrorException(s, url)
      case s if s < 200 || s >= 300 => throw new HttpStatusException(s, url)
      case _                        => resp.body()
    }
  }

  /** GET a body as a string, raising the typed status exceptions. */
  def fetchString(url: String, timeoutMs: Long = 30000): String =
    fetchWith(client, url, timeoutMs)

  /** Executor-side fan-out over page cursors: each partition of `urls`
    * builds one client (clients are connection-pooled and NOT
    * serializable — construct inside the partition, never capture) and
    * fetches its URLs through it, yielding (url, body) rows. Status
    * classification matches [[fetchString]], so a typed failure on any
    * executor fails the job with the same exception a retry policy
    * targets. `retry` applies the event retry machinery PER REQUEST
    * inside the partition — a transient 500 on one page retries that
    * page with backoff instead of failing (and re-running) the whole
    * task, which would refetch every other page in the partition.
    * Partition count = concurrent connections: size `urls` with
    * `repartition(n)` to the API's rate budget. */
  def fetchDistributed(
      urls: org.apache.spark.sql.Dataset[String],
      timeoutMs: Long = 30000,
      retry: Option[graft.core.RetryPolicy] = None): DataFrame = {
    import urls.sparkSession.implicits._
    urls.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val c = newClient()
        it.map(u =>
          (u, graft.core.Retry.run(retry)(fetchWith(c, u, timeoutMs))))
      }
    }.toDF("url", "body")
  }

  /** Distributed paged-JSON ingest: fan the page URLs out with
    * [[fetchDistributed]], then parse every page body (a JSON object or
    * array per page; for JSON-lines pages split the body first) into
    * rows with one schema-inferring pass. */
  def fetchJsonPages(
      spark: SparkSession,
      urls: Seq[String],
      numPartitions: Int = 0,
      timeoutMs: Long = 30000): DataFrame = {
    import spark.implicits._
    // zero pages (an empty result window) is a valid request: no
    // bodies to infer a schema from, so the empty frame is columnless
    if (urls.isEmpty) return spark.emptyDataFrame
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(urls.size, spark.sparkContext.defaultParallelism))
    val ds = spark.createDataset(urls).repartition(parts)
    // materialize the pages ONCE: the JSON reader's schema-inference
    // pass and every downstream action would otherwise re-execute the
    // fetch against the external API (lazy plans re-run their source)
    val bodies = fetchDistributed(ds, timeoutMs).select("body").as[String]
      .localCheckpoint()
    spark.read.option("multiLine", "true").json(bodies)
  }

  /** GET a JSON document (object or array) as a DataFrame: the body
    * enters Spark as a one-row Dataset[String] and the JSON source
    * infers the schema — multiLine so a top-level array becomes rows. */
  def fetchJson(spark: SparkSession, url: String,
      timeoutMs: Long = 30000): DataFrame =
    jsonBody(spark, fetchString(url, timeoutMs))

  /** Parse an in-hand JSON string (already fetched) into a DataFrame. */
  def jsonBody(spark: SparkSession, body: String): DataFrame =
    spark.read.option("multiLine", "true")
      .json(spark.createDataset(Seq(body))(Encoders.STRING))

  /** GET a JSON-lines endpoint: one JSON object per line. */
  def fetchJsonLines(spark: SparkSession, url: String,
      timeoutMs: Long = 30000): DataFrame = {
    val lines = fetchString(url, timeoutMs).split("\n").toSeq
      .map(_.trim).filter(_.nonEmpty)
    spark.read.json(spark.createDataset(lines)(Encoders.STRING))
  }
}
