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
  * The fetch is driver-side by design: an external API is one
  * rate-limited endpoint, not a partitioned dataset — the data becomes
  * distributed the moment it lands in a DataFrame. When an API exposes
  * keyed pagination, distribute the PAGE fetches instead: build a
  * Dataset of page cursors and fetch inside mapPartitions, keeping
  * this status-classification logic per request.
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

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** GET a body as a string, raising the typed status exceptions. */
  def fetchString(url: String, timeoutMs: Long = 30000): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 400                      => throw new BadRequestException(url)
      case 404                      => throw new NotFoundException(url)
      case s if s >= 500            => throw new ServerErrorException(s, url)
      case s if s < 200 || s >= 300 => throw new HttpStatusException(s, url)
      case _                        => resp.body()
    }
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
