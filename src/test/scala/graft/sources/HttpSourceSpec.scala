package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core._

/** Local stub server (JDK built-in) driving the HTTP-source pattern:
  * status classification, retry-on-transient-error through the event
  * retry machinery, and the fetch feeding a Pointy pipeline — the
  * user_posts_etl example end to end. */
class HttpSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withServer[A](routes: (String, HttpExchange => Unit)*)(
      f: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => h(ex))
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def reply(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val posts =
    """[{"userId": 1, "id": 1, "title": "a"},
      | {"userId": 1, "id": 2, "title": "b"},
      | {"userId": 2, "id": 3, "title": "c"}]""".stripMargin

  test("fetchJson turns a JSON array endpoint into rows") {
    withServer("/posts" -> (reply(_, 200, posts))) { base =>
      val df = HttpSource.fetchJson(spark, s"$base/posts")
      assert(df.count() == 3)
      assert(df.columns.sorted.toSeq == Seq("id", "title", "userId"))
    }
  }

  test("status codes classify into the typed exceptions") {
    withServer(
      "/bad" -> (reply(_, 400, "")),
      "/missing" -> (reply(_, 404, "")),
      "/boom" -> (reply(_, 503, ""))) { base =>
      intercept[HttpSource.BadRequestException](
        HttpSource.fetchString(s"$base/bad"))
      intercept[HttpSource.NotFoundException](
        HttpSource.fetchString(s"$base/missing"))
      val e = intercept[HttpSource.ServerErrorException](
        HttpSource.fetchString(s"$base/boom"))
      assert(e.status == 503)
    }
  }

  test("transient 500s are retried away by the event retry policy; 404 is not") {
    val flaky = new AtomicInteger(0)
    withServer(
      "/flaky" -> { ex =>
        if (flaky.incrementAndGet() <= 2) reply(ex, 500, "")
        else reply(ex, 200, posts)
      },
      "/gone" -> (reply(_, 404, ""))) { base =>
      val policy = RetryPolicy(maxAttempts = 5, backoffFactor = 0.001,
        retryOnExceptions = Seq(classOf[HttpSource.ServerErrorException]))
      val out = Retry.run(Some(policy))(
        HttpSource.fetchJson(spark, s"$base/flaky"))
      assert(out.count() == 3)
      assert(flaky.get() == 3) // 2 failures + 1 success
      intercept[HttpSource.NotFoundException] {
        Retry.run(Some(policy))(HttpSource.fetchJson(spark, s"$base/gone"))
      }
    }
  }

  test("executor-side fetch fans page cursors out with per-partition clients") {
    val hits = new AtomicInteger(0)
    // 6 cursor pages, each its own JSON array slice
    withServer("/page" -> { ex =>
      hits.incrementAndGet()
      val cursor = ex.getRequestURI.getQuery.stripPrefix("c=").toInt
      reply(ex, 200,
        s"""[{"id": ${cursor * 2}, "page": $cursor},
           | {"id": ${cursor * 2 + 1}, "page": $cursor}]""".stripMargin)
    }) { base =>
      import spark.implicits._
      val urls = spark.createDataset((0 until 6).map(c => s"$base/page?c=$c"))
        .repartition(3) // 3 partitions = 3 pooled clients
      val pages = HttpSource.fetchDistributed(urls)
      assert(pages.rdd.getNumPartitions == 3)
      val got = pages.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got.size == 6 && hits.get() == 6) // every cursor fetched once
      assert(got(s"$base/page?c=4").contains("\"id\": 8"))

      // the parsed variant: all pages land as one schema-inferred table
      hits.set(0)
      val df = HttpSource.fetchJsonPages(spark,
        (0 until 6).map(c => s"$base/page?c=$c"), numPartitions = 3)
      assert(df.count() == 12 && hits.get() == 6)
      assert(df.select(sum("id")).head().getLong(0) == (0 until 12).sum)
    }
  }

  test("per-request retry inside a partition survives transient 500s") {
    val flaky = new AtomicInteger(0)
    val total = new AtomicInteger(0)
    withServer("/page" -> { ex =>
      total.incrementAndGet()
      val cursor = ex.getRequestURI.getQuery.stripPrefix("c=").toInt
      // cursor 2 fails twice before succeeding; others succeed at once
      if (cursor == 2 && flaky.incrementAndGet() <= 2) reply(ex, 503, "")
      else reply(ex, 200, s"""{"c": $cursor}""")
    }) { base =>
      import spark.implicits._
      val urls = spark.createDataset((0 until 4).map(c => s"$base/page?c=$c"))
        .repartition(2)
      val policy = RetryPolicy(maxAttempts = 5, backoffFactor = 0.001,
        retryOnExceptions = Seq(classOf[HttpSource.ServerErrorException]))
      val got = HttpSource.fetchDistributed(urls, retry = Some(policy))
        .collect().map(_.getString(1)).toSet
      assert(got == (0 until 4).map(c => s"""{"c": $c}""").toSet)
      // 4 pages + 2 retried failures — the healthy pages fetched ONCE
      // (a task-level retry would have refetched the whole partition)
      assert(total.get() == 6 && flaky.get() == 3)
    }
  }

  test("a typed status failure on an executor fails the distributed fetch") {
    withServer(
      "/page" -> (reply(_, 200, """{"ok": 1}""")),
      "/gone" -> (reply(_, 404, ""))) { base =>
      import spark.implicits._
      val urls = spark.createDataset(Seq(s"$base/page", s"$base/gone"))
      val e = intercept[org.apache.spark.SparkException] {
        HttpSource.fetchDistributed(urls).count()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      assert(causes(e).exists(_.isInstanceOf[HttpSource.NotFoundException]))
    }
  }

  test("HTTP fetch feeds a Pointy pipeline (user_posts_etl shape)") {
    withServer("/posts" -> (reply(_, 200, posts))) { base =>
      val reg = new EventRegistry
      reg.register("LoadData",
        retry = Some(RetryPolicy(maxAttempts = 3, backoffFactor = 0.001,
          retryOnExceptions = Seq(classOf[HttpSource.ServerErrorException])))) {
        ctx => (true, HttpSource.fetchJson(ctx.spark, ctx.input[String]("url")))
      }
      reg.registerTransform("ProcessData") { ctx =>
        ctx.previousContent.get
          .groupBy("userId").agg(count(lit(1)).as("n_posts"))
      }
      reg.registerTransform("SaveToDb") { ctx =>
        ctx.previousContent.get.orderBy("userId")
      }
      val lineage = Pipeline
        .fromPointy("etl", "LoadData |-> ProcessData |-> SaveToDb", reg)
        .start(spark, Map("url" -> s"$base/posts"))
      val rows = lineage.finalResult.content.get.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 2L), (2L, 1L)))
    }
  }
}
