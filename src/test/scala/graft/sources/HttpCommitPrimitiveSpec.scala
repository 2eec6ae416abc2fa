package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[HttpConditionalPutCommitPrimitive]] against an in-process JDK
  * HttpServer implementing S3-style conditional semantics (PUT
  * If-None-Match: * is an atomic first-writer-wins; DELETE If-Match
  * is an atomic tag-checked remove) — proving the trait contract
  * closes over a real network round-trip, not just in-process atomics.
  * The object map is the single authority, like the bucket it models;
  * an unconditional DELETE plays the lifecycle policy. */
class HttpCommitPrimitiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // KV is the shared top-level fixture case class (SourcesSpec.scala)

  /** body + ETag per object path; all mutation through atomic map ops
    * (the server dispatches exchanges concurrently). Fault injection:
    * `failNext` 503s the next N requests WITHOUT applying them (a
    * store brown-out); `dropPutResponseNext` APPLIES the next N
    * successful conditional PUTs and then 503s — the "mutation landed,
    * success response lost on the wire" fault that makes a naive
    * retry 412 against the writer's own claim. */
  private final class Bucket {
    val objects =
      new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
    val failNext = new java.util.concurrent.atomic.AtomicInteger(0)
    val dropPutResponseNext =
      new java.util.concurrent.atomic.AtomicInteger(0)
    def handler(ex: HttpExchange): Unit = {
      val path = ex.getRequestURI.getPath
      def reply(status: Int, body: String): Unit = {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status,
          if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
      if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        reply(503, "injected brown-out")
        return
      }
      ex.getRequestMethod match {
        case "PUT" =>
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          if (!"*".equals(ex.getRequestHeaders.getFirst("If-None-Match")))
            reply(400, "only If-None-Match: * supported")
          else {
            val etag = "\"" + java.util.UUID.randomUUID() + "\""
            if (objects.putIfAbsent(path, (body, etag)) == null) {
              if (dropPutResponseNext
                  .getAndUpdate(n => math.max(0, n - 1)) > 0)
                reply(503, "injected lost-201")
              else {
                ex.getResponseHeaders.set("ETag", etag)
                reply(200, "")
              }
            } else reply(412, "")
          }
        case "GET" =>
          Option(objects.get(path)) match {
            case Some((body, etag)) =>
              ex.getResponseHeaders.set("ETag", etag)
              reply(200, body)
            case None => reply(404, "")
          }
        case "DELETE" =>
          Option(ex.getRequestHeaders.getFirst("If-Match")) match {
            case Some(tag) =>
              val cur = objects.get(path)
              if (cur == null) reply(404, "")
              else if (cur._2 == tag && objects.remove(path, cur))
                reply(204, "")
              else reply(412, "")
            case None => // lifecycle policy / admin: unconditional
              objects.remove(path)
              reply(204, "")
          }
        case m => reply(405, m)
      }
    }
  }

  private def withBucket[A](f: (String, Bucket) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    val bucket = new Bucket
    server.createContext("/", (ex: HttpExchange) => bucket.handler(ex))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/claims", bucket)
    finally server.stop(0)
  }

  private def withHttpPrimitive[A](endpoint: String)(body: => A): A = {
    spark.conf.set("spark.graft.store.commitPrimitive", endpoint)
    try body
    finally spark.conf.unset("spark.graft.store.commitPrimitive")
  }

  private def tableState(store: ResultStore, schema: String) =
    store.read(schema).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-http-cp").toString

  test("HTTP conditional put: a live claimant paused past ANY lease " +
    "commits on its first attempt; the contender is refused while the " +
    "claim object exists; both updates land") {
    withBucket { (endpoint, _) =>
      withHttpPrimitive(endpoint) {
        val root = tmpDir()
        val plain = new ResultStore(spark, root)
        plain.upsertContended("t", Seq(KV(1, "base")).toDF(), "k")
        val claimedL = new java.util.concurrent.CountDownLatch(1)
        val resume = new java.util.concurrent.CountDownLatch(1)
        @volatile var attempts = 0
        val pausing = new ResultStore(spark, root) {
          override protected def beforeSwapHook(): Unit =
            if (attempts == 1) {
              claimedL.countDown()
              resume.await(120, java.util.concurrent.TimeUnit.SECONDS)
              ()
            }
        }
        spark.conf.set("spark.graft.store.txnLeaseMs", "1")
        try {
          val errs =
            new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
          val a = new Thread(() =>
            try pausing.transact("t") { cur =>
              attempts += 1
              cur.get.unionByName(Seq(KV(2, "a")).toDF())
            } catch { case t: Throwable => errs.add(t) })
          a.start()
          assert(claimedL.await(120,
            java.util.concurrent.TimeUnit.SECONDS))
          Thread.sleep(50) // any time-based lease long expired
          intercept[java.util.ConcurrentModificationException](
            plain.upsertContended("t", Seq(KV(3, "b")).toDF(), "k",
              maxAttempts = 2))
          resume.countDown()
          a.join(120000)
          assert(errs.isEmpty, errs.toArray.mkString("; "))
          assert(attempts == 1,
            s"nothing can fence a live HTTP claimant, took $attempts")
          plain.upsertContended("t", Seq(KV(3, "b")).toDF(), "k")
          assert(tableState(plain, "t") ==
            Map(1L -> "base", 2L -> "a", 3L -> "b"))
        } finally spark.conf.unset("spark.graft.store.txnLeaseMs")
      }
    }
  }

  test("HTTP conditional put: a crashed claim blocks its slot until " +
    "the lifecycle DELETE; release is tag-checked so a foreign claim " +
    "survives a stale releaser") {
    withBucket { (endpoint, bucket) =>
      withHttpPrimitive(endpoint) {
        val root = tmpDir()
        val store = new ResultStore(spark, root)
        store.upsertContended("t", Seq(KV(1, "a")).toDF(), "k")
        val crashy = new ResultStore(spark, root) {
          override protected def beforeSwapHook(): Unit =
            throw new RuntimeException("crash between claim and flip")
        }
        intercept[RuntimeException](
          crashy.upsertContended("t", Seq(KV(2, "b")).toDF(), "k"))
        assert(tableState(store, "t") == Map(1L -> "a"))
        // the dead claim object holds the slot
        intercept[java.util.ConcurrentModificationException](
          store.upsertContended("t", Seq(KV(3, "c")).toDF(), "k",
            maxAttempts = 2))
        // lifecycle policy: unconditional DELETE of the claim OBJECT
        // only — the strand generation dir stays on the data
        // filesystem (the bucket never holds data). The next claimant
        // of the slot must recover it itself: it holds the claim
        // object, sweeps the uncommitted strand, and commits — the
        // schema must NOT wedge on FileAlreadyExistsException.
        val slotKey = bucket.objects.keySet().iterator().next()
        assert(slotKey.endsWith("/_TXN-v00000002"), slotKey)
        val http = java.net.http.HttpClient.newHttpClient()
        http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(endpoint.stripSuffix("/claims") +
              slotKey)).DELETE().build(),
          java.net.http.HttpResponse.BodyHandlers.discarding())
        val strand = new java.io.File(s"$root/t/v00000002")
        assert(strand.isDirectory,
          "precondition: the crash must have stranded the version dir")
        store.upsertContended("t", Seq(KV(2, "b2")).toDF(), "k")
        assert(tableState(store, "t") == Map(1L -> "a", 2L -> "b2"))
        // tag-checked release: plant a foreign claim, then have a
        // stale token try to release it — the object must survive
        val foreign = java.net.URI.create(s"$endpoint/foreign/_TXN-v1")
        http.send(java.net.http.HttpRequest.newBuilder(foreign)
            .header("If-None-Match", "*")
            .PUT(java.net.http.HttpRequest.BodyPublishers
              .ofString("their-token")).build(),
          java.net.http.HttpResponse.BodyHandlers.discarding())
        HttpConditionalPutCommitPrimitive.forEndpoint(endpoint)
          .release(new java.io.File("/foreign-root"), "v1", "not-theirs")
        val got = http.send(java.net.http.HttpRequest.newBuilder(foreign)
            .GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(got.statusCode() == 200 && got.body() == "their-token")
      }
    }
  }

  test("HTTP conditional put: two live threads over one root converge " +
    "to the serial result; no claim objects remain") {
    withBucket { (endpoint, bucket) =>
      withHttpPrimitive(endpoint) {
        val root = tmpDir()
        val store = new ResultStore(spark, root)
        store.upsertContended("t",
          Seq(KV(1, "z"), KV(2, "z"), KV(3, "z"), KV(4, "z")).toDF(), "k")
        val aSeq = Seq(Seq(KV(2, "a1")), Seq(KV(4, "a2")))
        val bSeq = Seq(Seq(KV(1, "b1")), Seq(KV(3, "b2")))
        val errs =
          new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val threads = Seq(aSeq, bSeq).map { seq =>
          new Thread(() =>
            try seq.foreach(rows =>
              store.upsertContended("t", rows.toDF(), "k"))
            catch { case t: Throwable => errs.add(t) })
        }
        threads.foreach(_.start()); threads.foreach(_.join(120000))
        assert(errs.isEmpty, errs.toArray.mkString("; "))
        assert(tableState(store, "t") ==
          Map(1L -> "b1", 2L -> "a1", 3L -> "b2", 4L -> "a2"))
        assert(bucket.objects.isEmpty,
          "released claims must leave no objects: " + bucket.objects)
      }
    }
  }

  test("fault injection: a claim PUT whose success response is lost " +
    "on the wire still wins the slot (the retry 412s against our own " +
    "claim and the token-compare GET resolves it) — never a spurious " +
    "rebase, never an abandoned claim") {
    withBucket { (endpoint, bucket) =>
      withHttpPrimitive(endpoint) {
        val root = tmpDir()
        val store = new ResultStore(spark, root)
        store.upsertContended("t", Seq(KV(1, "a")).toDF(), "k")
        @volatile var derives = 0
        bucket.dropPutResponseNext.set(1)
        store.transact("t") { cur =>
          derives += 1
          cur.get.unionByName(Seq(KV(2, "b")).toDF())
        }
        assert(derives == 1,
          s"lost-201 must not cost a rebase (derives=$derives)")
        assert(tableState(store, "t") == Map(1L -> "a", 2L -> "b"))
        assert(bucket.objects.isEmpty,
          "the recovered claim must still release: " + bucket.objects)
      }
    }
  }

  test("fault injection: transient 5xx brown-outs during claim / " +
    "verify / release are absorbed by bounded retry — the commit " +
    "lands without surfacing, and a PERSISTENT outage surfaces as " +
    "IOException (store unavailable), never as a silent fenced/lost " +
    "race") {
    withBucket { (endpoint, bucket) =>
      withHttpPrimitive(endpoint) {
        val root = tmpDir()
        val store = new ResultStore(spark, root)
        store.upsertContended("t", Seq(KV(1, "a")).toDF(), "k")
        // two-deep brown-out at the claim PUT: attempt 3 succeeds
        bucket.failNext.set(2)
        store.upsertContended("t", Seq(KV(2, "b")).toDF(), "k")
        // brown-out landing exactly on the FENCING VERIFY (armed
        // after the move, before the pointer flip): answering false
        // there would silently strand the moved generation — the
        // verify must retry through it and the commit must land
        val verifyFaulted = new ResultStore(spark, root) {
          override protected def beforeSwapHook(): Unit =
            bucket.failNext.set(2)
        }
        verifyFaulted.upsertContended("t", Seq(KV(3, "c")).toDF(), "k")
        assert(tableState(store, "t") ==
          Map(1L -> "a", 2L -> "b", 3L -> "c"))
        assert(bucket.objects.isEmpty, bucket.objects.toString)
        // persistent outage: every attempt 503s — must surface as the
        // store being down, not melt into a rebase loop or a fence
        bucket.failNext.set(1000)
        try {
          intercept[java.io.IOException](
            store.upsertContended("t", Seq(KV(4, "d")).toDF(), "k",
              maxAttempts = 2))
        } finally bucket.failNext.set(0)
      }
    }
  }
}
