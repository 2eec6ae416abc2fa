package graft.telemetry

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.core._

class PublisherSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("publishing collector streams metrics to composite targets") {
    val buf = new BufferPublisher
    val file = java.nio.file.Files.createTempFile("graft-metrics", ".jsonl")
    val pub = new CompositePublisher(Seq(
      buf,
      new JsonFilePublisher(file.toString),
      new MetricsPublisher { // failing target must not break the others
        def publish(m: EventMetrics): Unit = throw new RuntimeException("down")
      }))
    val collector = new PublishingCollector(pub)
    try {
      val reg = new EventRegistry
      reg.registerTransform("Ok")(_ => Seq(1).toDF("v"))
      reg.register("Boom") { _ => throw new RuntimeException("nope") }
      Pipeline.fromPointy("pub", "Ok -> Boom", reg).start(spark)

      assert(buf.published.size == 2)
      assert(buf.published.map(_.eventName) == Seq("Ok", "Boom"))
      assert(buf.published.last.status == "failed")

      val lines = java.nio.file.Files.readAllLines(file)
      assert(lines.size() == 2)
      assert(lines.get(1).contains("\"status\":\"failed\""))
      assert(lines.get(1).contains("\"event\":\"Boom\""))
    } finally collector.close()
  }
}
