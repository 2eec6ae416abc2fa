package graft.core

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Batch processors — exact chunking semantics of the reference
  * (nexus/default_batch_processors.py:10-54, pinned by
  * test_default_batch_processors.py:12-48).
  */
object BatchProcessors {
  val DefaultBatchSize = 100
  val DefaultChunkSize = 10240

  /** range(10), size 3 → [(0,1,2),(3,4,5),(6,7,8),(9)]. */
  def listBatch[T](values: Seq[T], batchSize: Int = DefaultBatchSize): Iterator[Seq[T]] =
    values.grouped(batchSize)

  /** Fixed-size byte chunks from a stream ("abcde","fghij",...). */
  def byteChunks(in: java.io.InputStream,
      chunkSize: Int = DefaultChunkSize): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextChunk: Array[Byte] = read()
      private def read(): Array[Byte] = {
        val buf = in.readNBytes(chunkSize)
        if (buf.isEmpty) null else buf
      }
      def hasNext: Boolean = nextChunk != null
      def next(): Array[Byte] = {
        val c = nextChunk; nextChunk = read(); c
      }
    }
}

/** Per-run metrics of a batch execution
  * (nexus/pipeline.py:581-625 PipelineExecutionMetrics). */
final case class BatchExecutionMetrics(
    total: Int,
    succeeded: Int,
    failed: Int,
    totalDurationSec: Double) {
  def successRate: Double = if (total == 0) 0.0 else succeeded.toDouble / total
  def completionRate: Double =
    if (total == 0) 0.0 else (succeeded + failed).toDouble / total
  def averageDurationSec: Double =
    if (total == 0) 0.0 else totalDurationSec / total
}

final case class BatchRunResult(
    lineages: Seq[(Int, Either[Throwable, ExecutionLineage])],
    metrics: BatchExecutionMetrics)

/** Fans a pipeline template out over chunks of its batched inputs — the
  * BatchPipeline analog (nexus/pipeline.py:1002-1299).
  *
  * Faithful semantics: every field with a `batchSize` gets a batch
  * iterator; iterators are zipped ROUND-ROBIN, exhausting independently
  * with missing values left absent (None fill, nexus/pipeline.py:1158-1189);
  * one template run per batch tuple.
  *
  * Spark disposition: the reference needs a process pool because each
  * batch is Python-bound CPU work; here each batch run only BUILDS lazy
  * plans and Spark schedules the real work, so batches run sequentially
  * on the driver by default — `maxParallel > 1` drives concurrent Spark
  * jobs (fair-scheduler style) when batch runs contain blocking actions.
  */
final class BatchPipeline(
    template: () => Pipeline,
    maxParallel: Int = 1) {

  def execute(
      spark: SparkSession,
      inputs: Map[String, Any] = Map.empty): BatchRunResult = {
    val proto = template()
    val batched = proto.fields.filter(_.batchSize.isDefined)
    if (batched.isEmpty) {
      val t0 = System.nanoTime()
      val out = runOne(spark, 0, inputs)
      val dt = (System.nanoTime() - t0) / 1e9
      return BatchRunResult(Seq(out),
        BatchExecutionMetrics(1, if (out._2.isRight) 1 else 0,
          if (out._2.isLeft) 1 else 0, dt))
    }

    // round-robin zip of per-field batch iterators
    val iters: Seq[(String, Iterator[Any])] = batched.map { f =>
      val it: Iterator[Any] = inputs.get(f.name).orElse(f.default) match {
        case Some(xs: Seq[_])   => BatchProcessors.listBatch(xs, f.batchSize.get)
        case Some(xs: Array[_]) => BatchProcessors.listBatch(xs.toSeq, f.batchSize.get)
        case Some(one)          => Iterator.single(one)
        case None               => Iterator.empty
      }
      f.name -> it
    }

    val tuples = mutable.Buffer.empty[Map[String, Any]]
    var more = true
    while (more) {
      val step = iters.flatMap { case (n, it) =>
        if (it.hasNext) Some(n -> it.next()) else None
      }.toMap
      if (step.isEmpty) more = false
      else tuples += (inputs -- batched.map(_.name)) ++ step
    }
    if (tuples.isEmpty)
      throw ImproperlyConfigured("No batch tuples produced (PipelineConfigurationError)")

    val t0 = System.nanoTime()
    val results: Seq[(Int, Either[Throwable, ExecutionLineage])] =
      if (maxParallel <= 1)
        tuples.toSeq.zipWithIndex.map { case (kw, i) => runOne(spark, i, kw) }
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
          java.util.concurrent.Executors.newFixedThreadPool(maxParallel))
        val fs = tuples.toSeq.zipWithIndex.map { case (kw, i) =>
          Future(runOne(spark, i, kw))
        }
        try Await.result(Future.sequence(fs), Duration.Inf)
        finally ec.asInstanceOf[scala.concurrent.ExecutionContextExecutorService].shutdown()
      }
    val dt = (System.nanoTime() - t0) / 1e9

    BatchRunResult(results,
      BatchExecutionMetrics(
        total = results.size,
        succeeded = results.count(_._2.isRight),
        failed = results.count(_._2.isLeft),
        totalDurationSec = dt))
  }

  private def runOne(spark: SparkSession, i: Int, kw: Map[String, Any])
      : (Int, Either[Throwable, ExecutionLineage]) =
    try {
      val p = template()
      (i, Right(p.start(spark, kw, forceRerun = true)))
    } catch { case scala.util.control.NonFatal(e) => (i, Left(e)) }
}
