package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** One completed Spark stage, attributed to the pipeline directory whose
  * job group ran it. All byte counts are summed task metrics. */
final case class StageMetricsRow(
    group: String, stageId: Int, name: String, numTasks: Int,
    runTimeMs: Long, inputBytes: Long, outputBytes: Long,
    shuffleReadBytes: Long, shuffleWriteBytes: Long, spilledBytes: Long)

/** EP1 monitoring — the engine-native replacement for the reference's
  * driver-side psutil sampler (reference: src/monitoring/
  * pipeline_monitor.py:11-17 polls process CPU/RSS once per stage). A
  * `SparkListener` sees what actually matters at cluster scale: per-STAGE
  * task counts, input/output/shuffle bytes and spills, attributed to the
  * per-directory job group — executor-side truth, not driver-process
  * vitals, and it works unchanged on a 1000-executor cluster where there
  * is no single process to poll (SURVEY.md §7.7).
  *
  * The listener bus is asynchronous; [[Pipeline.runInstrumented]] settles
  * the queue before snapshotting. Accumulation is driver-side and O(#
  * stages) — a few hundred tiny rows per pipeline run, not data-scale.
  */
final class PipelineMetrics extends SparkListener {

  private val groups = scala.collection.concurrent.TrieMap.empty[Int, String]
  private val done = new java.util.concurrent.ConcurrentLinkedQueue[StageMetricsRow]

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val g = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
    e.stageIds.foreach(id => groups.put(id, g))
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val si = e.stageInfo
    val tm = si.taskMetrics
    done.add(StageMetricsRow(
      groups.getOrElse(si.stageId, ""),
      si.stageId,
      si.name.linesIterator.nextOption().getOrElse("").take(120),
      si.numTasks,
      tm.executorRunTime,
      tm.inputMetrics.bytesRead,
      tm.outputMetrics.bytesWritten,
      tm.shuffleReadMetrics.totalBytesRead,
      tm.shuffleWriteMetrics.bytesWritten,
      tm.memoryBytesSpilled + tm.diskBytesSpilled))
  }

  def snapshot: Seq[StageMetricsRow] = {
    import scala.jdk.CollectionConverters._
    done.iterator.asScala.toSeq.sortBy(_.stageId)
  }
}
