package graft.tools

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Longest-single-task probe for the scale benches: at 100 TB the
  * failure mode row-level gates can't see is ONE task holding the whole
  * stage (a single-task window, a hot key, an unsplittable collect) —
  * so every bench row reports, next to wall seconds, the longest task
  * it ran and the stage it belonged to. A flat profile (max task ≪
  * wall) is the scale evidence; one dominant task is exactly the bug
  * (the ScoreBench discipline, shared here so every tool reports it
  * the same way). */
final class TaskProfile private (spark: SparkSession) {
  private val maxTaskMs = new AtomicLong(0)
  private val maxStage = new AtomicReference[String]("")
  private val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()

  spark.sparkContext.addSparkListener(new SparkListener {
    override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit =
      stageNames.put(ss.stageInfo.stageId, ss.stageInfo.name.takeWhile(_ != '('))
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val d = Option(te.taskInfo).map(_.duration).getOrElse(0L)
      if (d > maxTaskMs.get) {
        maxTaskMs.set(d)
        maxStage.set(stageNames.getOrDefault(te.stageId, "?"))
      }
    }
  })

  def reset(): Unit = maxTaskMs.set(0)
  /** (longest task ms, owning stage name) since the last [[reset]]. */
  def snapshot: (Long, String) = (maxTaskMs.get, maxStage.get)
}

object TaskProfile {
  def install(spark: SparkSession): TaskProfile = new TaskProfile(spark)
}
