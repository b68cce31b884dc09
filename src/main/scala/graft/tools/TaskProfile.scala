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
  // per-stage (max task ms, task count, total task ms) — the
  // attribution detail behind the headline max: a dominant task is only
  // actionable once you know WHICH stage, and whether it was SKEW (one
  // long task among short siblings) or a balanced-but-slow stage
  private val stageStats =
    new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()

  spark.sparkContext.addSparkListener(new SparkListener {
    override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit =
      stageNames.put(ss.stageInfo.stageId, ss.stageInfo.name.takeWhile(_ != '('))
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val d = Option(te.taskInfo).map(_.duration).getOrElse(0L)
      stageStats.merge(te.stageId, (d, 1L, d), { case ((m, n, t), _) =>
        (math.max(m, d), n + 1, t + d) })
      if (d > maxTaskMs.get) {
        maxTaskMs.set(d)
        maxStage.set(stageNames.getOrDefault(te.stageId, "?"))
      }
    }
  })

  def reset(): Unit = { maxTaskMs.set(0); stageStats.clear() }
  /** (longest task ms, owning stage name) since the last [[reset]]. */
  def snapshot: (Long, String) = (maxTaskMs.get, maxStage.get)
  /** The k stages with the longest single task since [[reset]],
    * `(stage name#id, max task ms, task count, mean task ms)`,
    * descending by max task — max ≫ mean with many tasks is skew; max ≈
    * mean is a balanced (if slow) stage. */
  def topStages(k: Int): Seq[(String, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    stageStats.asScala.toSeq.sortBy(-_._2._1).take(k).map {
      case (id, (mx, n, tot)) =>
        (s"${stageNames.getOrDefault(id, "?").trim}#$id", mx, n, tot / n)
    }
  }
}

object TaskProfile {
  def install(spark: SparkSession): TaskProfile = new TaskProfile(spark)
}
