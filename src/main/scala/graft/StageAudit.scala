package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** One stage's task-skew observables: the direct evidence for the
  * mega-group failure class (a collapsed bucket shows up as one task
  * carrying ~the whole stage — nTasks 1, maxShare 1.0).
  */
final case class StageStat(stageId: Int, name: String, nTasks: Int,
                           sumMs: Long, maxMs: Long) {
  def maxShare: Double = if (sumMs > 0) maxMs.toDouble / sumMs else 0.0
}

/** SparkListener collecting per-stage task count / summed / max task
  * time. Reusable by the StageAudit main AND the KernelWidthSpec gate
  * (r11 verdict #2: skew evidence must be an asserting test, not PLANS
  * prose — plan-shape regressions arrive without code changes, as the
  * AQE-coalescing find proved).
  */
final class TaskSkewListener extends SparkListener {
  private val maxTaskMs = TrieMap.empty[Int, Long]
  private val sumTaskMs = TrieMap.empty[Int, Long]
  private val nTask = TrieMap.empty[Int, Int]
  private val stgName = TrieMap.empty[Int, String]

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val d = te.taskInfo.duration
    maxTaskMs.updateWith(te.stageId)(v => Some(math.max(v.getOrElse(0L), d)))
    sumTaskMs.updateWith(te.stageId)(v => Some(v.getOrElse(0L) + d))
    nTask.updateWith(te.stageId)(v => Some(v.getOrElse(0) + 1))
  }
  override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
    stgName.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n'))

  def reset(): Unit = {
    maxTaskMs.clear(); sumTaskMs.clear(); nTask.clear(); stgName.clear()
  }

  /** Snapshot AFTER the listener bus drains: events are delivered
    * asynchronously, so a fixed post-action sleep can read before the
    * just-finished query's task-end events land (r11 ADVICE —
    * undercounting sum/max task time, the exact signal the audit
    * measures). Poll until two consecutive 100 ms-apart reads agree.
    */
  def settled(maxWaitMs: Long = 10000L): Seq[StageStat] = {
    def fp: (Int, Long) = (nTask.values.sum, sumTaskMs.values.sum)
    var prev = fp
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var stable = false
    while (!stable && System.nanoTime() < deadline) {
      Thread.sleep(100L)
      val cur = fp
      stable = cur == prev && cur._1 > 0
      prev = cur
    }
    sumTaskMs.keySet.toSeq.sorted.map { sid =>
      StageStat(sid, stgName.getOrElse(sid, ""), nTask.getOrElse(sid, 0),
        sumTaskMs.getOrElse(sid, 0L), maxTaskMs.getOrElse(sid, 0L))
    }
  }
}

/** Skew-evidence harness for the scale audits: runs named SparkEntry
  * queries against a (usually ScaleGen-built) corpus and prints, per
  * Spark stage, the task count, summed task time and MAX single-task
  * time. "No single-task stage" is proven when every heavy stage's max
  * task is a small fraction of its summed time and its task count is
  * the shuffle parallelism, not 1.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.StageAudit q1 [q2 ...]
  * With SPARK_GRAFT_AUDIT_OUT=<path>, also writes one JSON artifact
  * (per-query seconds, rows, and the heavy stages' task counts and max
  * shares) so adversarial-corpus audits commit as files the next round
  * can diff, not PLANS prose (r11 verdict #7).
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE at defaults (mirrors Bench, r12): kernel width is explicit
      // in code, so the audit measures exactly what the bench runs
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prepare(spark)

    val listener = new TaskSkewListener
    spark.sparkContext.addSparkListener(listener)

    val qjson = new StringBuilder
    args.foreach { name =>
      listener.reset()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val stats = listener.settled()
      println(f"AUDITQ $name%-24s $dt%8.2f s  rows=$rows")
      val heavy = stats.sortBy(-_.sumMs).take(8)
      heavy.foreach { st =>
        println(f"  stage ${st.stageId}%4d tasks=${st.nTasks}%4d " +
          f"sum=${st.sumMs / 1000.0}%9.2f s max=${st.maxMs / 1000.0}%8.2f s " +
          f"maxShare=${st.maxShare}%5.2f  ${st.name}")
      }
      if (qjson.nonEmpty) qjson.append(",")
      // locale-pinned number rendering: the default-locale f"" renders
      // "47,38" under comma-decimal locales, corrupting the committed
      // JSON artifact
      def num(d: Double, dec: Int): String =
        String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(d))
      val stagesJson = heavy.map(st =>
        s"""{"stage":${st.stageId},"tasks":${st.nTasks},""" +
          s""""sumSec":${num(st.sumMs / 1000.0, 2)},"maxSec":${num(st.maxMs / 1000.0, 2)},""" +
          s""""maxShare":${num(st.maxShare, 3)}}""").mkString("[", ",", "]")
      // "worst share" counts only stages carrying ≥ 20% of the biggest
      // stage's summed task time: a 0.6 s single-task scan or a final
      // 1-row collect legitimately has maxShare 1.0 and says nothing
      // about kernel collapse
      val bigSum = heavy.headOption.map(_.sumMs).getOrElse(0L)
      val worst = heavy.filter(_.sumMs * 5 >= bigSum) match {
        case Seq() => 0.0
        case hs => hs.map(_.maxShare).max
      }
      qjson.append(s""""$name":{"sec":${num(dt, 2)},"rows":$rows,""" +
        s""""worstHeavyShare":${num(worst, 3)},"stages":$stagesJson}""")
      Caches.release()
      spark.catalog.clearCache()
    }
    sys.env.get("SPARK_GRAFT_AUDIT_OUT").foreach { path =>
      val esc = sfDir.replace("\\", "\\\\").replace("\"", "\\\"")
      val json = s"""{"corpus":"$esc","queries":{$qjson}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        json.getBytes("UTF-8"))
      println(s"AUDIT_OUT $path")
    }
    spark.stop()
  }
}
