package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Skew-evidence harness for the scale audits: runs named SparkEntry
  * queries against a (usually ScaleGen-built) corpus and prints, per
  * Spark stage, the task count, summed task time and MAX single-task
  * time — the direct observable for the mega-group failure class (a
  * collapsed bucket shows up as one task carrying ~the whole stage).
  * "No single-task stage" is proven when every heavy stage's max task
  * is a small fraction of its summed time and its task count is the
  * shuffle parallelism, not 1.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.StageAudit q1 [q2 ...]
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE's default 1 MB minPartitionSize floor coalesces the signal
      // grid's few-MB keyed exchanges to 1-3 partitions, serializing
      // per-signal windows on an otherwise idle 32-core host (and it
      // re-collapsed the tiled pair kernels the same way before their
      // explicit repartition). Local benches measure PLANS, not the
      // floor: drop it so parallelism-first coalescing actually keeps
      // the session's 32-way parallelism. Cluster deployments at real
      // data sizes never see sub-MB hot exchanges and keep defaults.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64kb")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prepare(spark)

    val maxTaskMs = TrieMap.empty[Int, Long]
    val sumTaskMs = TrieMap.empty[Int, Long]
    val nTasks = TrieMap.empty[Int, Int]
    val stageName = TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        maxTaskMs.updateWith(te.stageId)(v => Some(math.max(v.getOrElse(0L), d)))
        sumTaskMs.updateWith(te.stageId)(v => Some(v.getOrElse(0L) + d))
        nTasks.updateWith(te.stageId)(v => Some(v.getOrElse(0) + 1))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageName.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n'))
    })

    args.foreach { name =>
      maxTaskMs.clear(); sumTaskMs.clear(); nTasks.clear(); stageName.clear()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // a stage must settle before we read it; count() already joined
      Thread.sleep(300)
      println(f"AUDITQ $name%-24s $dt%8.2f s  rows=$rows")
      val heavy = sumTaskMs.toSeq.sortBy(-_._2).take(8)
      heavy.foreach { case (sid, sum) =>
        val mx = maxTaskMs.getOrElse(sid, 0L)
        val n = nTasks.getOrElse(sid, 0)
        val share = if (sum > 0) mx.toDouble / sum else 0.0
        println(f"  stage $sid%4d tasks=$n%4d sum=${sum / 1000.0}%9.2f s " +
          f"max=${mx / 1000.0}%8.2f s maxShare=$share%5.2f  " +
          stageName.getOrElse(sid, ""))
      }
      Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
