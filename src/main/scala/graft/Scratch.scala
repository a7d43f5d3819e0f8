package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Plan-metrics probe (r12 optimization round): per query, count
  * jobs / stages / tasks and shuffle bytes — deterministic observables
  * for A/B-ing plan shapes while the shared host's speed drifts.
  * `SPARK_GRAFT_PM_SITES=1` additionally groups job-submission call
  * sites, which localizes which action a job count belongs to. Not
  * part of the driver contract — a measurement tool, like BenchSome.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prepare(spark)
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufW = new AtomicLong; val shufR = new AtomicLong
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        sites.add(j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?"))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    val dumpSites = sys.env.contains("SPARK_GRAFT_PM_SITES")
    args.foreach { name =>
      jobs.set(0); stages.set(0); tasks.set(0); shufW.set(0); shufR.set(0)
      sites.clear()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      println(f"PLANQ $name%-26s ${dt}%7.2f s rows=$rows%-8d jobs=${jobs.get}%3d stages=${stages.get}%4d tasks=${tasks.get}%5d shufW=${shufW.get / 1024}%8d KB shufR=${shufR.get / 1024}%8d KB")
      if (dumpSites) {
        import scala.jdk.CollectionConverters._
        sites.asScala.groupBy(identity).toSeq.sortBy(-_._2.size)
          .foreach { case (s, g) => println(f"  JOBSITE ${g.size}%3d  $s") }
      }
      Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
