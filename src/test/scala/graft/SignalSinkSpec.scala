package graft

import graft.sources.SignalSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SignalSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sinkspec").toString

  test("writeSignals partitions by day, prunes on read-back, sorts within files") {
    val day0 = 1700000000L - (1700000000L % 86400L)
    val rows = for {
      d <- 0 until 3; i <- 0 until 50
    } yield ("cpu", s"n${i % 2}", day0 + d * 86400L + i * 900L, i.toDouble)
    val path = tmp()
    SignalSink.writeSignals(rows.toDF("name", "node", "tsb", "value"), path)
    val dayDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName).sorted
    assert(dayDirs.length == 3)
    // partition pruning: one day back = exactly that day's rows
    val oneDay = SignalSink.readSignals(spark, path, Seq(dayDirs.head.stripPrefix("day=")))
    assert(oneDay.count() == 50)
    assert(SignalSink.readSignals(spark, path).count() == 150)
    // pruning reaches the scan: only one partition's files are listed
    val scanned = oneDay.queryExecution.executedPlan.toString()
    assert(!scanned.contains(dayDirs.last), "pruned day should not be scanned")
  }

  test("writeResult round-trips a small sorted table as one file") {
    val path = tmp()
    SignalSink.writeResult(
      Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("rank", "who"),
      path, sortCols = Seq("rank"))
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
    val back = spark.read.parquet(path).orderBy("rank").as[(Long, String)].collect().toSeq
    assert(back == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("streamSignals drains a stream into day-partitioned parquet exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Double)]
    val day0 = 1700000000L - (1700000000L % 86400L)
    mem.addData(("cpu", "n0", day0, 1.0), ("cpu", "n0", day0 + 86400L, 2.0))
    val path = tmp(); val ckpt = tmp()
    val q = SignalSink.streamSignals(
      mem.toDF().toDF("name", "node", "tsb", "value"), path, ckpt)
    q.awaitTermination(60000L)
    assert(spark.read.parquet(path).count() == 2)
    // restart with no new data: the checkpoint prevents a rewrite
    val q2 = SignalSink.streamSignals(
      mem.toDF().toDF("name", "node", "tsb", "value"), path, ckpt)
    q2.awaitTermination(60000L)
    assert(spark.read.parquet(path).count() == 2)
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("day=")) == 2)
  }
}
