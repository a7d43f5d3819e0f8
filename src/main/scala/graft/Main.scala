package graft

import graft.report.AdvisorReport
import graft.sources.{MetricsCsv, MetricsProm, MetricsTar}
import org.apache.spark.sql.SparkSession

/** The CLI the reference exposes (`python metrics_advisor.py <bundle>`,
  * metrics_advisor.py main): metrics bundle in → markdown advisor
  * report out.
  *
  * Usage:
  *   graft.Main <bundle.tar.gz | csv-dir> [out.md] [obj1,obj2,...]
  *
  * The bundle is read with MetricsTar (.tar.gz/.tgz), MetricsProm
  * (.prom/.txt Prometheus exposition dumps) or MetricsCsv (directory
  * of reshaped CSVs); the advisor pipeline runs distributed and only
  * the final ranked rows are collected for rendering.
  */
object Main {

  /** The reference's default objective set for real metrics bundles
    * (metrics_advisor.py:142 `obj_signals`).
    */
  val RefObjectives: Seq[String] =
    Seq("tidb_p99_rt:total", "tidb_p99_get_token_dur", "tidb_heap_size:by_instance")

  /** Native sample step of a signal frame: the smallest positive delta
    * over the (bounded) distinct-timestamp prefix. The reference
    * hardcodes 15 s for its bundles (metrics_advisor.py:125); inferring
    * it keeps one CLI working for 15 s TiDB bundles and hourly synthetic
    * dumps alike. Bounded collect: ≤2000 longs.
    */
  private def inferStepSec(signals: org.apache.spark.sql.DataFrame): Long = {
    val ts = signals.select("tsec").distinct().orderBy("tsec").limit(2000)
      .collect().map(_.getLong(0))
    val ds = ts.sliding(2).collect { case Array(a, b) if b > a => b - a }.toSeq
    if (ds.isEmpty) 3600L else ds.min
  }

  def run(spark: SparkSession, input: String, objNames: Seq[String]): String = {
    val signals =
      // any tar spelling routes to the sniffing tar reader — the
      // shipped bundles include plain-tar `cluster-4048.gz.tar`
      if (input.endsWith(".tar.gz") || input.endsWith(".tgz") ||
          input.endsWith(".tar") || input.endsWith(".gz"))
        MetricsTar.read(spark, input)
      else if (input.endsWith(".prom") || input.endsWith(".txt"))
        MetricsProm.signals(spark, input)
      else MetricsCsv.read(spark, input)
    // bucket = 40 samples, the reference's count_bucket × sample step
    // (metrics_advisor.py:124-125: 40 × 15 s = 10 min on its bundles)
    val step = inferStepSec(signals)
    val cfg = AdvisorReport.Config(objNames = objNames,
      stepSec = step, bucketSec = 40L * step)
    val grid = AdvisorReport.gatedGrid(signals, cfg)
    val advice = AdvisorReport.adviseOnGrid(grid, cfg)
    val report = AdvisorReport.renderMarkdown(advice, Some(grid), cfg = cfg)
    // render collected everything it needs — release the cached grid
    AdvisorReport.release(grid)
    report
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.Main <bundle.tar.gz | csv-dir> [out.md] [obj1,obj2,...]\n" +
        "       graft.Main --curate <docs.jsonl | parquet-path> [out.md]")
      sys.exit(2)
    }
    val curate = args(0) == "--curate"
    val rest = if (curate) args.drop(1) else args
    val input = rest(0)
    val outPath = if (rest.length > 1) rest(1) else "report.md"
    val objNames =
      if (!curate && rest.length > 2) rest(2).split(",").toSeq
      else RefObjectives
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prepare(spark)
    val report =
      if (curate) graft.report.CurationReport.run(spark, input)
      else run(spark, input, objNames)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), report)
    println(s"wrote $outPath")
    spark.stop()
  }
}
