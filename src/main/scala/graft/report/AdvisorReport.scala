package graft.report

import graft.operators.{ChangePoints, Correlate, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end advisor pipeline — the whole reference program
  * (metrics_advisor.py main): ingest → grid → anomaly detection →
  * bucket → correlate against objective signals → rank → report.
  * The reference renders Jinja2 markdown + matplotlib PNGs
  * (templates/report.tpl); here the analytic table is the product and a
  * small markdown renderer summarizes it.
  */
object AdvisorReport {

  final case class Config(
      objNames: Seq[String] = Seq("click", "error"),
      stepSec: Long = 3600L,
      bucketSec: Long = 86400L,
      nodeMod: Int = 4,
      topK: Int = 5)

  /** Dense forward-filled grid from long signals (name, node, tsec,
    * value) — the shape every source module emits.
    */
  def buildGridFromSignals(signals: DataFrame, cfg: Config = Config()): DataFrame = {
    val g = TimeSeries.resample(signals, cfg.stepSec)
    TimeSeries.indexed(
      TimeSeries.fillForward(g, cfg.stepSec)
        .select(col("name"), col("node"), col("tsb"), col("filled").as("gval")),
      cfg.stepSec, cfg.bucketSec)
  }

  /** Dense forward-filled grid from the events table. */
  def buildGrid(events: DataFrame, cfg: Config = Config()): DataFrame =
    buildGridFromSignals(
      TimeSeries.signalsFromEvents(events, cfg.nodeMod), cfg)

  /** The advisor answer: for each bucket where an objective signal is
    * anomalous, the top-k correlated candidate signals (reference
    * :177-230). One DataFrame, driver-collect-free until render.
    */
  def advise(events: DataFrame, cfg: Config = Config()): DataFrame =
    adviseSignals(TimeSeries.signalsFromEvents(events, cfg.nodeMod), cfg)

  /** advise over long signals — what the CSV/tar bundle sources emit. */
  def adviseSignals(signals: DataFrame, cfg: Config = Config()): DataFrame = {
    // the grid feeds three independent analyses (outliers, change
    // points, correlation) — persist it so the ffill window pipeline
    // runs once
    val grid = buildGridFromSignals(signals, cfg).persist()
    val anomalies = ChangePoints.anomalyUnion(
      grid.select("name", "node", "tsb", "gval"), bucket = cfg.bucketSec)
    val anomalousObjBuckets = anomalies
      .filter(col("name").isin(cfg.objNames: _*))
      .select(col("name").as("obj_name"), col("node").as("obj_node"), col("b"))
      .distinct()
    val ranked = Correlate.topCorr(Correlate.nccLag(grid, cfg.objNames), cfg.topK)
    ranked.join(anomalousObjBuckets, Seq("obj_name", "obj_node", "b"))
      .orderBy("obj_name", "obj_node", "b", "rank")
  }

  /** Small markdown report (the report.tpl analogue). Collects the
    * ranked table — output is top-k rows per anomalous bucket, tiny by
    * construction.
    */
  def renderMarkdown(advice: DataFrame, limit: Int = 500): String = {
    val rows = advice.limit(limit).collect()
    val sb = new StringBuilder
    sb.append("# Metrics advisor report\n\n")
    sb.append("| bucket | objective | candidate | lag | r | rank |\n")
    sb.append("| --- | --- | --- | --- | --- | --- |\n")
    rows.foreach { r =>
      sb.append(s"| ${r.getAs[Long]("b")} | ${r.getAs[String]("obj_name")}/${r.getAs[String]("obj_node")} " +
        s"| ${r.getAs[String]("cand_name")}/${r.getAs[String]("cand_node")} " +
        s"| ${r.getAs[Long]("lag")} | ${r.getAs[Double]("r")} | ${r.getAs[Int]("rank")} |\n")
    }
    sb.toString
  }
}
