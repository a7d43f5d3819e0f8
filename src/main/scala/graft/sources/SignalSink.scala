package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Writers for the engine's long signal format and for analysis
  * outputs — the persistence half of the source modules.
  *
  * Scale design, in order of importance at 100 TB:
  *  - **Partition by day**: every downstream query in this engine keys
  *    on a time range; a `day=` directory per UTC day makes the parquet
  *    reader prune whole partitions before any row is read.
  *  - **Sort within partitions by (name, node, tsb)**: parquet stores
  *    per-column min/max per row group, so a sorted layout turns signal
  *    predicates into row-group skips — the difference between reading
  *    a day and reading a signal.
  *  - **Bound file sizes** (`maxRecordsPerFile`): one skewed day must
  *    not become one unsplittable multi-GB file.
  *  - Writes coalesce per partition via the shuffle the sort already
  *    requires — no extra exchange.
  */
object SignalSink {

  /** Write a long signal frame (name, node, tsb, value-ish columns) as
    * day-partitioned parquet.
    */
  def writeSignals(signals: DataFrame, path: String,
                   maxRecordsPerFile: Long = 5000000L,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    signals
      .withColumn("day", date_format(timestamp_seconds(col("tsb")), "yyyy-MM-dd"))
      .repartition(col("day"))
      .sortWithinPartitions("day", "name", "node", "tsb")
      .write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("day")
      .parquet(path)
  }

  /** Read back a signal store; `days` (yyyy-MM-dd) prunes partitions at
    * the source — the filter never touches data files outside the set.
    */
  def readSignals(spark: SparkSession, path: String,
                  days: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    if (days.isEmpty) df else df.filter(col("day").isin(days: _*))
  }

  /** Generic analysis-output writer: small result tables (anomalies,
    * correlation rankings, report rows) land as a single sorted file per
    * run — results are KB-to-MB-scale by construction, so one file reads
    * back fastest and diffs cleanly across runs.
    */
  def writeResult(result: DataFrame, path: String, sortCols: Seq[String],
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sorted =
      if (sortCols.isEmpty) result.coalesce(1)
      else result.coalesce(1).sortWithinPartitions(sortCols.map(col): _*)
    sorted.write.mode(mode).parquet(path)
  }

  /** Streaming leg: events stream → day-partitioned parquet with a
    * checkpoint (exactly-once through the sink's write-ahead commit
    * log). `Trigger.AvailableNow` drains what exists and stops — the
    * batch-backfill pattern; pass a processing-time trigger for a
    * continuous pipeline.
    */
  def streamSignals(signals: DataFrame, path: String, checkpoint: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    signals
      .withColumn("day", date_format(timestamp_seconds(col("tsb")), "yyyy-MM-dd"))
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .partitionBy("day")
      .format("parquet")
      .start(path)
  }
}
