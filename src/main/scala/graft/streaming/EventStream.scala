package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming path for the events feed. The same transform
  * works in batch and streaming (Spark's unified Dataset semantics);
  * the streaming variant adds a watermark so state for closed windows
  * is dropped — the property that keeps a 100 TB/day feed bounded.
  */
object EventStream {

  /** events (ts = epoch nanos bigint) → tumbling 1 h windowed aggregate
    * per event_type. Works on both `read` and `readStream` inputs.
    */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val withTs = events
      .withColumn("tstamp", timestamp_seconds(expr("ts div 1000000000")))
    val maybeWatermarked =
      if (events.isStreaming) withTs.withWatermark("tstamp", watermark) else withTs
    maybeWatermarked
      .groupBy(window(col("tstamp"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Sessionization-friendly per-user running state demo:
    * flatMapGroupsWithState is the custom-state scale path; here the
    * batch-equivalent per-user hourly activity for parity testing.
    */
  def userActivity(events: DataFrame): DataFrame = {
    val withTs = events
      .withColumn("tstamp", timestamp_seconds(expr("ts div 1000000000")))
    val wm = if (events.isStreaming) withTs.withWatermark("tstamp", "2 hours") else withTs
    wm.groupBy(window(col("tstamp"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("user_id"), col("n_events"))
  }
}
