package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left event, the latest right event at or
  * before it, per key" — the time-series join Spark has no native
  * operator for.
  *
  * Implementation is the union trick: tag sides, sort per key by
  * (time, side, id), and carry the right side forward with
  * `last(..., ignoreNulls)` — ONE shuffle by key, no range-join
  * explosion, no per-row binary search. At 100 TB both sides shuffle
  * once on the join key and the window scan is linear per key — the
  * same cost profile as a sort-merge join, but expressing point-in-time
  * semantics exactly.
  */
object AsOfJoin {

  /** For each row of `left`, attach the latest `right` row with
    * rightTime <= leftTime on the same key. Ties at the same time let
    * the right row win (side order), then id order.
    *
    * Inputs need columns: key, tsec, id, value (both sides).
    */
  def asOf(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("key"), col("tsec"), col("id"), col("value"),
      lit(1).as("side"))
    val r = right.select(col("key"), col("tsec"), col("id"), col("value"),
      lit(0).as("side"))
    val w = Window.partitionBy("key")
      .orderBy(col("tsec").asc, col("side").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightTs = when(col("side") === 0, col("tsec"))
    val rightVal = when(col("side") === 0, col("value"))
    l.unionByName(r)
      .withColumn("asof_ts", last(rightTs, ignoreNulls = true).over(w))
      .withColumn("asof_value", last(rightVal, ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .drop("side")
  }
}
