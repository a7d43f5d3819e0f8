package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed corpus tables: the storage-layout half of shuffle
  * elimination. A corpus that several pipeline stages repeatedly join
  * or aggregate BY THE SAME KEY (doc_id joins of scores, dedup labels,
  * split assignments, chunk maps, …) should be written bucketed on
  * that key once; every later equi-join or aggregation on it is then
  * exchange-free — the bucket layout IS the partitioning Catalyst
  * would otherwise shuffle into, persisted on disk.
  *
  * At 100 TB this converts the dominant recurring cost (a full-corpus
  * hash exchange per derived-table join, ~corpus bytes over the wire
  * each time) into a one-time layout decision; joins between any two
  * tables bucketed the same way co-locate task-for-task. On a real
  * cluster the same write is `saveAsTable` against the metastore;
  * local tests register the table in the session catalog, which is the
  * same code path (bucket metadata lives in the catalog either way).
  *
  * Reference behavior being re-expressed: the reference engine keeps
  * per-metric files on local disk and joins in memory
  * (metrics_advisor.py reads per-bucket CSVs); bucketing is the
  * cluster-scale analogue of that data-local layout.
  */
object BucketedCorpus {

  /** Write `df` as a bucketed, sorted managed table on `keyCol`.
    * Bucket count is a layout constant the caller picks once per
    * corpus (rule of thumb: target ≤ ~1 GB per bucket file at full
    * scale); sorting within buckets additionally enables exchange-free
    * sort-merge joins without a per-task sort.
    */
  def write(df: DataFrame, table: String, keyCol: String,
            buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True iff `plan` of joining the two tables on `keyCol` contains no
    * shuffle exchange — the property the layout exists to buy. Used by
    * the spec as the machine-checked evidence; callers can use it as a
    * deployment assertion too.
    */
  def joinIsExchangeFree(spark: SparkSession, left: String, right: String,
                         keyCol: String): Boolean = {
    val plan = spark.table(left).join(spark.table(right), keyCol)
      .queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning")
  }
}
