package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for deterministic, oracle-matchable numerics.
  *
  * Rule: every double that crosses the correctness gate is either (a)
  * derived from exact DECIMAL arithmetic (order-independent, so Spark and
  * DuckDB agree bit-for-bit), or (b) rounded to 4 dp so that the ~1e-13
  * noise from engine-specific double summation order is absorbed.
  * Thresholds and rank orderings always apply to the *rounded* value with
  * a unique-id tiebreak, so row membership and ordering are deterministic
  * across engines.
  */
object Num {
  /** Exact decimal cast for 2-dp source values (prices, event values).
    * DECIMAL(12,2) keeps 3-way products within DuckDB/Spark's 38-digit cap.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent exact sum of 2-dp doubles, surfaced as double. */
  def sumDec(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact average: decimal sum, then one double division. */
  def avgDec(c: Column): Column = sumDec(c) / count(lit(1))

  /** Deterministic 4-dp rounding. The epsilon breaks exact decimal ties
    * (x.xxxx5, common after dividing exact sums by 2^k counts) the same
    * way in Spark (which rounds the shortest decimal string) and DuckDB
    * (which rounds the binary double); it is far above double noise
    * (~1e-13) and far below the rounding quantum, so nothing else moves.
    */
  def r4(c: Column): Column = round(c + lit(1e-9), 4)

  def r6(c: Column): Column = round(c + lit(1e-11), 6)
}

object GraftSession {
  /** Session tuned for the local[32] harness; on a real cluster only
    * master/shuffle-partitions change (driver passes them in).
    */
  def build(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prepare(spark)
    spark
  }
}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  /** The events table carries INT64 TIMESTAMP(NANOS) which Spark 4 rejects
    * unless read as raw longs; all downstream code treats `ts` as epoch
    * nanoseconds (bigint).
    */
  def prepare(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ANSI `corr` raises DIVIDE_BY_ZERO on zero-variance input; the
    // engine contract here is NaN/NULL (filtered), matching DuckDB.
    spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    prepare(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
