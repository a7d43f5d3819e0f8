package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The driver has generated `events.ts` both as INT64 nanos (reads as
  * a raw long under `nanosAsLong`) and as TIMESTAMP(MICROS) (reads as
  * a timestamp) across rounds; the engine contract is ts = epoch-nanos
  * BIGINT and `Tables.table` normalizes either encoding. This spec
  * pins the normalization with both encodings of the SAME instants, so
  * a driver-side flip can never silently shift every time bucket.
  */
class TsEncodingSpec extends SparkTestBase {
  import spark.implicits._

  test("Tables.table normalizes nanos-long and micros-timestamp to identical values") {
    val instantsNs = Seq(0L, 1L * 1000000000L, 86400L * 1000000000L,
      1700000000L * 1000000000L + 123456000L) // micros-resolution tail
    val dir = Files.createTempDirectory("ts_enc").toString

    // encoding A: raw BIGINT nanos (what TIMESTAMP(NANOS) reads as
    // under spark.sql.legacy.parquet.nanosAsLong)
    instantsNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/nanos.parquet")

    // encoding B: TimestampType → parquet TIMESTAMP(MICROS)
    instantsNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns / 1000L) }
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/micros.parquet")

    def readTs(name: String): Map[Long, Long] =
      Tables.table(spark, dir, name).select("event_id", "ts")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val a = readTs("nanos")
    val b = readTs("micros")
    assert(a == b, s"encodings disagree: $a vs $b")
    assert(a(3L) == 1700000000L * 1000000000L + 123456000L,
      "sub-second precision survives the round trip")
    // and the normalized column is what the epoch-seconds derivation
    // in signalsFromEvents expects
    assert(a(2L) / 1000000000L == 86400L)
  }

  test("single-file schema memo returns current data and re-infers on rewrite") {
    // Tables.table memoizes the inferred schema of single-FILE tables
    // (the driver testdata shape) keyed by path+length+mtime, so the
    // per-query footer-inference job disappears from the bench's timed
    // region. Pin the two things that must stay true: (a) the memoized
    // read returns the same rows as a from-scratch inferred read, and
    // (b) a REWRITTEN file (new length/mtime) is re-inferred, not
    // served a stale schema.
    val dir = Files.createTempDirectory("schema_memo").toString
    def writeSingleFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$dir/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$dir/$name.parquet")
      if (dst.exists()) assert(dst.delete())
      Files.move(part.toPath, dst.toPath)
    }
    writeSingleFile(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "memo")
    val first = Tables.table(spark, dir, "memo")
    assert(first.columns.toSeq == Seq("id", "v"))
    assert(first.count() == 2)
    // memo hit: same file, second read — identical rows
    assert(Tables.table(spark, dir, "memo").collect().map(_.toSeq).toSet
      == first.collect().map(_.toSeq).toSet)
    // rewrite with a DIFFERENT schema: the memo must not serve stale
    writeSingleFile(Seq((3L, 7.5, "x")).toDF("id", "score", "tag"), "memo")
    val second = Tables.table(spark, dir, "memo")
    assert(second.columns.toSeq == Seq("id", "score", "tag"),
      s"stale memoized schema served after rewrite: ${second.columns.toSeq}")
    assert(second.count() == 1)
  }
}
