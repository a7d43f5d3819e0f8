package graft

import graft.streaming.{CurationStream, EventStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("hourlyAgg over a stream matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 3600L * 1000000000L, 1L, "click", 2.0, "{}"),
      (2L, 3700L * 1000000000L, 2L, "click", 3.0, "{}"),
      (3L, 7300L * 1000000000L, 1L, "view", 5.0, "{}"))
    val schema = Seq.empty[(Long, Long, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val streamDF = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.hourlyAgg(streamDF).writeStream
      .format("memory").queryName("hourly").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT event_type, n, sum_value FROM hourly ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    q.stop()

    val batch = EventStream.hourlyAgg(rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(streamed == batch)
    assert(streamed == Seq(("click", 2L, 5.0), ("view", 1L, 5.0)))
  }

  test("cappedStream admits the first n per stratum across batches, then closes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamDF = mem.toDF().toDF("doc_id", "source")
    val q = CurationStream.cappedStream(streamDF, "source", 2)
      .writeStream.format("memory").queryName("capped").outputMode("append").start()
    mem.addData((1L, "a"), (2L, "a"), (3L, "b"))
    q.processAllAvailable()
    // second batch: stratum a is already full — the counter state
    // must survive the batch boundary; b admits exactly one more
    mem.addData((4L, "a"), (5L, "b"), (6L, "b"))
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id, source FROM capped ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    q.stop()
    assert(kept == Seq((1L, "a"), (2L, "a"), (3L, "b"), (5L, "b")), kept.toString)
  }

  test("hash sampling is stateless and stream/batch identical") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 200).map(i => (i.toLong, s"doc body $i", s"src${i % 3}"))
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25)
    val mem = MemoryStream[(Long, String, String)]
    val streamDF = mem.toDF().toDF("doc_id", "text", "source")
    val q = graft.operators.Sampling
      .stratifiedSample(streamDF, "source", col("doc_id").cast("string"), rates)
      .writeStream.format("memory").queryName("sampled").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT doc_id FROM sampled")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    val batch = graft.operators.Sampling
      .stratifiedSample(rows.toDF("doc_id", "text", "source"), "source",
        col("doc_id").cast("string"), rates)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("sketch heavy hitters never underestimates and nails the top term") {
    val docs = (1 to 50).map(i =>
      (i.toLong, "alpha " * 10 + s"beta gamma delta word$i")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.heavyHitters(docs, 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.head._1 == "alpha" && out.head._2 == 500L)
    // CMS structurally never undercounts
    assert(out.forall { case (_, exact, est) => est >= exact })
    // at eps=1e-3 over this tiny vocabulary the estimates are exact
    assert(out.forall { case (_, exact, est) => est == exact })
  }

  test("slidingAgg over a stream matches batch, each event in 4 windows") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 3600L * 1000000000L, 1L, "click", 2.0, "{}"),
      (2L, 4000L * 1000000000L, 2L, "click", 3.0, "{}"))
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val streamDF = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.slidingAgg(streamDF).writeStream
      .format("memory").queryName("sliding").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT ws, event_type, n, sum_value FROM sliding ORDER BY ws")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(2), r.getDouble(3))).toSeq
    q.stop()
    val batch = EventStream.slidingAgg(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .orderBy("ws")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(2), r.getDouble(3))).toSeq
    assert(streamed == batch)
    // both events fall inside the same 4 sliding windows
    // (starts 900..3600: start ≤ t < start+3600, aligned to 900)
    assert(batch == Seq((900L, 2L, 5.0), (1800L, 2L, 5.0),
      (2700L, 2L, 5.0), (3600L, 2L, 5.0)), s"got $batch")
  }

  test("burnStream matches batch and flags only over-budget windows") {
    implicit val sqlCtx = spark.sqlContext
    // node u1 hour 1: 3/4 errors → burn 3.0, pre_page; hour 2: 0/2 quiet
    val rows = Seq(
      (1L, 3700L, 1L, "error"), (2L, 3800L, 1L, "error"),
      (3L, 3900L, 1L, "error"), (4L, 4000L, 1L, "click"),
      (5L, 7300L, 1L, "click"), (6L, 7400L, 1L, "view"))
      .map { case (id, t, u, ty) => (id, t * 1000000000L, u, ty, 1.0, "{}") }
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val streamDF = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.burnStream(streamDF).writeStream
      .format("memory").queryName("burn").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT hour_start, node, e, n, burn_1h, pre_page FROM burn ORDER BY hour_start")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSeq
    q.stop()
    val batch = EventStream.burnStream(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .orderBy("hour_start")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSeq
    assert(streamed == batch)
    assert(batch == Seq((3600L, "u1", 3L, 4L, 3.0, true),
      (7200L, "u1", 0L, 2L, 0.0, false)), s"got $batch")
  }

  test("stream-stream followedBy join matches batch and bounds by the window") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 1000L * 1000000000L, 7L, "click", 1.0, "{}"),
      (2L, 1300L * 1000000000L, 7L, "error", 1.0, "{}"),  // 300 s after → match
      (3L, 1700L * 1000000000L, 7L, "error", 1.0, "{}"),  // 700 s after → outside
      (4L, 1200L * 1000000000L, 8L, "error", 1.0, "{}"))  // other user → no match
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val streamDF = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.followedBy(streamDF).writeStream
      .format("memory").queryName("followed").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT user_id, l_id, r_id FROM followed ORDER BY l_id, r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    q.stop()
    val batch = EventStream.followedBy(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .orderBy("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch)
    assert(batch == Seq((7L, 1L, 2L)), s"got $batch")
  }

  test("streaming dedup drops replayed event ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val streamDF = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.dedupStream(streamDF).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    mem.addData((1L, 3600L * 1000000000L, 1L, "click", 2.0, "{}"))
    q.processAllAvailable()
    // replay the same id in a later batch, plus one new event
    mem.addData((1L, 3600L * 1000000000L, 1L, "click", 2.0, "{}"),
      (2L, 3700L * 1000000000L, 2L, "view", 3.0, "{}"))
    q.processAllAvailable()
    val ids = spark.sql("SELECT event_id FROM dedup ORDER BY event_id")
      .collect().map(_.getLong(0)).toSeq
    q.stop()
    assert(ids == Seq(1L, 2L))
  }

  test("anomalyStream flags a spike against running per-signal stats") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Double)]
    val streamDF = mem.toDF().toDF("name", "node", "tsec", "value")
    val q = EventStream.anomalyStream(streamDF, level = 3.0, minSamples = 8)
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    // warmup: gentle oscillation around 10 on one signal; a second quiet
    // signal proves state is keyed
    val base = (0 until 20).map(i => ("cpu", "n0", i * 60L, 10.0 + (i % 3) * 0.1)) ++
      (0 until 20).map(i => ("mem", "n0", i * 60L, 5.0))
    mem.addData(base: _*)
    q.processAllAvailable()
    mem.addData(("cpu", "n0", 1300L, 99.0), ("mem", "n0", 1300L, 5.0))
    q.processAllAvailable()
    val flagged = spark.sql("SELECT name, tsec, value FROM anom")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    q.stop()
    assert(flagged == Seq(("cpu", 1300L, 99.0)))
  }

  test("anomalyStream state stays keyed at fleet width 2000") {
    // the width audit for the STREAMING side (r7 verdict #7): 2 000
    // distinct signals warm their running stats in one pass, then a
    // spike lands on exactly 10 of them — only those page, proving the
    // mapGroupsWithState state is keyed per signal (2 000 small state
    // rows, not one merged accumulator) and survives real fleet width
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Double)]
    val streamDF = mem.toDF().toDF("name", "node", "tsec", "value")
    val q = EventStream.anomalyStream(streamDF, level = 3.0, minSamples = 8)
      .writeStream.format("memory").queryName("anomw").outputMode("append").start()
    val width = 2000
    val warm = for (k <- 0 until width; i <- 0 until 12)
      yield (s"sig$k", s"n${k % 4}", i * 60L, 10.0 + (i % 3) * 0.1)
    mem.addData(warm: _*)
    q.processAllAvailable()
    val spiked = (0 until width by 200).map(k => s"sig$k").toSet // 10 signals
    val probe = (0 until width).map { k =>
      (s"sig$k", s"n${k % 4}", 800L, if (spiked(s"sig$k")) 99.0 else 10.1)
    }
    mem.addData(probe: _*)
    q.processAllAvailable()
    val flagged = spark.sql("SELECT name FROM anomw WHERE tsec = 800")
      .collect().map(_.getString(0)).toSet
    q.stop()
    assert(flagged == spiked, s"paged ${flagged.size} of ${spiked.size} expected")
  }

  test("hllStream registers match batch bit-for-bit and fold to the exact count") {
    implicit val sqlCtx = spark.sqlContext
    // two days, overlapping users; day 2 has exactly 3 distinct users
    val rows = (1 to 40).map(i =>
      (i.toLong, (i % 17).toLong * 3600L * 1000000000L, (i % 7).toLong, "click", 1.0, "{}")) ++
      Seq((100L, 90000L * 1000000000L, 1L, "view", 1.0, "{}"),
        (101L, 91000L * 1000000000L, 2L, "view", 1.0, "{}"),
        (102L, 92000L * 1000000000L, 1L, "view", 1.0, "{}"),
        (103L, 93000L * 1000000000L, 9L, "view", 1.0, "{}"))
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val streamDF = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.hllStream(streamDF).writeStream
      .format("memory").queryName("hllregs").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT day_start, bucket, r FROM hllregs")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getInt(2))).toSet
    q.stop()
    val batchDf = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = EventStream.hllStream(batchDf)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch, "stream and batch registers must be bit-identical")
    // folding the streamed registers gives the exact small-range count
    // (linear counting is exact when every user occupies its own bucket)
    val est = graft.operators.Sketches.hllFold(
        EventStream.hllStream(batchDf).withColumnRenamed("day_start", "d"), "d")
      .orderBy("d").collect().map(_.getLong(1)).toSeq
    assert(est == Seq(7L, 3L), est.toString)
  }

  test("forecastBreachStream pages on the trend break, not the trend") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Double)]
    val streamDF = mem.toDF().toDF("name", "node", "tsec", "value")
    val q = EventStream.forecastBreachStream(streamDF, mult = 3.0)
      .writeStream.format("memory").queryName("fb").outputMode("append").start()
    // a steady ramp with small wobble: the Holt state tracks it, so the
    // RAMP itself must not page (a fixed-threshold detector would)
    val ramp = (0 until 30).map(i =>
      ("lat", "n0", i * 60L, 100.0 + i * 10.0 + (i % 2) * 1.0))
    mem.addData(ramp: _*)
    q.processAllAvailable()
    val during = spark.sql("SELECT count(*) FROM fb").head().getLong(0)
    // then a level break far outside the forecast band
    mem.addData(("lat", "n0", 1800L, 1000.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT name, tsec, value, fc, lo, hi FROM fb")
      .collect()
    q.stop()
    assert(during == 0, s"the tracked ramp must not page, got $during")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "lat" && r.getLong(1) == 1800L)
    // the forecast continued the ramp (~400) and the break left the band
    assert(math.abs(r.getDouble(3) - 400.0) < 20.0)
    assert(r.getDouble(2) > r.getDouble(5), "value above hi")
  }

  test("stream-static enrichment broadcasts the dimension into each batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val streamDF = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.enriched(streamDF, dim)
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    mem.addData((10L, 1L, 1L, "click", 1.0, "{}"), (11L, 2L, 2L, "view", 2.0, "{}"),
      (12L, 3L, 7L, "view", 3.0, "{}"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_id, tier FROM enrich ORDER BY event_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    q.stop()
    assert(rows == Seq((10L, Some("gold")), (11L, Some("basic")), (12L, None)))
  }

  test("streaming curation gate flags leaks and short docs, passes clean ones; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.CurationStream
    val leak = "alpha beta gamma delta"
    val eval = Seq((97L, s"benchmark doc holding $leak secretly")).toDF("doc_id", "text")
    val sketch = CurationStream.evalSketch(eval, w = 4)
    val docRows = Seq(
      (1L, s"train doc that copied $leak verbatim from the benchmark"),
      (2L, "perfectly clean training document with enough words here"),
      (3L, "too short"))
    val mem = MemoryStream[(Long, String)]
    val streamDF = mem.toDF().toDF("doc_id", "text")
    val q = CurationStream.gate(streamDF, sketch, w = 4)
      .select("doc_id", "ok_len", "maybe_contaminated", "keep")
      .writeStream.format("memory").queryName("gated").outputMode("append").start()
    mem.addData(docRows: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM gated ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    q.stop()
    assert(streamed == Seq((1L, 1, 1, 0), (2L, 1, 0, 1), (3L, 0, 0, 0)), s"$streamed")
    // batch parity: the gate is a stateless projection, same rows out
    val batch = CurationStream.gate(docRows.toDF("doc_id", "text"), sketch, w = 4)
      .select("doc_id", "ok_len", "maybe_contaminated", "keep")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(batch == streamed)
  }

  test("watermark drops state for closed windows (plan sanity)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val streamDF = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val agg = EventStream.hourlyAgg(streamDF)
    assert(agg.isStreaming)
    val q = agg.writeStream.format("memory").queryName("wmtest")
      .outputMode("append").start()
    mem.addData((1L, 3600L * 1000000000L, 1L, "click", 2.0, "{}"))
    q.processAllAvailable()
    q.stop()
    succeed
  }

  test("sceneCutStream matches batch sceneCuts across a mid-video batch split") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FrameStream
    // the SAME stub-digest scores the batch operator segments on,
    // replayed as an arriving frame feed (tsec = arrival order)
    val docs = Seq(
      (1L, "x" * 450),
      (2L, "short"),
      (3L, "the quick brown fox " * 30)).toDF("doc_id", "text")
    val m = 1048576L
    val frames = graft.operators.Multimodal.frameSample(docs, stride = 2)
      .withColumn("score", ((col("frame_digest") % m) + m) % m)
      // tsec offset off epoch 0: Spark drops rows with ts <= watermark
      // and the initial watermark IS 0, so a ts=0 frame never arrives
      .select(col("doc_id"), col("frame_idx"), col("score"),
        (col("frame_idx") + lit(100L)).as("tsec"))
      .orderBy("doc_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val streamDF = mem.toDF().toDF("doc_id", "frame_idx", "score", "tsec")
    val q = FrameStream.sceneCutStream(streamDF, threshold = 524288L,
        idleTimeoutSec = 60L)
      .writeStream.format("memory").queryName("cuts").outputMode("append").start()
    // split mid-video: the lag state must survive the batch boundary,
    // so a shot straddling the split still cuts exactly once
    val (first, second) = frames.splitAt(frames.length / 2)
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable()
    // the detector holds frames until the watermark passes them
    // (out-of-order correctness) and flushes a quiet video's tail on
    // event-time timeout — push the watermark past every real video's
    // idle horizon with a sentinel clip (two batches: the second makes
    // the timeouts fire without relying on a no-data micro-batch)
    val maxTs = frames.map(_._4).max
    mem.addData((99L, 0L, 0L, maxTs + 1000L))
    q.processAllAvailable()
    mem.addData((99L, 1L, 0L, maxTs + 1001L))
    q.processAllAvailable()
    val streamed = spark.sql("SELECT doc_id, frame_idx FROM cuts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    // batch-mode run of the SAME streaming transform
    val batchCuts = FrameStream.sceneCutStream(
        frames.toDF("doc_id", "frame_idx", "score", "tsec"))
      .collect().map(c => (c.doc_id, c.frame_idx)).toSet
    assert(streamed == batchCuts)
    // batch-equality against the at-rest authority: per-video cut
    // count and first-cut position reproduce Multimodal.sceneCuts
    val agg = streamed.groupBy(_._1).map { case (d, cs) =>
      (d, cs.size.toLong, cs.map(_._2).min) }.toSet
    val authority = graft.operators.Multimodal
      .sceneCuts(docs, stride = 2, threshold = 524288L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_cuts"),
        r.getAs[Long]("first_cut")))
      .filter(_._2 > 0L).map(t => (t._1, t._2, t._3)).toSet
    assert(agg == authority, s"stream=$agg batch=$authority")
  }

  test("sceneCutStream scores an out-of-order late frame against its true predecessor") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FrameStream
    // threshold 10; cuts in true frame order land at idx 1, 3, 4.
    // Frame 2 arrives a batch LATE (inside the 10 s lateness window):
    // the v1 detector scored it against frame 4's lag (|105-50| = 55 →
    // a spurious cut at idx 2 AND a corrupted lag); the buffered
    // detector must reorder it before frame 3.
    val all = Seq(
      (7L, 0L, 0L, 100L), (7L, 1L, 100L, 101L), (7L, 2L, 105L, 102L),
      (7L, 3L, 0L, 103L), (7L, 4L, 50L, 104L), (7L, 5L, 55L, 105L))
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val streamDF = mem.toDF().toDF("doc_id", "frame_idx", "score", "tsec")
    val q = FrameStream.sceneCutStream(streamDF, threshold = 10L,
        idleTimeoutSec = 60L)
      .writeStream.format("memory").queryName("oooCuts")
      .outputMode("append").start()
    mem.addData(all.filter(_._2 != 2L): _*)
    q.processAllAvailable()
    mem.addData(all.filter(_._2 == 2L): _*) // the late arrival
    q.processAllAvailable()
    mem.addData((99L, 0L, 0L, 1000L)) // watermark pusher
    q.processAllAvailable()
    mem.addData((99L, 1L, 0L, 1001L)) // fires the idle timeouts
    q.processAllAvailable()
    val streamed = spark.sql("SELECT doc_id, frame_idx FROM oooCuts WHERE doc_id = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    val batchCuts = FrameStream.sceneCutStream(
        all.toDF("doc_id", "frame_idx", "score", "tsec"), threshold = 10L)
      .collect().map(c => (c.doc_id, c.frame_idx)).toSet
    assert(batchCuts == Set((7L, 1L), (7L, 3L), (7L, 4L)))
    assert(streamed == batchCuts, s"stream=$streamed batch=$batchCuts")
  }

  test("audioEnergyStream pages quiet clips with the exact mm_audio_energy row") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FrameStream
    val docs = Seq(
      (1L, "x" * 450),
      (2L, "short"),
      (3L, "the quick brown fox " * 30)).toDF("doc_id", "text")
    // the REAL decoded frame feed (writer→parser seam), timestamped by
    // frame position and split mid-clip across two micro-batches
    val frames = graft.operators.Multimodal.audioFrameRows(docs)
      // tsec off epoch 0 — Spark drops ts <= watermark, initial wm = 0
      .select(col("doc_id"), col("frame_idx"), col("fenergy"),
        (col("frame_idx") + lit(100L)).as("tsec"))
      .orderBy("doc_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val streamDF = mem.toDF().toDF("doc_id", "frame_idx", "fenergy", "tsec")
    val q = FrameStream.audioEnergyStream(streamDF, idleTimeoutSec = 60L)
      .writeStream.format("memory").queryName("clipEnergy")
      .outputMode("append").start()
    val (first, second) = frames.splitAt(frames.length / 2)
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable()
    val maxTs = frames.map(_._4).max
    mem.addData((99L, 0L, 0L, maxTs + 1000L)) // watermark pusher
    q.processAllAvailable()
    mem.addData((99L, 1L, 0L, maxTs + 1001L)) // fires the idle timeouts
    q.processAllAvailable()
    val streamed = spark.sql(
        "SELECT doc_id, n_frames, total_energy, peak_frame, peak_energy " +
        "FROM clipEnergy WHERE doc_id < 99 ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    q.stop()
    // at-rest authority: the batch operator over the same docs
    val authority = graft.operators.Multimodal.audioFrameEnergy(docs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(streamed == authority, s"stream=$streamed batch=$authority")
    // batch parity of the streaming transform itself
    val batchRun = FrameStream.audioEnergyStream(
        frames.toDF("doc_id", "frame_idx", "fenergy", "tsec"))
      .collect().map(c => (c.doc_id, c.n_frames, c.total_energy,
        c.peak_frame, c.peak_energy)).sortBy(_._1).toSeq
    assert(batchRun == authority, s"batchRun=$batchRun authority=$authority")
  }

  test("levelShiftStream pages at the step, stays quiet on wobble and flat") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Double)]
    val streamDF = mem.toDF().toDF("name", "node", "tsec", "value")
    val q = EventStream.levelShiftStream(streamDF)
      .writeStream.format("memory").queryName("lvl").outputMode("append").start()
    // wobbling baseline around 1, then a clean step to 10; a second
    // exactly-flat signal proves zero-range state never divides by zero
    val warm = (0 until 10).map(i => ("lat", "n0", i * 60L, 1.0 + (i % 2) * 0.1)) ++
      (0 until 10).map(i => ("flat", "n0", i * 60L, 5.0))
    mem.addData(warm: _*)
    q.processAllAvailable()
    val during = spark.sql("SELECT count(*) FROM lvl").head().getLong(0)
    val post = (10 until 20).map(i => ("lat", "n0", i * 60L, 10.0 + (i % 2) * 0.1)) ++
      (10 until 20).map(i => ("flat", "n0", i * 60L, 5.0))
    mem.addData(post: _*)
    q.processAllAvailable()
    val rows = spark.sql("SELECT name, tsec, level_before, level_after FROM lvl")
      .collect()
    q.stop()
    assert(during == 0, s"wobble paged $during times")
    assert(rows.nonEmpty, "step not paged")
    assert(rows.forall(_.getString(0) == "lat"))
    // every page stamps inside the straddle region (the median flips
    // once the after-window holds a majority of new-level points, so
    // the stamp can lead the step by up to (w−1)/2 samples) and reads
    // the 1 → 10 transition
    assert(rows.forall { r =>
      val t = r.getLong(1) / 60
      t >= 8 && t <= 19 && r.getDouble(2) <= 1.1 + 1e-9 && r.getDouble(3) >= 9.9
    }, rows.mkString(";"))
  }

  test("a paused video drains finalized cuts at watermark pace, not idle timeout") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FrameStream
    // video 7 sends three frames then goes QUIET; only video 8 keeps
    // the watermark moving. idleTimeoutSec is an hour, so any emission
    // before then proves the r12 flush tick (timeout armed at the
    // oldest pending frame), not retirement — the r11 ADVICE latency
    // bug held these cuts for the full idle hour.
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val streamDF = mem.toDF().toDF("doc_id", "frame_idx", "score", "tsec")
    val q = FrameStream.sceneCutStream(streamDF, threshold = 10L,
        idleTimeoutSec = 3600L)
      .writeStream.format("memory").queryName("pausedCuts")
      .outputMode("append").start()
    mem.addData((7L, 0L, 0L, 100L), (7L, 1L, 100L, 101L), (7L, 2L, 0L, 102L))
    q.processAllAvailable()
    // watermark is still 92 s — nothing finalized yet
    assert(spark.sql("SELECT * FROM pausedCuts").count() == 0)
    // two video-8 batches: the first advances the watermark past video
    // 7's frames (200 − 10 = 190 s), the second runs with that
    // watermark so video 7's flush tick fires
    mem.addData((8L, 0L, 0L, 200L))
    q.processAllAvailable()
    mem.addData((8L, 1L, 0L, 201L))
    q.processAllAvailable()
    val early = spark.sql(
        "SELECT doc_id, frame_idx FROM pausedCuts WHERE doc_id = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(early == Set((7L, 1L), (7L, 2L)), s"early=$early")
    // the tick must KEEP the video's lag state: a resumed feed scores
    // against frame 2 (score 0) — no cut at idx 3 (score 0), cut at 4
    mem.addData((7L, 3L, 0L, 210L), (7L, 4L, 100L, 211L))
    q.processAllAvailable()
    mem.addData((8L, 2L, 0L, 300L))
    q.processAllAvailable()
    mem.addData((8L, 3L, 0L, 301L))
    q.processAllAvailable()
    val resumed = spark.sql(
        "SELECT doc_id, frame_idx FROM pausedCuts WHERE doc_id = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(resumed == Set((7L, 1L), (7L, 2L), (7L, 4L)), s"resumed=$resumed")
  }

  test("sceneCutStream equals the batch detector over random arrival orders") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FrameStream
    // r11 verdict #6: the buffered detector's contract (per video,
    // tsec non-decreasing in frame_idx) had one targeted late-frame
    // spec — randomize it. Each trial: random per-video feeds, arrival
    // shuffled by a jitter strictly inside the 10 s lateness window
    // (|j| ≤ 4 s ⇒ every row arrives above the watermark — no drops),
    // split across a random number of micro-batches; the emitted cut
    // set must equal the batch run of the same transform every draw.
    val rng = new scala.util.Random(20260817L)
    for (trial <- 0 until 4) {
      val all = (0 until 2 + rng.nextInt(3)).flatMap { v =>
        var t = 50L + rng.nextInt(20)
        (0 until 8 + rng.nextInt(12)).map { i =>
          t += rng.nextInt(3)
          (100L + v, i.toLong, rng.nextInt(100).toLong, t)
        }
      }
      // precompute the jitter keys: sortBy's key function runs per
      // COMPARISON, so a random key violates the ordering contract
      val arrival = all
        .map(r => (r, r._4 + rng.nextInt(9) - 4, rng.nextInt()))
        .sortBy(t => (t._2, t._3)).map(_._1)
      val nBatches = 2 + rng.nextInt(4)
      val per = math.max(1, (arrival.size + nBatches - 1) / nBatches)
      val mem = MemoryStream[(Long, Long, Long, Long)]
      val streamDF = mem.toDF().toDF("doc_id", "frame_idx", "score", "tsec")
      val q = FrameStream.sceneCutStream(streamDF, threshold = 30L,
          idleTimeoutSec = 60L)
        .writeStream.format("memory").queryName(s"randCuts$trial")
        .outputMode("append").start()
      arrival.grouped(per).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      val maxTs = all.map(_._4).max
      mem.addData((999L, 0L, 0L, maxTs + 1000L))
      q.processAllAvailable()
      mem.addData((999L, 1L, 0L, maxTs + 1001L))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, frame_idx, prev_idx, " +
          s"prev_score, score FROM randCuts$trial WHERE doc_id < 999")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      q.stop()
      val batchCuts = FrameStream.sceneCutStream(
          all.toDF("doc_id", "frame_idx", "score", "tsec"), threshold = 30L)
        .collect().map(c => (c.doc_id, c.frame_idx, c.prev_idx,
          c.prev_score, c.score)).toSet
      assert(streamed == batchCuts,
        s"trial=$trial stream=$streamed batch=$batchCuts")
    }
  }

  test("incrementalGate never misses a batch exact/near verdict and " +
    "passes clean docs; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "unrelated totally different content here now"))
    val batchRows = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (101L, "the quick brown fox jumps over the lazy cat"), // near dup of 2
      (102L, "completely novel words nobody else ever uses"),
      (103L, "x")) // single word: no shingles, no bands
    val all = (corpus ++ batchRows).toDF("doc_id", "text")
    val (dig, band) = CurationStream.corpusDedupSketch(
      corpus.toDF("doc_id", "text"))
    // the at-rest adjudication the stream prefilter must never contradict
    val atRest = Dedup.incremental(all, col("doc_id") >= 100, threshold = 0.5)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(atRest(100L) == "exact" && atRest(101L) == "near")
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.incrementalGate(
        mem.toDF().toDF("doc_id", "text"), dig, band)
      .select("doc_id", "maybe_exact", "maybe_near", "verdict_stream")
      .writeStream.format("memory").queryName("incgate")
      .outputMode("append").start()
    mem.addData(batchRows: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM incgate ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).toSeq
    q.stop()
    val verdicts = streamed.map(r => r._1 -> r._4).toMap
    // no false negatives: every at-rest exact/near doc is flagged
    assert(verdicts(100L) == "flagged_exact")
    assert(verdicts(101L) == "flagged_near")
    // definitive cleans: novel docs stream through unflagged
    assert(verdicts(102L) == "clean" && verdicts(103L) == "clean")
    // stateless parity: batch run of the same projection is identical
    val batchOut = CurationStream.incrementalGate(
        batchRows.toDF("doc_id", "text"), dig, band)
      .select("doc_id", "maybe_exact", "maybe_near", "verdict_stream")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).toSeq
    assert(batchOut == streamed)
    // first-ever ingest bootstrap: an EMPTY corpus yields null sketches
    // (bloom agg over zero rows); the gate must verdict everything
    // clean with int flags, not null-poisoned columns
    val (d0, b0) = CurationStream.corpusDedupSketch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(d0 == null && b0 == null)
    val boot = CurationStream.incrementalGate(
        batchRows.toDF("doc_id", "text"), d0, b0)
      .select("doc_id", "maybe_exact", "maybe_near", "verdict_stream")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(boot.forall(_ == ((0, 0, "clean"))))
  }
}
