package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** Streaming leg of the curation layer: gate an unbounded DOCUMENT feed
  * (ingestion-time curation) with the same deterministic semantics as
  * the batch operators — every filter here is a stateless projection,
  * so the stream never accumulates state and batch/stream outputs are
  * identical row sets (StreamingSpec pins the parity).
  *
  * Contamination at stream time is a PRE-FILTER, not an adjudication:
  * the eval set's shingle digests live in a bloom sketch (fixed-size
  * binary broadcast with the plan), a document is flagged when ANY of
  * its shingles might be in the sketch — no false negatives by the
  * bloom contract, rare false positives. Flagged docs go to the exact
  * batch check (Curation.decontaminate) instead of being dropped
  * blind; clean docs stream through with zero joins and zero state.
  * This is the standard sketch-at-ingest / exact-at-rest split for a
  * 100 TB/day feed.
  */
object CurationStream {

  /** Build the eval-set shingle sketch (driver-side, once per eval-set
    * version): `w`-word shingle digests folded into Spark's mergeable
    * bloom filter. The binary is KB-to-MB scale regardless of eval
    * size and ships to executors as a literal.
    */
  def evalSketch(eval: DataFrame, w: Int = 4,
                 expectedItems: Long = 1000000L,
                 numBits: Long = 8000000L): Array[Byte] = {
    val sh = eval
      .select(split(lower(col("text")), "\\s+").as("wd"))
      .filter(size(col("wd")) >= w)
      .select(explode(expr(s"transform(sequence(1, size(wd) - ${w - 1}), " +
        s"i -> xxhash64(array_join(slice(wd, i, $w), ' ')))")).as("h64"))
    sh.agg(VectorExpressions.bloomAgg(col("h64"), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Streaming per-stratum admission cap: pass through at most `n`
    * documents per stratum over the stream's lifetime — the
    * ingest-time counterpart of `Sampling.cappedPerStratum`. The batch
    * cap is hash-RANKED (it sees the whole corpus); at ingest the only
    * implementable cap is arrival-order (first n win), which is what
    * every rate-limited ingest does — the batch re-rank runs at rest
    * if uniformity matters. State per stratum is ONE counter, so total
    * state is bounded by |strata| forever (no watermark needed; a
    * processing-time timeout would REOPEN the cap on eviction).
    * Works on batch frames too (state starts empty; arrival order =
    * partition order there, so batch callers use the ranked cap).
    */
  def cappedStream(docs: org.apache.spark.sql.DataFrame, strataCol: String,
                   n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(strataCol).cast("string"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (stratum: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          var seen = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[(Long, String)]
          rows.foreach { case (id, _) =>
            if (seen < n) { out += ((id, stratum)); seen += 1 }
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF("doc_id", strataCol)
  }

  /** Gate a document stream (or batch frame — same code path): emits
    * every input row with per-reason flags and the combined verdict.
    *   - `ok_len`: token count within [minTokens, maxTokens]
    *   - `maybe_contaminated`: any shingle possibly in the eval sketch
    *   - `keep`: length ok AND not flagged
    * One stateless projection over the feed; the shingle array and its
    * probes live and die inside the task.
    */
  def gate(docs: DataFrame, sketch: Array[Byte], w: Int = 4,
           minTokens: Int = 5, maxTokens: Int = 100000): DataFrame = {
    val wd = split(lower(col("text")), "\\s+")
    val probes = expr(
      s"transform(sequence(1, greatest(size(_wd) - ${w - 1}, 1)), " +
        s"i -> xxhash64(array_join(slice(_wd, i, $w), ' ')))")
    docs
      .withColumn("_wd", wd)
      .withColumn("n_tokens", size(col("_wd")).cast("long"))
      .withColumn("ok_len",
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens).cast("int"))
      .withColumn("maybe_contaminated",
        // a null sketch means the eval set had no doc of ≥ w words
        // (evalSketch's aggregate saw zero shingles) — nothing can be
        // contaminated, and lit(null) must not reach the probe
        if (sketch == null) lit(0)
        else when(col("n_tokens") < w, lit(0)).otherwise(
          exists(probes,
            h => VectorExpressions.bloomMightContain(lit(sketch), h)).cast("int")))
      .withColumn("keep",
        (col("ok_len") === 1 && col("maybe_contaminated") === 0).cast("int"))
      .drop("_wd")
  }

  /** Build the corpus dedup sketches for ingest-time incremental dedup
    * (driver-side, once per corpus/index version): a bloom over the
    * corpus text digests (exact-dup probe) and a bloom over the corpus
    * MinHash band keys (near-dup probe). Both are fixed-size binaries
    * that ship with the streaming plan as literals — the sketch-side
    * of the sketch-at-ingest / exact-at-rest split that
    * `Dedup.incremental` answers at rest. Band keys use the SAME
    * per-row signature expression the stream probe runs
    * (Dedup.rowSig), so a batch near-dup candidate's shared band is in
    * the sketch by construction — no false negatives.
    */
  def corpusDedupSketch(corpus: DataFrame, numHashes: Int = 64,
                        bands: Int = 16,
                        expectedItems: Long = 1000000L,
                        numBits: Long = 8000000L): (Array[Byte], Array[Byte]) = {
    val dig = corpus
      .agg(VectorExpressions.bloomAgg(xxhash64(col("text")),
        expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    // the band bloom receives `bands` inserts PER corpus doc — sized
    // ×bands or it saturates at exactly the corpus scale the defaults
    // advertise and flags every streamed doc as a near-dup
    val band = graft.operators.Dedup.bandHashes(corpus, numHashes, bands)
      .agg(VectorExpressions.bloomAgg(col("bh64"),
        expectedItems * bands, numBits * bands).as("bf"))
      .head().getAs[Array[Byte]](0)
    (dig, band)
  }

  /** Ingest-time incremental dedup — the streaming face of
    * `Dedup.incremental`: flag each document of an unbounded feed
    * against the EXISTING corpus with zero joins and zero state.
    *   - `maybe_exact`: text digest possibly among the corpus digests
    *   - `maybe_near`: any MinHash band key possibly among the corpus
    *     band keys
    *   - `verdict_stream`: `flagged_exact` / `flagged_near` / `clean`
    * The bloom contract makes `clean` DEFINITIVE (no false negatives:
    * every doc Dedup.incremental would verdict exact/near is flagged —
    * StreamingSpec pins it); flagged docs route to the exact batch
    * check instead of being dropped blind. One stateless projection:
    * the shingle array, 64-permutation signature, and 16 band probes
    * live and die inside the task — the only state on a 100 TB/day
    * feed is the two fixed-size sketches.
    */
  def incrementalGate(docs: DataFrame, digestSketch: Array[Byte],
                      bandSketch: Array[Byte], numHashes: Int = 64,
                      bands: Int = 16): DataFrame = {
    import graft.operators.Dedup
    Dedup.requireNonAnsi(docs)
    val wd = split(lower(col("text")), "\\s+")
    docs
      .withColumn("_wd", wd)
      .withColumn("_sh",
        // ONE shingle definition shared with the batch pipeline — the
        // no-false-negative contract is only as good as this equality
        when(size(col("_wd")) >= 2, Dedup.bigramShingles(col("_wd")))
          .otherwise(array().cast("array<string>")))
      .withColumn("_hs", Dedup.shingleHash64(col("_sh")))
      .withColumn("_sig", Dedup.rowSig(col("_hs"), numHashes))
      .withColumn("maybe_exact",
        // a null sketch = the corpus side had no rows (first-ever
        // ingest bootstrap) — nothing can match, and lit(null) must
        // not reach the probe (the gate() lesson)
        if (digestSketch == null) lit(0)
        else VectorExpressions.bloomMightContain(lit(digestSketch),
          xxhash64(col("text"))).cast("int"))
      .withColumn("maybe_near",
        if (bandSketch == null) lit(0)
        else when(size(col("_sh")) < 1, lit(0)).otherwise(
          exists(Dedup.bandHash64(col("_sig"), bands, numHashes / bands),
            h => VectorExpressions.bloomMightContain(lit(bandSketch), h))
            .cast("int")))
      .withColumn("verdict_stream",
        when(col("maybe_exact") === 1, "flagged_exact")
          .when(col("maybe_near") === 1, "flagged_near")
          .otherwise("clean"))
      .drop("_wd", "_sh", "_hs", "_sig")
  }
}
