package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in batch per partition.
  *
  * The decode step is STUBBED (no image/audio codecs in this container):
  * `fakeDecode` derives deterministic pseudo-metadata from the payload
  * bytes. Everything around it — the binary schema, the mapPartitions
  * batch shape (one decoder init per partition, streaming rows through
  * it), the metadata struct, partition-count independence — is the real
  * production plumbing a codec would drop into.
  */
object Multimodal {

  /** STUB decoder: a real implementation would hand `payload` to a codec;
    * this derives stable fake dimensions from the bytes so the pipeline
    * is testable end-to-end.
    */
  private def fakeDecode(payload: Array[Byte]): (String, Int, Int, Long) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val fmt = (math.floorMod(h, 3L): @unchecked) match {
      case 0L => "png"
      case 1L => "jpeg"
      case 2L => "webp"
    }
    (fmt, 64 + math.floorMod(h >> 8, 1856L).toInt,
      64 + math.floorMod(h >> 16, 1016L).toInt, h)
  }

  /** Attach a binary payload column (here: utf-8 of text, standing in for
    * image bytes) and run the batch decode → metadata extraction.
    *
    * Typed `Dataset.mapPartitions` (not an RDD round-trip): the same
    * one-decoder-init-per-partition contract, but the result stays in
    * the Dataset engine — Tungsten rows in, Tungsten rows out, so the
    * downstream mm_* aggregations keep whole-stage codegen.
    */
  def decodeMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder init per partition in a real pipeline
        rows.map { case (id, payload) =>
          val (fmt, wdt, hgt, sum) = fakeDecode(payload)
          (id, payload.length.toLong, fmt, wdt, hgt, sum)
        }
      }
      .toDF("doc_id", "byte_len", "format", "width", "height", "checksum")
  }

  /** Frame sampling over "video" payloads (decode stubbed, like
    * decodeMeta): each payload expands to its frame-index sequence and
    * every `stride`-th frame is emitted with a per-frame digest — the
    * input row fans out to frames inside the same task, no shuffle, so
    * a 100 TB video corpus samples at scan speed. A real codec would
    * replace the digest with the decoded frame tensor; frame count
    * here derives deterministically from the payload size.
    */
  def frameSample(docs: DataFrame, stride: Int = 10): DataFrame =
    decodeMeta(docs)
      .select(col("doc_id"), col("checksum"),
        explode(expr("sequence(0, CAST(byte_len / 100 AS INT))")).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      // LCG-style mix as the per-frame digest: wrapping 64-bit
      // arithmetic both engines express exactly (HUGEINT mod-2⁶⁴ on
      // the oracle side), so the sampling plumbing is hash-verified;
      // a real codec replaces the digest with the decoded frame tensor
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        (col("checksum") * lit(2862933555777941757L) + col("frame_idx"))
          .as("frame_digest"))

  /** Resize planning over decoded metadata: aspect-preserving fit into
    * `maxDim`×`maxDim` (integer floor arithmetic — deterministic). A
    * codec-backed implementation would consume these target dims; the
    * planning math and column plumbing are the real pipeline stage.
    * Images already inside the box pass through untouched.
    */
  def resizePlan(meta: DataFrame, maxDim: Int = 256): DataFrame = {
    val scaleNum = lit(maxDim)
    val longest = greatest(col("width"), col("height"))
    val needs = longest > maxDim
    meta.select(col("doc_id"), col("format"), col("width"), col("height"),
      when(needs, (col("width") * scaleNum / longest).cast("int"))
        .otherwise(col("width")).as("out_width"),
      when(needs, (col("height") * scaleNum / longest).cast("int"))
        .otherwise(col("height")).as("out_height"),
      needs.cast("int").as("resized"))
  }

  /** STUB perceptual hash: a real implementation would decode the image,
    * downscale to an 8×8 luma grid, and threshold each cell at the mean
    * (aHash). Here the 64 "luma" cells are length-normalized frequencies
    * of 64 hashed 4-byte-shingle classes of the payload — CONTENT-LOCAL
    * the way downscaling is: a localized edit perturbs only the touched
    * shingles' classes, so near-identical payloads land within small
    * hamming distance (the property the pair join exists to exploit),
    * while unrelated payloads sit ~half the profile apart. Everything
    * downstream of the 64-cell grid — mean threshold, 64-bit pack,
    * pigeonhole block join — is exactly what a codec-backed aHash runs.
    */
  private def fakePhash(payload: Array[Byte]): Long = {
    val n = payload.length
    // payloads too short to form a 4-byte shingle (or with a uniform
    // profile) would all map to hash 0 and pair with each other at
    // hamming 0 — fall back to a byte-level hash so degenerate docs
    // don't form spurious near-dup clusters
    if (n < 4) {
      var h = 1125899906842597L
      var k = 0
      while (k < n) { h = h * 131 + (payload(k) & 0xff); k += 1 }
      // splitmix-style finalizer: without it, near-identical shorts
      // ("a" vs "z") differ only in a few low bits and sit within the
      // hamming-3 pair radius by arithmetic accident
      h ^= (h >>> 30); h *= -4658895280553007687L
      h ^= (h >>> 27); h *= -7723592293110705685L
      h ^= (h >>> 31)
      return h | 1L // never 0, and distinct shorts stay decorrelated
    }
    val luma = new Array[Long](64)
    var i = 3
    while (i < n) {
      var h = ((payload(i - 3) & 0xff) * 131 + (payload(i - 2) & 0xff)) * 131 +
        (payload(i - 1) & 0xff)
      h = h * 131 + (payload(i) & 0xff)
      luma((h ^ (h >>> 7)) & 63) += 1
      i += 1
    }
    // ×1000 fixed-point density (per-length normalization) so payloads
    // of different sizes threshold on comparable scales
    var c = 0
    var sum = 0L
    while (c < 64) {
      luma(c) = luma(c) * 1000L / math.max(1, n)
      sum += luma(c)
      c += 1
    }
    val mean = sum / 64
    var bits = 0L
    c = 0
    while (c < 64) {
      if (luma(c) > mean) bits |= (1L << c)
      c += 1
    }
    bits
  }

  /** Perceptual-hash near-duplicate pairs over the media corpus — the
    * multimodal leg of dedup: decode → 64-bit aHash in the same
    * per-partition batch pass as [[decodeMeta]], then pair by the
    * pigeonhole block join (hamming ≤ 3 over 4 disjoint 16-bit blocks
    * forces at least one identical block — the SimHash banding argument,
    * Dedup.scala:253), verified with an exact codegen'd
    * `bit_count(xor)`. The only shuffle is the block-bucket join;
    * all-pairs never materializes.
    */
  def phashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, fakePhash(p)) })
      .toDF("doc_id", "phash")
    val blocks = hashed.select(col("doc_id"), col("phash"),
      explode(expr(
        "transform(sequence(0, 3), i -> struct(i AS blk, " +
          "shiftright(phash, i * 16) & 65535 AS bval))")).as("e"))
      .select(col("doc_id"), col("phash"),
        col("e.blk").as("blk"), col("e.bval").as("bval"))
    val a = blocks.as("a"); val b = blocks.as("b")
    a.join(b,
        col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
      .orderBy("doc1", "doc2")
  }

  /** Downstream typed-metadata aggregation (the shape a curation pipeline
    * runs after decode): per format, count + size stats.
    */
  def formatStats(meta: DataFrame): DataFrame =
    meta.groupBy("format")
      .agg(count(lit(1)).as("n"),
        sum("byte_len").as("total_bytes"),
        graft.Num.r4(avg(col("width").cast("double"))).as("mean_width"))
      .orderBy("format")
}
