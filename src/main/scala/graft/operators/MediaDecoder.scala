package graft.operators

/** The decode seam for the multimodal operators: everything Multimodal
  * does downstream of raw bytes — metadata schema, per-partition batch
  * shape, resize planning, frame fan-out, the pigeonhole phash join —
  * is codec-independent, so the codec itself is this one injectable
  * interface. A deployment with real media libraries implements it with
  * ImageIO/ffmpeg (one instance per partition — `decoderInit` is the
  * hook for expensive native setup) and every operator, spec, and
  * oracle keeps working unchanged; this sandbox ships [[MediaDecoder.Stub]].
  *
  * Contract (pinned by MediaDecoderSpec's golden table):
  *   - `decode` is pure and total: any byte payload yields metadata
  *     (real codecs map undecodable payloads to `format = "unknown"`,
  *     width = height = 0 — never throw, a 100 TB scan always contains
  *     garbage rows).
  *   - `phash` is a 64-bit content-local perceptual hash: a localized
  *     edit moves few bits, unrelated payloads sit ~32 bits apart.
  *     Must never return a constant for degenerate payloads (that
  *     would weld all of them into one hamming-0 near-dup cluster).
  *   - Both deterministic: same bytes → same result, on any executor.
  */
trait MediaDecoder extends Serializable {

  /** Called once per partition before the first `decode`/`phash` call —
    * the place for native-library init a real codec needs. The stub
    * needs none.
    */
  def decoderInit(): Unit = ()

  def decode(payload: Array[Byte]): MediaDecoder.Meta

  def phash(payload: Array[Byte]): Long
}

object MediaDecoder {

  /** format ∈ {"png","jpeg","webp",...,"unknown"}; checksum is any
    * stable 64-bit digest of the decoded content (the frame-sample and
    * dedup paths key on it).
    */
  final case class Meta(format: String, width: Int, height: Int, checksum: Long)

  /** STUB codec for this sandbox (no image/audio libraries in the
    * container): derives deterministic pseudo-metadata and a
    * shingle-class aHash from the payload bytes, so the pipeline is
    * testable end-to-end and the oracle can replay it (HUGEINT mod-2⁶⁴
    * on the DuckDB side — SQL_MM_META). A real deployment replaces this
    * object, nothing else.
    */
  object Stub extends MediaDecoder {

    override def decode(payload: Array[Byte]): Meta = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      val fmt = (math.floorMod(h, 3L): @unchecked) match {
        case 0L => "png"
        case 1L => "jpeg"
        case 2L => "webp"
      }
      Meta(fmt, 64 + math.floorMod(h >> 8, 1856L).toInt,
        64 + math.floorMod(h >> 16, 1016L).toInt, h)
    }

    /** A real implementation decodes, downscales to an 8×8 luma grid,
      * and thresholds each cell at the mean (aHash). Here the 64 "luma"
      * cells are length-normalized frequencies of 64 hashed
      * 4-byte-shingle classes — CONTENT-LOCAL the way downscaling is: a
      * localized edit perturbs only the touched shingles' classes, so
      * near-identical payloads land within small hamming distance,
      * while unrelated payloads sit ~half the profile apart. Everything
      * downstream of the 64-cell grid — mean threshold, 64-bit pack —
      * is exactly what a codec-backed aHash runs.
      */
    override def phash(payload: Array[Byte]): Long = {
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
  }
}
