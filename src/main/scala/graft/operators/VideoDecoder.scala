package graft.operators

/** Frame-capable extension of the [[MediaDecoder]] seam: a video codec
  * exposes its frame stream as independently decodable payloads (JPEG
  * bytes for MJPEG), plus a per-frame saliency score for keyframe
  * selection. A still image is a one-frame video, so the frame
  * operators are total over mixed corpora.
  */
trait FrameDecoder extends MediaDecoder {

  /** Lazily-iterated frame payloads; each element is itself decodable
    * by `decode`/`phash` (e.g. one JPEG per MJPEG frame). Still images
    * yield themselves once; metadata-only formats yield nothing.
    */
  def frames(payload: Array[Byte]): Iterator[Array[Byte]]

  /** Per-frame keyframe score (higher = more informative). Must be
    * deterministic integer arithmetic.
    */
  def frameScore(framePayload: Array[Byte]): Long
}

/** The zero-native-dependency production decoder (reference analogue:
  * the ffmpeg frame-sampling stage of a vision-LM data pipeline):
  *
  *  - **AVI/MJPEG** (RIFF container): parsed by this object — `avih`
  *    main header for (width, height), `movi` list walked for the
  *    `..dc`/`..db` frame chunks, each of which is a standalone JPEG
  *    decoded through [[ImageIoDecoder]]. This is REAL video decode,
  *    pure JVM.
  *  - **MP4 / ISO-BMFF**: metadata-only (no JVM H.264 decoder exists;
  *    an ffmpeg-backed [[FrameDecoder]] is the swap-in for pixel
  *    access): `moov`→`trak`→`tkhd` parsed for the 16.16-fixed track
  *    width/height; frames yield nothing.
  *  - **Still images** (PNG/JPEG/GIF/BMP): delegate to
  *    [[ImageIoDecoder]]; `frames` yields the payload once.
  *  - Anything else: the total-function contract — ("unknown",0,0,0)
  *    metadata, the Stub byte-shingle phash fallback, no frames.
  *
  * `frameScore` is the 8×8 luma-grid VARIANCE of the decoded frame
  * (integer arithmetic): sharp/busy frames outrank flat ones — the
  * standard cheap saliency proxy for keyframe selection. Pinned by
  * VideoDecoderSpec's golden AVI (written byte-by-byte in the spec).
  */
object JvmMediaDecoder extends FrameDecoder {

  override def decoderInit(): Unit = ImageIoDecoder.decoderInit()

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def fourCc(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) ""
    else new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")

  private def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && fourCc(b, 0) == "RIFF" && fourCc(b, 8) == "AVI "

  private def isIsoBmff(b: Array[Byte]): Boolean =
    b.length >= 12 && fourCc(b, 4) == "ftyp"

  /** 31-fold checksum over the encoded payload — the Stub convention,
    * stable whatever the container.
    */
  private def byteFold(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  // ---- AVI (RIFF little-endian chunks) ----

  /** (width, height) from the `avih` main header, or None. Chunk sizes
    * are validated: a corrupt/adversarial negative size field must
    * degrade to "unknown", never loop or throw (a 100 TB scan always
    * contains garbage rows — the total-function contract).
    */
  private def aviHeader(b: Array[Byte]): Option[(Int, Int)] = {
    var o = 12
    // top-level chunks; the hdrl LIST leads and contains avih.
    // Every size field is range-checked against the REMAINING buffer
    // before the offset advances: a negative size OR one past the end
    // (e.g. 0x7FFFFFFF, whose `o += 8 + sz + 1` would wrap Int and
    // index negatively) degrades to "unknown" — never throw/loop, the
    // total-function contract a 100 TB scan requires.
    while (o + 8 <= b.length) {
      val cc = fourCc(b, o)
      val sz = le32(b, o + 4)
      if (sz < 0 || sz > b.length - o - 8) return None
      if (cc == "LIST" && fourCc(b, o + 8) == "hdrl") {
        var p = o + 12
        val end = math.min(b.length, o + 8 + sz)
        while (p + 8 <= end) {
          val psz = le32(b, p + 4)
          if (psz < 0 || psz > b.length - p - 8) return None
          if (fourCc(b, p) == "avih" && p + 8 + 40 <= b.length)
            return Some((le32(b, p + 8 + 32), le32(b, p + 8 + 36)))
          p += 8 + psz + (psz & 1)
        }
        return None
      }
      o += 8 + sz + (sz & 1)
    }
    None
  }

  /** Frame chunks (`..dc`/`..db`) inside the movi LIST, in stream
    * order, lazily — a long video never materializes all frames.
    */
  private def aviFrames(b: Array[Byte]): Iterator[Array[Byte]] = {
    // locate the movi LIST
    var o = 12
    var movi = -1
    var moviEnd = -1
    while (movi < 0 && o + 12 <= b.length) {
      val cc = fourCc(b, o)
      val sz = le32(b, o + 4)
      // corrupt size (negative OR past-the-end, which would wrap the
      // Int offset): stop the walk, never loop/throw
      if (sz < 0 || sz > b.length - o - 8) return Iterator.empty
      if (cc == "LIST" && fourCc(b, o + 8) == "movi") {
        movi = o + 12
        moviEnd = math.min(b.length, o + 8 + sz)
      }
      o += 8 + sz + (sz & 1)
    }
    if (movi < 0) Iterator.empty
    else new scala.collection.AbstractIterator[Array[Byte]] {
      private var p = movi
      private var nxt: Array[Byte] = _
      private def advance(): Unit = {
        nxt = null
        while (nxt == null && p + 8 <= moviEnd) {
          val cc = JvmMediaDecoder.fourCc(b, p)
          val sz = le32(b, p + 4)
          // corrupt size (negative or past-the-end → Int wrap): stop
          if (sz < 0 || sz > b.length - p - 8) { p = moviEnd }
          else {
            if (cc.endsWith("dc") || cc.endsWith("db"))
              nxt = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + sz)
            p += 8 + sz + (sz & 1)
          }
        }
      }
      advance()
      override def hasNext: Boolean = nxt != null
      override def next(): Array[Byte] = { val f = nxt; advance(); f }
    }
  }

  // ---- MP4 / ISO-BMFF (big-endian size-prefixed boxes) ----

  /** (width, height) from the first video `tkhd` (16.16 fixed), or
    * None. Walks moov→trak→tkhd; track dimensions of audio tracks are
    * zero and skipped.
    */
  private def mp4Dims(b: Array[Byte]): Option[(Int, Int)] = {
    def walk(from: Int, to: Int): Option[(Int, Int)] = {
      var o = from
      while (o + 8 <= to) {
        val sz = be32(b, o)
        // sz < 8 catches negative/undersized boxes; sz > to - o catches
        // a box claiming past the end, whose `o + sz` would wrap Int
        if (sz < 8 || sz > to - o) return None
        val tp = fourCc(b, o + 4)
        val end = o + sz
        tp match {
          case "moov" | "trak" =>
            val r = walk(o + 8, end)
            if (r.isDefined) return r
          case "tkhd" if o + 9 <= b.length =>
            val v = b(o + 8) & 0xff
            // width sits 76 (v0) / 88 (v1) bytes into the box content
            // (after the 8-byte box header + 4-byte version/flags +
            // times/ids/duration + reserved + layer/volume + matrix)
            val base = if (v == 1) o + 8 + 88 else o + 8 + 76
            if (base + 8 <= b.length) {
              val w = be32(b, base) >>> 16
              val h = be32(b, base + 4) >>> 16
              if (w > 0 && h > 0) return Some((w, h))
            }
          case _ => ()
        }
        o += sz
      }
      None
    }
    walk(0, b.length)
  }

  override def decode(payload: Array[Byte]): MediaDecoder.Meta =
    if (payload == null || payload.length == 0) MediaDecoder.Meta("unknown", 0, 0, 0L)
    else if (isAvi(payload)) aviHeader(payload) match {
      case Some((w, h)) => MediaDecoder.Meta("mjpeg", w, h, byteFold(payload))
      case None => MediaDecoder.Meta("unknown", 0, 0, 0L)
    }
    else if (isIsoBmff(payload)) mp4Dims(payload) match {
      case Some((w, h)) => MediaDecoder.Meta("mp4", w, h, byteFold(payload))
      case None => MediaDecoder.Meta("mp4", 0, 0, byteFold(payload))
    }
    else ImageIoDecoder.decode(payload)

  override def phash(payload: Array[Byte]): Long =
    if (payload != null && isAvi(payload)) {
      val it = aviFrames(payload)
      if (it.hasNext) ImageIoDecoder.phash(it.next())
      else MediaDecoder.Stub.phash(payload)
    } else ImageIoDecoder.phash(payload)

  override def frames(payload: Array[Byte]): Iterator[Array[Byte]] =
    if (payload == null || payload.length == 0) Iterator.empty
    else if (isAvi(payload)) aviFrames(payload)
    else if (isIsoBmff(payload)) Iterator.empty // metadata-only (see scaladoc)
    else Iterator.single(payload) // a still is a one-frame video

  override def frameScore(framePayload: Array[Byte]): Long =
    ImageIoDecoder.gridLuma(framePayload) match {
      case Some(cells) =>
        // integer variance of the 8×8 cell means ×64 (exact): busy or
        // sharp frames spread their luma; flat frames score ~0
        var s = 0L
        var i = 0
        while (i < 64) { s += cells(i); i += 1 }
        val mean = s / 64
        var v = 0L
        i = 0
        while (i < 64) { val d = cells(i) - mean; v += d * d; i += 1 }
        v / 64
      case None =>
        java.lang.Math.floorMod(MediaDecoder.Stub.phash(framePayload), 1048576L)
    }
}
