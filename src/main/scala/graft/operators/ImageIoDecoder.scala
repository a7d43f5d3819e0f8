package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

/** A REAL codec behind the [[MediaDecoder]] seam — JDK-only
  * (javax.imageio, zero new dependencies), decoding the formats the
  * JDK ships readers for (PNG, JPEG, GIF, BMP, WBMP). Proves the r4/r5
  * seam claim with an actual decoder: every Multimodal operator takes
  * this instance in place of [[MediaDecoder.Stub]] and nothing else
  * moves — schema, batch shape, pigeonhole join, resize planning are
  * codec-independent (the gate queries stay on Stub so the DuckDB
  * oracles replay unchanged; a deployment passes `ImageIoDecoder`).
  *
  * Contract compliance:
  *  - `decode` is total: undecodable payloads → ("unknown", 0, 0, 0)
  *    — never throws (a 100 TB scan always contains garbage rows).
  *  - `phash` is the classic aHash (reference repo analogue: average
  *    hash over an 8×8 luma grid): decode → per-cell mean luma
  *    (ITU-R BT.601 integer weights ×1000) → threshold at the grid
  *    mean → 64-bit pack, row-major bit c = cy·8+cx. A localized edit
  *    perturbs only the touched cells; unrelated images sit ~32 bits
  *    apart. Undecodable payloads fall back to [[MediaDecoder.Stub]]'s
  *    byte-shingle hash so degenerate rows never weld into one
  *    hamming-0 cluster.
  *  - Deterministic: integer luma accumulation in raster order; no
  *    float rounding, no platform-dependent color management for the
  *    common 8-bit RGB/gray paths.
  *
  * For video (frame-sample → per-frame phash) swap in an ffmpeg-backed
  * implementation of the same trait; `decoderInit` is the hook for
  * loading native libs once per partition (see README "Media codecs").
  */
object ImageIoDecoder extends MediaDecoder {

  /** ImageIO's disk cache is pure overhead for in-memory payloads;
    * called once per partition (the decoderInit contract).
    */
  override def decoderInit(): Unit = javax.imageio.ImageIO.setUseCache(false)

  private def readImage(payload: Array[Byte]): Option[(String, BufferedImage)] = {
    if (payload == null || payload.length == 0) return None
    var in: javax.imageio.stream.ImageInputStream = null
    try {
      in = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val img = r.read(0)
          if (img == null) None else Some((normalize(r.getFormatName), img))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (in != null) in.close()
  }

  private def normalize(fmt: String): String = fmt.toLowerCase match {
    case "jpg" | "jpeg" => "jpeg"
    case other => other
  }

  override def decode(payload: Array[Byte]): MediaDecoder.Meta =
    readImage(payload) match {
      case Some((fmt, img)) =>
        val w = img.getWidth
        val h = img.getHeight
        // stable content digest: 31-fold over the ARGB raster in
        // raster order (the Stub's fold convention, applied to decoded
        // pixels instead of encoded bytes — survives re-encoding)
        val row = new Array[Int](w)
        var acc = 1125899906842597L
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) { acc = 31 * acc + row(x); x += 1 }
          y += 1
        }
        MediaDecoder.Meta(fmt, w, h, acc)
      case None => MediaDecoder.Meta("unknown", 0, 0, 0L)
    }

  /** 8×8 grid of per-cell mean luma (BT.601 integer weights ×1000),
    * row-major — the shared core of [[phash]] and the video decoder's
    * keyframe saliency score. None when the payload doesn't decode.
    */
  private[operators] def gridLuma(payload: Array[Byte]): Option[Array[Long]] =
    readImage(payload).map { case (_, img) =>
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val p = row(x)
          // BT.601 integer luma ×1000: 299 R + 587 G + 114 B
          val luma = 299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
            114 * (p & 0xff)
          val c = cy * 8 + x * 8 / w
          sums(c) += luma
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(64)(c => if (counts(c) > 0) sums(c) / counts(c) else 0L)
    }

  override def phash(payload: Array[Byte]): Long =
    gridLuma(payload) match {
      case Some(cell) =>
        var c = 0
        var total = 0L
        while (c < 64) { total += cell(c); c += 1 }
        val mean = total / 64
        var bits = 0L
        c = 0
        while (c < 64) {
          if (cell(c) > mean) bits |= (1L << c)
          c += 1
        }
        bits
      case None => MediaDecoder.Stub.phash(payload)
    }
}
