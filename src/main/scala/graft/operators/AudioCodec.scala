package graft.operators

/** Pure-JVM RIFF/WAVE (PCM16) parser — the audio leg of the multimodal
  * plumbing, same contract as [[JvmMediaDecoder]]'s AVI walk: a TOTAL
  * function over arbitrary bytes (every size field range-checked, so a
  * corrupt/adversarial payload degrades to None/empty — never throws
  * or loops; a 100 TB scan always contains garbage rows), and the REAL
  * parser on the oracle-gated path — mm_wav_meta / mm_audio_energy
  * build WAVs from row bytes with [[MediaSynth.wavPcm16]] and decode
  * them back here while the DuckDB oracle replays only the
  * construction arithmetic, so a writer/parser disagreement breaks the
  * hash gate. A real audio library drops in at this seam (decode →
  * sample frames) without touching the operators above it.
  */
object AudioCodec {

  final case class WavMeta(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nSamples: Long)

  private def fourCc(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length)
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    else ""

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && fourCc(b, 0) == "RIFF" && fourCc(b, 8) == "WAVE"

  /** Walk the RIFF chunks once, returning the fmt fields and the data
    * chunk's (offset, size). Size fields validated against the
    * remaining buffer before any offset advances (Int-wrap safe).
    */
  private def chunks(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (!isWav(b)) return None
    var o = 12
    var sr = -1; var ch = -1; var bits = -1
    var dataOff = -1; var dataSz = -1
    while (o + 8 <= b.length) {
      val cc = fourCc(b, o)
      val sz = le32(b, o + 4)
      if (sz < 0 || sz > b.length - o - 8) return None
      if (cc == "fmt " && sz >= 16) {
        ch = le16(b, o + 10)
        sr = le32(b, o + 12)
        bits = le16(b, o + 22)
      } else if (cc == "data") {
        dataOff = o + 8; dataSz = sz
      }
      o += 8 + sz + (sz & 1)
    }
    if (sr < 0 || dataOff < 0) None else Some((sr, ch, bits, dataOff, dataSz))
  }

  /** Header metadata, or None on anything that isn't a well-formed
    * PCM WAV.
    */
  def wavMeta(b: Array[Byte]): Option[WavMeta] =
    chunks(b).map { case (sr, ch, bits, _, dataSz) =>
      val bytesPer = math.max(1, (math.max(8, bits) / 8) * math.max(1, ch))
      WavMeta(sr, ch, bits, dataSz.toLong / bytesPer)
    }

  /** PCM16 samples from the data chunk, lazily — a long recording
    * never materializes as a boxed collection; the iterator reads
    * straight off the payload bytes.
    */
  def samples(b: Array[Byte]): Iterator[Short] =
    chunks(b) match {
      case Some((_, _, 16, off, sz)) =>
        val n = sz / 2
        new scala.collection.AbstractIterator[Short] {
          private var i = 0
          override def hasNext: Boolean = i < n
          override def next(): Short = {
            val s = (le16(b, off + 2 * i)).toShort
            i += 1
            s
          }
        }
      case _ => Iterator.empty
    }
}
