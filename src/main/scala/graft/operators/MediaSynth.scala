package graft.operators

/** Deterministic synthetic media containers — the harness that puts the
  * REAL parsers on the ORACLE-GATED path: the mm_mp4_meta /
  * mm_avi_probe gate rows build containers from row bytes with these
  * writers and decode them back through [[JvmMediaDecoder]], while the
  * DuckDB oracle replays only the CONSTRUCTION arithmetic (folds,
  * slices) — so a writer/parser disagreement breaks the hash gate.
  * VideoDecoderSpec shares the same writers for its golden AVI.
  */
object MediaSynth {

  def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** RIFF chunk with the spec's odd-size pad byte. */
  def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    cc(id) ++ le32(body.length) ++ body ++ pad
  }

  def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(kind) ++ body)

  /** Minimal AVI: RIFF('AVI ' LIST(hdrl avih) LIST(movi 00dc…)). */
  def mjpegAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = chunk("avih",
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ list("hdrl", avih) ++ movi
    cc("RIFF") ++ le32(body.length) ++ body
  }

  def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Minimal PCM16 mono WAV: RIFF('WAVE' fmt data), little-endian
    * samples — decoded back by [[AudioCodec]] on the hashed path.
    */
  def wavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = chunk("fmt ", le16(1) ++ le16(1) ++ le32(sampleRate) ++
      le32(sampleRate * 2) ++ le16(2) ++ le16(16))
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val body = cc("WAVE") ++ fmt ++ chunk("data", data)
    cc("RIFF") ++ le32(body.length) ++ body
  }

  /** Minimal ISO-BMFF: ftyp + moov(trak(tkhd v0, 16.16-fixed dims)). */
  def mp4(w: Int, h: Int): Array[Byte] = {
    def box(tp: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8) ++ cc(tp) ++ body
    val tkhdBody = Array[Byte](0, 0, 0, 0) ++
      Array.fill(4 * 5)(0.toByte) ++
      Array.fill(8)(0.toByte) ++
      Array.fill(2 + 2 + 2 + 2)(0.toByte) ++
      Array.fill(36)(0.toByte) ++
      be32(w << 16) ++ be32(h << 16)
    box("ftyp", cc("isom") ++ be32(512) ++ cc("isomiso2")) ++
      box("moov", box("trak", box("tkhd", tkhdBody)))
  }
}
