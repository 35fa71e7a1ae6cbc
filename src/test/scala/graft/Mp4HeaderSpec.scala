package graft

import org.scalatest.funsuite.AnyFunSuite

/** MP4 container-header walk (r11, VERDICT r10 "Next #6"): crafted
  * ISO-BMFF byte structures with hand-computed header fields — major
  * brand, mvhd duration in both fullbox versions, per-trak stsd codec
  * fourccs, 64-bit largesize boxes — and the malformed-input contract
  * (None, never a crash; non-MP4 payloads keep routing to the stub).
  * Payload features stay stubbed: the JDK has no video codec. */
class Mp4HeaderSpec extends AnyFunSuite {
  import graft.operators.Multimodal

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** A box with the 64-bit largesize encoding (size field == 1). */
  private def box64(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(1L) ++ typ.getBytes("ISO-8859-1") ++ be64(payload.length + 16L) ++ payload

  private def ftyp(brand: String): Array[Byte] =
    box("ftyp", brand.getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 2, 0))

  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration))

  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(timescale) ++ be64(duration))

  private def trak(codec: String): Array[Byte] = {
    val entry = be32(16L) ++ codec.getBytes("ISO-8859-1") ++ new Array[Byte](8)
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1L) ++ entry)
    box("trak", box("mdia", box("minf", box("stbl", stsd))))
  }

  test("crafted MP4: brand, v0 duration, track count, codec fourccs") {
    // timescale 600, duration 1500 ticks -> 1500*1000/600 = 2500 ms
    val mp4 = ftyp("isom") ++
      box("moov", mvhdV0(600, 1500) ++ trak("avc1") ++ trak("mp4a")) ++
      box("mdat", Array[Byte](1, 2, 3))
    assert(Multimodal.isMp4(mp4))
    val h = Multimodal.parseMp4Header(mp4).get
    assert(h.major_brand == "isom")
    assert(h.duration_ms == 2500L)
    assert(h.track_count == 2)
    assert(h.codecs == Seq("avc1", "mp4a"))
  }

  test("version-1 mvhd (64-bit duration) and largesize moov") {
    // timescale 90000, duration 180000 ticks -> exactly 2000 ms
    val mp4 = ftyp("mp42") ++
      box64("moov", mvhdV1(90000, 180000) ++ trak("hvc1"))
    val h = Multimodal.parseMp4Header(mp4).get
    assert(h.major_brand == "mp42")
    assert(h.duration_ms == 2000L)
    assert(h.track_count == 1)
    assert(h.codecs == Seq("hvc1"))
  }

  test("malformed and non-MP4 payloads degrade to None / the stub") {
    // truncated: moov declares more bytes than exist
    val truncated = ftyp("isom") ++ be32(4096L) ++ "moov".getBytes
    assert(Multimodal.parseMp4Header(truncated).isEmpty)
    // a box whose size is smaller than its own header
    val undersize = ftyp("isom") ++ be32(4L) ++ "moov".getBytes
    assert(Multimodal.parseMp4Header(undersize).isEmpty)
    // plain text is not MP4: the sniff rejects, decodeMedia stubs
    val text = "just some document text".getBytes("UTF-8")
    assert(!Multimodal.isMp4(text))
    assert(Multimodal.parseMp4Header(text).isEmpty)
    def same(a: Multimodal.MediaFeatures, b: Multimodal.MediaFeatures) =
      a.doc_id == b.doc_id && a.n_bytes == b.n_bytes &&
        a.features.toSeq == b.features.toSeq &&
        a.feature_norm == b.feature_norm
    val row = Multimodal.MediaRow(1L, "video", text)
    assert(same(Multimodal.decodeMedia(row), Multimodal.decodeStub(row)))
    // an MP4 payload's FEATURES stay stubbed (no JDK codec) — the
    // header walk never changes the m_* feature surface
    val mp4 = ftyp("isom") ++ box("moov", mvhdV0(600, 600) ++ trak("avc1"))
    val vrow = Multimodal.MediaRow(2L, "video", mp4)
    assert(same(Multimodal.decodeMedia(vrow), Multimodal.decodeStub(vrow)))
  }
}
