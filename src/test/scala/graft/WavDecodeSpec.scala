package graft

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec AUDIO path of the multimodal decode router (VERDICT r9
  * "Next #4"): a crafted 16-bit PCM WAV goes through the same batched
  * `extractFeatures` dataflow as everything else, and the features
  * come back as the hand-computed per-bin RMS / zero-crossing-rate of
  * the actual samples. Non-PCM or non-WAV payloads still route to the
  * deterministic stub, which is what keeps the m_* oracles (text-byte
  * payloads) byte-identical. */
class WavDecodeSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Multimodal

  /** 8-frame mono 16-bit little-endian WAV via the JDK encoder. */
  private def wav(samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xFF).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val samples = Array[Short](
    16384, 16384, // bin 0: rms 0.5, no crossing
    -16384, 16384, // bin 1: rms 0.5, two crossings (entry + internal)
    0, 0, // bin 2: silence — rms 0, no crossing (0 counts as >= 0)
    -32768, -32768) // bin 3: rms 1.0, one crossing on entry

  test("WAV magic sniff routes correctly") {
    assert(Multimodal.isWav(wav(samples)))
    assert(!Multimodal.isWav("plain text payload".getBytes("UTF-8")))
    assert(!Multimodal.isWav("RIFFxxxxWAV?".getBytes("UTF-8")))
    assert(!Multimodal.isPng(wav(samples)))
  }

  test("crafted PCM WAV decodes to its true per-bin RMS / ZCR") {
    import spark.implicits._
    val bytes = wav(samples)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", bytes),
      Multimodal.MediaRow(2L, "audio", "not audio".getBytes("UTF-8")))
      .toDS()
    val out = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().sortBy(_.doc_id)
    val f = out(0).features
    assert(out(0).n_bytes == bytes.length)
    val expected = Array(0.5f, 0f, 0.5f, 1.0f, 0f, 0f, 1.0f, 0.5f)
    (0 until 8).foreach { c =>
      assert(math.abs(f(c) - expected(c)) < 1e-6,
        s"feature $c: got ${f(c)}, want ${expected(c)}")
    }
    // doc 2: the stub, bit-identical to calling it
    val stub = Multimodal.decodeStub(
      Multimodal.MediaRow(2L, "audio", "not audio".getBytes("UTF-8")))
    assert(out(1).features.toSeq == stub.features.toSeq)
  }

  test("non-16-bit-PCM and fake-RIFF payloads degrade to the stub") {
    // 8-bit PCM: parses as audio but fails the 16-bit contract
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
      true, false)
    val raw = Array[Byte](10, 20, 30, 40)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt8, raw.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val eightBit = Multimodal.MediaRow(3L, "audio", bos.toByteArray)
    assert(Multimodal.isWav(eightBit.payload))
    assert(Multimodal.decodeWav(eightBit).isEmpty)
    assert(Multimodal.decodeMedia(eightBit).features.toSeq ==
      Multimodal.decodeStub(eightBit).features.toSeq)
    // text that carries both magics but is not parseable audio
    val fake = Multimodal.MediaRow(4L, "audio",
      "RIFFxxxxWAVE but actually just text".getBytes("UTF-8"))
    assert(Multimodal.isWav(fake.payload))
    assert(Multimodal.decodeMedia(fake).features.toSeq ==
      Multimodal.decodeStub(fake).features.toSeq)
  }

  test("the m_* corpus payloads (utf-8 text) never sniff as WAV") {
    val anyWav = Multimodal.mediaTable(spark, sf)
      .collect().exists(r => Multimodal.isWav(r.payload))
    assert(!anyWav, "text payloads must never sniff as WAV")
  }
}
