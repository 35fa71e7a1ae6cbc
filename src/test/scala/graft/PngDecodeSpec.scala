package graft

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec path of the multimodal decode router (VERDICT r8
  * "Next #5"): a crafted 4×4 PNG goes through the SAME batched
  * `extractFeatures` dataflow as everything else, and the features
  * come back as the hand-computed 4×2 grid-pooled luma of the actual
  * pixels — pixels, not payload-hash fakes. Non-PNG payloads still
  * route to the deterministic stub, which is what keeps the m_*
  * oracles (text-byte payloads) byte-identical. */
class PngDecodeSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Multimodal

  /** 4×4 PNG: left half black, right half white, via the JDK encoder. */
  private def png4x4(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("PNG magic sniff routes correctly") {
    assert(Multimodal.isPng(png4x4()))
    assert(!Multimodal.isPng("plain text payload".getBytes("UTF-8")))
    assert(!Multimodal.isPng(Array[Byte](0x89.toByte, 'P')))
  }

  test("crafted 4x4 PNG decodes to its true grid-pooled luma") {
    import spark.implicits._
    val bytes = png4x4()
    val media = Seq(
      Multimodal.MediaRow(1L, "image", bytes),
      Multimodal.MediaRow(2L, "image", "not a png".getBytes("UTF-8")))
      .toDS()
    val out = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().sortBy(_.doc_id)
    // doc 1: real decode. Grid cells are (xcell 0..3) × (ycell 0..1);
    // w = h = 4 so xcell = x, ycell = y/2. Left half (x<2) is black
    // (luma 0), right half white (luma 255e3/255e3 = 1.0).
    val f1 = out(0).features
    assert(out(0).n_bytes == bytes.length)
    val expected = Array(0f, 0f, 0f, 0f, 1f, 1f, 1f, 1f)
    (0 until 8).foreach { c =>
      assert(math.abs(f1(c) - expected(c)) < 1e-6,
        s"cell $c: got ${f1(c)}, want ${expected(c)}")
    }
    assert(math.abs(out(0).feature_norm - 2.0) < 1e-6)
    // doc 2: the stub (md5 features), bit-identical to calling it
    val stub = Multimodal.decodeStub(
      Multimodal.MediaRow(2L, "image", "not a png".getBytes("UTF-8")))
    assert(out(1).features.toSeq == stub.features.toSeq)
  }

  test("JPEG and GIF payloads decode through the same real-pixel path") {
    // uniform mid-gray: survives JPEG's lossy roundtrip within a small
    // tolerance; GIF's palette roundtrip is exact for one color
    def uniform(rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      img
    }
    def enc(fmt: String, img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val jpeg = enc("jpg", uniform(0x808080))
    val gif = enc("gif", uniform(0x808080))
    assert(Multimodal.isJpeg(jpeg) && !Multimodal.isPng(jpeg))
    assert(Multimodal.isGif(gif) && !Multimodal.isJpeg(gif))
    Seq("jpeg" -> jpeg, "gif" -> gif).foreach { case (fmt, bytes) =>
      val f = Multimodal.decodeMedia(Multimodal.MediaRow(7L, "image", bytes))
      // mean luma of uniform 0x808080 = 128/255 ≈ 0.50196 in all cells
      f.features.zipWithIndex.foreach { case (v, c) =>
        assert(math.abs(v - 128.0 / 255.0) < 0.02,
          s"$fmt cell $c: got $v, want ~0.502")
      }
    }
  }

  test("a sniff false-positive degrades to the stub, never crashes") {
    val fake = Multimodal.MediaRow(9L, "image",
      "GIF89a but actually just text".getBytes("UTF-8"))
    assert(Multimodal.isGif(fake.payload))
    val got = Multimodal.decodeMedia(fake)
    assert(got.features.toSeq == Multimodal.decodeStub(fake).features.toSeq)
  }

  test("a decompression bomb (huge declared dimensions) routes to the stub") {
    // hand-built PNG: real signature + IHDR declaring 100000×100000
    // (1e10 pixels — a ~40 GB decode) and nothing else. The dimension
    // peek must reject it from the header alone, BEFORE any pixel
    // allocation, and the router must degrade to the stub.
    def be(i: Int): Array[Byte] = Array(
      (i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    val ihdrBody = be(100000) ++ be(100000) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII"))
    crc.update(ihdrBody)
    val bomb =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
        be(13) ++ "IHDR".getBytes("US-ASCII") ++ ihdrBody ++
        be(crc.getValue.toInt)
    assert(Multimodal.isPng(bomb))
    assert(Multimodal.peekPixels(bomb).contains(100000L * 100000L))
    val row = Multimodal.MediaRow(11L, "image", bomb)
    assert(Multimodal.decodeImage(row).isEmpty)
    assert(Multimodal.decodeMedia(row).features.toSeq ==
      Multimodal.decodeStub(row).features.toSeq)
    // the gate must NOT reject legitimate sizes: the 4×4 still decodes
    assert(Multimodal.decodeImage(
      Multimodal.MediaRow(12L, "image", png4x4())).nonEmpty)
  }

  test("the m_* corpus payloads (utf-8 text) all route to the stub") {
    val anyPng = Multimodal.mediaTable(spark, sf)
      .collect().exists(r => Multimodal.isPng(r.payload))
    assert(!anyPng, "text payloads must never sniff as PNG")
  }
}
