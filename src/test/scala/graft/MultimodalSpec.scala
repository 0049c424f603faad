package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real-pixel tests for the JDK-ImageIO image path (the synthetic driver
  * tables carry non-image payloads, so q25/q56 exercise the stub path;
  * these cases build actual PNGs in memory). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("media_id", "payload")
  }

  test("real PNG decode: dimensions and exact channel sums") {
    val red = solidPng(8, 4, 0xFF0000) // 32 px, r=255 each
    val teal = solidPng(3, 3, 0x008080) // 9 px, g=b=128
    val notImage = "hello world".getBytes("UTF-8")
    val out = Multimodal.extractImageFeatures(
      mediaDf(Seq((1L, red), (2L, teal), (3L, notImage))))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) == ((8, 4, 32L * 255, 0L, 0L)))
    assert(out(2L) == ((3, 3, 0L, 9L * 128, 9L * 128)))
    assert(out(3L)._1 == -1) // non-image falls through, no crash
  }

  test("real resize: fits maxDim, preserves solid color, re-decodes") {
    val big = solidPng(64, 32, 0x123456)
    val out = Multimodal.resizeImages(mediaDf(Seq((7L, big))), 16)
      .collect().head
    assert(out.getBoolean(2))
    val img = ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](1)))
    assert(img.getWidth == 16 && img.getHeight == 8)
    assert((img.getRGB(5, 5) & 0xFFFFFF) == 0x123456)
    // non-images pass through byte-identical
    val raw = Array[Byte](1, 2, 3, 4, 5)
    val pass = Multimodal.resizeImages(mediaDf(Seq((8L, raw))), 16)
      .collect().head
    assert(!pass.getBoolean(2))
    assert(pass.getAs[Array[Byte]](1).toSeq == raw.toSeq)
  }

  test("resized image composes with feature extraction") {
    val big = solidPng(40, 40, 0x00FF00)
    val resized = Multimodal.resizeImages(mediaDf(Seq((9L, big))), 10)
    val feats = Multimodal.extractImageFeatures(resized).collect().head
    assert(feats.getInt(1) == 10 && feats.getInt(2) == 10)
    assert(feats.getLong(4) == 100L * 255) // green preserved through resize
  }
}
