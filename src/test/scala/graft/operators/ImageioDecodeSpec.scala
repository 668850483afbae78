package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** Proves the multimodal seam carries a REAL codec: generated PNGs
  * (JDK ImageIO round-trip — no external fixture, no network) go
  * through the same typed mapPartitions plumbing as the stub decoder
  * and come back with codec-derived dimensions and pixel features. */
class ImageioDecodeSpec extends SparkSpec {

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG bytes decode to codec dimensions and pixel features") {
    import spark.implicits._
    val white = png(16, 8)((_, _) => 0xffffff)
    val black = png(10, 10)((_, _) => 0x000000)
    // left half black, right half white — a split the aHash must see
    val split = png(32, 32)((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val rows = Seq(
      // metadata width/height are LIES (the decoder must not trust them)
      MultimodalOps.ImageRow(1L, white, 999, 999, "png"),
      MultimodalOps.ImageRow(2L, black, 1, 1, "png"),
      MultimodalOps.ImageRow(3L, split, 5, 5, "png")).toDF()

    val out = MultimodalOps.decodeImagesReal(spark, rows)
      .collect().map(d => d.image_id -> d).toMap
    assert(out(1L).width == 16 && out(1L).height == 8,
      "dimensions must come from the codec, not metadata")
    assert(out(1L).brightness == 255L)
    assert(out(2L).width == 10 && out(2L).brightness == 0L)
    // uniform images: every cell == mean, >= threshold sets ALL bits
    assert(out(1L).phash == "f" * 16 && out(2L).phash == "f" * 16)
    // split image: right-half cells above mean → per-row bit pattern
    // 00001111 (MSB-first, left to right) = 0x0f repeated per row
    assert(out(3L).phash == "0f" * 8,
      s"aHash must see the black/white split, got ${out(3L).phash}")
    assert(out(3L).brightness == 127L) // (0*512 + 255*512)/1024
    assert(out(1L).n_bytes == white.length.toLong)
  }

  test("undecodable payloads fail loudly instead of minting features") {
    import spark.implicits._
    val rows = Seq(MultimodalOps.ImageRow(9L,
      "not an image at all".getBytes("UTF-8"), 4, 4, "png")).toDF()
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.decodeImagesReal(spark, rows).collect()
    }
    assert(e.getMessage != null)
  }

  test("mm09's IHDR parse reads REAL encoder output — and nulls on non-PNG") {
    // the header-parse expressions must agree with the codec on bytes a
    // real encoder wrote (offsets/endianness are spec facts, not
    // synthesized-fixture facts), and refuse non-PNG bytes
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, png(640, 360)((_, _) => 0x336699)),
      (2L, png(17, 4099)((x, y) => x * y)),     // dims crossing a byte
      (3L, "RIFF....WEBP not a png".getBytes("UTF-8")))
    val out = rows.toDF("id", "payload")
      .select(col("id"),
        MultimodalOps.pngWidth(col("payload")).as("w"),
        MultimodalOps.pngHeight(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(out(1L).contains((640L, 360L)), s"got ${out(1L)}")
    assert(out(2L).contains((17L, 4099L)), s"got ${out(2L)}")
    assert(out(3L).isEmpty, "non-PNG bytes must parse to null, not garbage")
  }
}
