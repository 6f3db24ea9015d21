package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Exif
import graft.ops.Multimodal

/** EXIF (TIFF-IFD-in-APP1) metadata tests: writer-forward corpus over real
  * JPEGs, parser recovers every field; orientation feeds the real resize.
  */
class ExifSpec extends AnyFunSuite {

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 11) % 255) << 16 | (x % 255) << 8 | (y % 255))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("writer/parser round-trip over a real JPEG recovers every field") {
    val base = jpeg(40, 30)
    assert(Exif.parse(base).isEmpty) // ImageIO writes no EXIF
    val meta = Exif.Meta(6, "graftcam", "model-x 2000", "2026:01:15 10:30:00",
      "2026:01:15 10:29:58", 40, 30)
    val tagged = Exif.withExif(base, meta)
    val got = Exif.parse(tagged).get
    assert(got == meta, got.toString)
    // the tagged file still decodes as the same image
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tagged))
    assert(img.getWidth == 40 && img.getHeight == 30)
  }

  test("little-endian TIFF payloads parse (hand-built II header)") {
    // minimal II TIFF: header + one-entry IFD0 carrying Orientation=3
    val t = Array[Byte](
      'I', 'I', 42, 0, 8, 0, 0, 0, // II, 42, IFD0 at 8
      1, 0, // one entry
      0x12, 0x01, 3, 0, 1, 0, 0, 0, 3, 0, 0, 0, // Orientation SHORT 3
      0, 0, 0, 0) // next IFD
    val app1Body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ t
    val jp = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe1.toByte,
      (((app1Body.length + 2) >> 8) & 0xff).toByte,
      ((app1Body.length + 2) & 0xff).toByte) ++ app1Body ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    assert(Exif.parse(jp).map(_.orientation).contains(3))
  }

  test("hostile payloads fail closed") {
    assert(Exif.parse(Array.emptyByteArray).isEmpty)
    assert(Exif.parse("not a jpeg".getBytes("US-ASCII")).isEmpty)
    val base = jpeg(16, 16)
    val tagged = Exif.withExif(base, Exif.Meta(1, "a", "b", "c", "d", 16, 16))
    // truncating inside the APP1 must not throw
    Exif.parse(tagged.take(30))
    // a lying IFD offset points past the segment: None, not a crash
    val bad = tagged.clone()
    bad(2 + 4 + 6 + 4 + 3) = 0x7f.toByte // IFD0 offset low bytes -> huge
    Exif.parse(bad) // must not throw
  }

  test("resize honors the orientation tag: rotated dims, no sideways thumbs") {
    val base = jpeg(60, 20) // landscape stored sideways
    for ((o, expectSwap) <- Seq(1 -> false, 3 -> false, 6 -> true, 8 -> true)) {
      val tagged = Exif.withExif(base, Exif.Meta(o, "c", "m", "t", "t", 60, 20))
      val Some((_, rw, rh)) = Multimodal.resizeImage(tagged, maxSide = 30)
      if (expectSwap) assert(rw == 10 && rh == 30, s"o=$o got ${rw}x$rh")
      else assert(rw == 30 && rh == 10, s"o=$o got ${rw}x$rh")
    }
    // pixel-level: orientation 3 is an exact 180 rotation of the source
    val img0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val tagged3 = Exif.withExif(base, Exif.Meta(3, "c", "m", "t", "t", 60, 20))
    val Some((png, _, _)) = Multimodal.resizeImage(tagged3, maxSide = 60)
    val r = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(r.getRGB(0, 0) == img0.getRGB(59, 19))
    assert(r.getRGB(59, 19) == img0.getRGB(0, 0))
  }
}
