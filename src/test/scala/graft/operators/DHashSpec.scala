package graft.operators

import graft.SparkSpec

class DHashSpec extends SparkSpec {

  private def p6(w: Int, h: Int)(rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      (for (r <- 0 until h; c <- 0 until w; b <- {
        val (x, y, z) = rgb(r, c); Seq(x.toByte, y.toByte, z.toByte)
      }) yield b)

  private def tinyPng(w: Int, h: Int)(rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until h; c <- 0 until w) {
      val (x, y, z) = rgb(r, c)
      img.setRGB(c, r, x << 16 | y << 8 | z)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("monotone gradients pin the exact bit pattern") {
    // luma strictly decreasing left-to-right: every cell brighter than
    // its right neighbor -> all 56 bits; increasing -> none; flat -> none
    // (strict >)
    val dec = p6(16, 16)((_, c) => (255 - 15 * c, 255 - 15 * c, 255 - 15 * c))
    val inc = p6(16, 16)((_, c) => (15 * c, 15 * c, 15 * c))
    val flat = p6(16, 16)((_, _) => (77, 77, 77))
    assert(Multimodal.dHash(dec) === Some((1L << 56) - 1))
    assert(Multimodal.dHash(inc) === Some(0L))
    assert(Multimodal.dHash(flat) === Some(0L))
  }

  test("PNG and P6 of identical pixels hash identically") {
    val rgb = (r: Int, c: Int) => ((r * 37 + c * 11) % 256, (r * 53 + c * 7) % 256, (r * 3 + c * 91) % 256)
    assert(Multimodal.dHash(tinyPng(16, 16)(rgb)) === Multimodal.dHash(p6(16, 16)(rgb)))
    assert(Multimodal.dHash(tinyPng(16, 16)(rgb)).isDefined)
  }

  test("non-divisible dims match an independent exact-rational reference") {
    val rgb = (r: Int, c: Int) => ((r * 61 + c * 17) % 256, (r * 29 + c * 43) % 256, (r * 13 + c * 5) % 256)
    val (w, h) = (17, 11)
    val sums = Array.fill(8, 8)(BigInt(0))
    val cnts = Array.fill(8, 8)(BigInt(0))
    for (y <- 0 until h; x <- 0 until w) {
      val (rr, gg, bb) = rgb(y, x)
      sums(y * 8 / h)(x * 8 / w) += rr * 299 + gg * 587 + bb * 114
      cnts(y * 8 / h)(x * 8 / w) += 1
    }
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 7)
      if (sums(r)(c) * cnts(r)(c + 1) > sums(r)(c + 1) * cnts(r)(c))
        want |= 1L << (r * 7 + c)
    assert(Multimodal.dHash(p6(w, h)(rgb)) === Some(want))
  }

  test("one-pixel perturbation moves at most 2 bits; opposite gradients are 56 apart") {
    val rgb = (r: Int, c: Int) => ((r * 37 + c * 11) % 256, (r * 53 + c * 7) % 256, (r * 3 + c * 91) % 256)
    val base = Multimodal.dHash(p6(16, 16)(rgb)).get
    val tweaked = Multimodal.dHash(p6(16, 16)((r, c) =>
      if (r == 5 && c == 9) (255, 255, 255) else rgb(r, c))).get
    // the touched 2x2 cell participates in its left and right comparison
    assert(java.lang.Long.bitCount(base ^ tweaked) <= 2)
    val dec = Multimodal.dHash(p6(16, 16)((_, c) => (255 - 15 * c, 255 - 15 * c, 255 - 15 * c))).get
    val inc = Multimodal.dHash(p6(16, 16)((_, c) => (15 * c, 15 * c, 15 * c))).get
    assert(java.lang.Long.bitCount(dec ^ inc) === 56)
  }

  test("undersized rasters, garbage, and truncated P6 hash to None") {
    assert(Multimodal.dHash(p6(4, 4)((_, _) => (1, 2, 3))) === None)
    assert(Multimodal.dHash("not an image at all".getBytes("US-ASCII")) === None)
    val trunc = p6(16, 16)((_, _) => (5, 5, 5)).dropRight(7)
    assert(Multimodal.dHash(trunc) === None)
  }

  test("dHashBatched drops non-images/nulls and is batch-size independent") {
    val s = spark
    import s.implicits._
    val rgb = (r: Int, c: Int) => ((r * 7 + c) % 256, (r * 5 + c) % 256, (c * 9 + r) % 256)
    val rows = Seq(
      (1L, p6(16, 16)(rgb)),
      (2L, "junk payload".getBytes("US-ASCII")),
      (3L, tinyPng(16, 16)(rgb)),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("doc_id", "media")
    val small = Multimodal.dHashBatched(df, batchSize = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val big = Multimodal.dHashBatched(df, batchSize = 500).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small === big)
    assert(small.keySet === Set(1L, 3L))
    assert(small(1L) === small(3L), "same pixels, different codec, same hash")
  }
}
