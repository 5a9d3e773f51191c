package graft.operators

import graft.SparkSpec

class AudioSpec extends SparkSpec {

  private def le16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)

  /** hand-rolled WAV with arbitrary chunk layout for codec tests. */
  private def wav(
      chunks: Seq[(String, Seq[Byte])]): Array[Byte] = {
    val body = chunks.flatMap { case (tag, data) =>
      tag.getBytes("US-ASCII").toSeq ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Seq(0.toByte) else Nil)
    }
    ("RIFF".getBytes("US-ASCII").toSeq ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII").toSeq ++ body).toArray
  }

  private def fmtChunk(channels: Int, rate: Int, bits: Int): (String, Seq[Byte]) =
    ("fmt ", le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate * channels * bits / 8) ++ le16(channels * bits / 8) ++ le16(bits))

  test("8-bit mono header helper round-trips through the decoder") {
    val data = Array.tabulate(256)(i => (i % 251).toByte)
    val bytes = Audio.monoPcm8Header(256) ++ data
    val w = Audio.decodeWav(bytes).get
    assert((w.sampleRate, w.channels, w.bits) === ((8000, 1, 8)))
    assert(w.samples.toSeq === data.map(b => (b & 0xff) - 128).toSeq)
  }

  test("16-bit stereo parses signed little-endian interleaved samples") {
    val samples = Seq(1000, -1000, 32767, -32768, 0, 7, -7, 300)
    val bytes = wav(Seq(
      fmtChunk(channels = 2, rate = 44100, bits = 16),
      ("data", samples.flatMap(le16))))
    val w = Audio.decodeWav(bytes).get
    assert((w.sampleRate, w.channels, w.bits) === ((44100, 2, 16)))
    assert(w.samples.toSeq === samples)
  }

  test("unknown chunks (LIST, odd-sized with pad byte) are skipped") {
    val bytes = wav(Seq(
      ("LIST", Seq[Byte](1, 2, 3)), // odd size -> padded
      fmtChunk(channels = 1, rate = 8000, bits = 8),
      ("junk", Seq[Byte](9, 9)),
      ("data", Seq[Byte](0, 64, -128, -1))))
    val w = Audio.decodeWav(bytes).get
    assert(w.samples.toSeq === Seq(-128, -64, 0, 127))
  }

  test("malformed payloads decode to None") {
    assert(Audio.decodeWav("this is not audio".getBytes("US-ASCII")) === None)
    // data before fmt
    assert(Audio.decodeWav(wav(Seq(("data", Seq[Byte](1, 2))))) === None)
    // non-PCM format tag
    val floatFmt = ("fmt ", le16(3) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8))
    assert(Audio.decodeWav(wav(Seq(floatFmt, ("data", Seq[Byte](1, 2))))) === None)
    // chunk size overruns the payload
    val bytes = Audio.monoPcm8Header(256) ++ Array.fill(20)(1.toByte)
    assert(Audio.decodeWav(bytes) === None)
  }

  test("windowed features match a hand computation, crossings included") {
    // 16-bit mono alternating +/-: every adjacent pair crosses zero
    val samples = Seq.tabulate(10)(i => if (i % 2 == 0) 100 else -50)
    val bytes = wav(Seq(
      fmtChunk(channels = 1, rate = 8000, bits = 16),
      ("data", samples.flatMap(le16))))
    val s = spark
    import s.implicits._
    val out = Audio.windowFeatures(
      Seq((1L, bytes)).toDF("doc_id", "media"), windowSize = 4)
      .collect().map(r => (r.getInt(1), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // windows: [100,-50,100,-50] [100,-50,100,-50] [100,-50]
    val e4 = 2 * (100L * 100 + 50L * 50)
    assert(out === Map(
      0 -> ((4L, e4, 3L, 100L)),
      1 -> ((4L, e4, 3L, 100L)),
      2 -> ((2L, 100L * 100 + 50L * 50, 1L, 100L))))
  }

  test("stereo mixdown is the exact per-frame channel sum") {
    // frames: (10,20) (-5,5) (0,-7) -> mixed 30, 0, -7
    val inter = Seq(10, 20, -5, 5, 0, -7)
    val bytes = wav(Seq(
      fmtChunk(channels = 2, rate = 8000, bits = 16),
      ("data", inter.flatMap(le16))))
    val s = spark
    import s.implicits._
    val out = Audio.windowFeatures(
      Seq((1L, bytes)).toDF("doc_id", "media"), windowSize = 8)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    // energy 900+0+49; zero sample breaks the sign run -> zcr 0
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((3L, 949L, 0L, 30L)))
  }

  test("non-audio rows are dropped by the batched path") {
    val s = spark
    import s.implicits._
    val good = Audio.monoPcm8Header(4) ++ Array[Byte](0, 1, 2, 3)
    val df = Seq(
      (1L, good),
      (2L, "definitely text".getBytes("US-ASCII")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "media")
    val out = Audio.windowFeatures(df, windowSize = 4).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }
}
