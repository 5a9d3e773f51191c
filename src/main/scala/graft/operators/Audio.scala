package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio-modality plumbing: a REAL pure-JVM WAV (RIFF/PCM) codec plus
  * windowed DSP features, in the same micro-batched mapPartitions shape
  * as [[Multimodal.decodeFeatures]] — payload bytes decode inside their
  * partition and never shuffle; only the O(windows) feature rows leave
  * the executor.
  *
  * The codec is strict: `RIFF....WAVE` container, chunk walk with
  * word-alignment padding (unknown chunks like `LIST`/`INFO` are
  * skipped), a PCM `fmt ` chunk (integer PCM only — format tag 1),
  * 8-bit unsigned or 16-bit signed little-endian samples, any channel
  * count. A text payload can never half-parse: every structural
  * violation returns None.
  *
  * Features are EXACT INTEGER arithmetic — per-window sum of squared
  * centered samples (energy), strict sign-change count (zero-crossing
  * rate, the classic voiced/unvoiced discriminator), and peak
  * amplitude — so a DuckDB oracle replays them bit-identically, and
  * shuffle/merge order cannot perturb anything. Multi-channel audio is
  * mixed down by per-frame channel SUM (no division — stays integer;
  * scale-invariant for the sign/crossing features).
  */
object Audio {

  /** Decoded PCM payload: interleaved samples centered at 0
    * (8-bit unsigned is re-centered by −128; 16-bit is already signed).
    */
  final case class Wav(sampleRate: Int, channels: Int, bits: Int, samples: Array[Int])

  /** Strict RIFF/WAVE integer-PCM decode; None on anything malformed. */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i) & 0xffffL) | ((u16(i + 2) & 0xffffL) << 16)
    def tag(i: Int, t: String): Boolean =
      i + 4 <= bytes.length && t.indices.forall(j => bytes(i + j) == t.charAt(j))
    if (bytes.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    while (i + 8 <= bytes.length) {
      val size = u32(i + 4)
      val body = i + 8
      if (size < 0 || body + size > bytes.length) return None
      if (tag(i, "fmt ")) {
        if (size < 16) return None
        val audioFormat = u16(body)
        val channels = u16(body + 2)
        val rate = u32(body + 4)
        val bits = u16(body + 14)
        if (audioFormat != 1 || channels < 1 || rate <= 0 || rate > Int.MaxValue ||
          (bits != 8 && bits != 16)) return None
        fmt = Some((channels, rate.toInt, bits))
      } else if (tag(i, "data")) {
        val (channels, rate, bits) = fmt.getOrElse(return None)
        val bytesPerSample = bits / 8
        val n = (size / bytesPerSample).toInt
        val samples = new Array[Int](n)
        var s = 0
        while (s < n) {
          samples(s) =
            if (bits == 8) (bytes(body + s) & 0xff) - 128
            else u16(body + s * 2).toShort.toInt
          s += 1
        }
        return Some(Wav(rate, channels, bits, samples))
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i = body + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Output schema of [[windowFeatures]]. */
  val windowedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("win", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("zcr", LongType, nullable = false),
    StructField("peak", LongType, nullable = false)))

  /** (id, media) → one row per `windowSize`-frame window:
    * `(doc_id, win, n, energy, zcr, peak)` over the channel-summed
    * mixdown. The tail window may be partial (`n` says). Non-WAV and
    * null payloads are dropped — these features are only defined on
    * decoded PCM.
    */
  def windowFeatures(
      df: DataFrame,
      windowSize: Int = 64,
      idCol: String = "doc_id",
      binCol: String = "media",
      batchSize: Int = 64): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    val in = df.select(col(idCol).cast("long"), col(binCol))
    val enc = org.apache.spark.sql.Encoders.row(windowedSchema)
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap {
          case r if !r.isNullAt(1) =>
            decodeWav(r.getAs[Array[Byte]](1)).iterator.flatMap { wav =>
              val frames = wav.samples.length / wav.channels
              val mixed = new Array[Long](frames)
              var f = 0
              while (f < frames) {
                var c = 0
                var s = 0L
                while (c < wav.channels) { s += wav.samples(f * wav.channels + c); c += 1 }
                mixed(f) = s
                f += 1
              }
              (0 until (frames + windowSize - 1) / windowSize).iterator.map { w =>
                val from = w * windowSize
                val until = math.min(from + windowSize, frames)
                var energy = 0L
                var zcr = 0L
                var peak = 0L
                var j = from
                while (j < until) {
                  val v = mixed(j)
                  energy += v * v
                  if (v.abs > peak) peak = v.abs
                  if (j + 1 < until && v * mixed(j + 1) < 0) zcr += 1
                  j += 1
                }
                Row(r.getLong(0), w, (until - from).toLong, energy, zcr, peak)
              }
            }
          case _ => Iterator.empty
        }
      }
    }(enc)
  }

  /** A minimal valid 8-bit-mono PCM WAV header for `n` data bytes —
    * the literal prefix both the Spark query and the DuckDB oracle
    * prepend to cyclic text bytes when synthesizing test audio.
    */
  def monoPcm8Header(n: Int, sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate)
      .putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    bb.array()
  }
}
