package graft

import graft.operators.{MediaCodec, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("WAV PCM-16 stereo round-trips with channel interleave intact") {
    // stereo: left = ramp, right = negated ramp
    val samples = (0 until 16).flatMap(i =>
      Seq((i * 1000).toShort, (-i * 1000).toShort)).toArray
    val bytes = MediaCodec.wavEncode(samples, 44100, channels = 2)
    assert(bytes.length == 44 + samples.length * 2)
    val (rate, channels, decoded) = MediaCodec.wavDecode(bytes)
    assert(rate == 44100 && channels == 2)
    assert(decoded.toSeq == samples.toSeq)
  }

  test("WAV decoder skips unknown RIFF chunks and rejects malformed payloads") {
    val samples = Array[Short](100, -100, 32767, -32768)
    val base = MediaCodec.wavEncode(samples, 8000, 1)
    // splice a LIST chunk between fmt and data (offset 36 = data start)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // fix RIFF size
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    val (_, _, decoded) = MediaCodec.wavDecode(spliced)
    assert(decoded.toSeq == samples.toSeq)
    intercept[IllegalArgumentException](
      MediaCodec.wavDecode("not a wav at all .......................".getBytes))
    intercept[IllegalArgumentException](
      MediaCodec.wavDecode(base.take(50))) // truncated data chunk
  }

  test("BMP 24-bit round-trips with row padding and bottom-up order") {
    // 3x2 distinct pixels: padding = 3 bytes/row (3*3=9 -> stride 12)
    val rgb = Array[Byte](
      10, 20, 30, 40, 50, 60, 70, 80, 90, // row 0 (top)
      110, 120, -126, -106, -86, -66, -46, -26, -6) // row 1
    val bytes = MediaCodec.bmpEncode(3, 2, rgb)
    assert(bytes.length == 54 + 12 * 2)
    // bottom-up: the FIRST stored row must be the LAST logical row,
    // BGR order: byte 54 = B of pixel (1,0) = rgb[9+2]
    assert(bytes(54) == rgb(11) && bytes(55) == rgb(10) && bytes(56) == rgb(9))
    val (w, h, decoded) = MediaCodec.bmpDecode(bytes)
    assert(w == 3 && h == 2)
    assert(decoded.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException](
      MediaCodec.bmpDecode(Array.fill[Byte](60)(7)))
  }

  test("decodeMedia computes exact audio and image stats; unknown mime yields nulls") {
    // square wave +A/-A: rms = peak = A/32768, zcr = 1 (every step flips)
    val a: Short = 8192
    val wav = MediaCodec.wavEncode(
      Array.tabulate(32)(i => if (i % 2 == 0) a else (-a).toShort), 16000, 1)
    val bmp = MediaCodec.bmpEncode(2, 1,
      Array[Byte](100, 0, 0, 50, 0, 0)) // R 100 and 50, G = B = 0
    val media = Seq(
      (1L, wav, "audio/wav"),
      (2L, bmp, "image/bmp"),
      (3L, Array[Byte](1, 2, 3), "video/mp4"))
      .toDF("media_id", "payload", "mime")
    val got = Multimodal.decodeMedia(media).orderBy($"media_id").collect()
    val audio = got(0)
    assert(audio.getAs[Double]("duration_s") == 32.0 / 16000.0)
    assert(audio.getAs[Double]("rms") == a.toDouble / 32768.0)
    assert(audio.getAs[Double]("peak") == a.toDouble / 32768.0)
    assert(audio.getAs[Double]("zcr") == 1.0)
    val image = got(1)
    assert(image.getAs[Int]("width") == 2 && image.getAs[Int]("height") == 1)
    assert(image.getAs[Double]("mean_r") == 75.0)
    assert(image.getAs[Double]("mean_g") == 0.0)
    val other = got(2)
    assert(other.isNullAt(other.fieldIndex("rms")) &&
      other.isNullAt(other.fieldIndex("width")))
    assert(other.getAs[Int]("n_bytes") == 3)
  }
}
