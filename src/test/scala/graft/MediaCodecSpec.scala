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

  test("PNG round-trips bit-exact through JDK ImageIO") {
    // distinct-pixel 3x2 including byte-sign-edge values
    val rgb = Array[Byte](
      0, 127, -1, 10, 20, 30, -128, 5, 77,
      200.toByte, 100, 50, 1, 2, 3, 255.toByte, 254.toByte, 253.toByte)
    val bytes = MediaCodec.pngEncode(3, 2, rgb)
    assert(bytes.length > 8 &&
      (bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte)) // PNG magic
    val (w, h, decoded) = MediaCodec.imageDecode(bytes)
    assert(w == 3 && h == 2)
    assert(decoded.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException](
      MediaCodec.imageDecode(Array.fill[Byte](64)(9)))
  }

  test("GIF solid color round-trips exactly (palette format)") {
    val rgb = Array.fill(4 * 3)(Seq[Byte](33, 66, 99)).flatten.toArray
    val (w, h, decoded) = MediaCodec.imageDecode(
      MediaCodec.gifEncode(4, 3, rgb))
    assert(w == 4 && h == 3 && decoded.toSeq == rgb.toSeq)
  }

  test("JPEG decode: dims exact, solid-color channel means within the in-plan bound") {
    // sweep the exact color family doc_media_decode synthesizes; the
    // query's gate is |decoded_mean - expected| <= 8.0 per channel —
    // assert the true worst case stays under it with margin
    var worst = 0.0
    for (id <- 0L until 256L) {
      val (r, g, b) = ((id * 3) % 256, (id * 5) % 256, (id * 7) % 256)
      val w = (id % 4 + 2).toInt
      val h = (id % 3 + 2).toInt
      val rgb = Array.tabulate(w * h * 3)(i => (i % 3 match {
        case 0 => r
        case 1 => g
        case _ => b
      }).toByte)
      val (dw, dh, dec) = MediaCodec.imageDecode(
        MediaCodec.jpegEncode(w, h, rgb))
      assert(dw == w && dh == h)
      for (c <- 0 until 3) {
        val mean = dec.indices.filter(_ % 3 == c)
          .map(i => (dec(i) & 0xff).toDouble).sum / (w * h)
        val exp = Seq(r, g, b)(c).toDouble
        worst = math.max(worst, math.abs(mean - exp))
      }
    }
    assert(worst <= 6.0, s"worst JPEG solid-color mean error $worst")
  }

  test("decodeMedia computes exact audio and image stats; unknown mime yields nulls") {
    // square wave +A/-A: rms = peak = A/32768, zcr = 1 (every step flips)
    val a: Short = 8192
    val wav = MediaCodec.wavEncode(
      Array.tabulate(32)(i => if (i % 2 == 0) a else (-a).toShort), 16000, 1)
    val bmp = MediaCodec.bmpEncode(2, 1,
      Array[Byte](100, 0, 0, 50, 0, 0)) // R 100 and 50, G = B = 0
    val png = MediaCodec.pngEncode(2, 2,
      Array[Byte](8, 16, 24, 8, 16, 24, 8, 16, 24, 8, 16, 24))
    val media = Seq(
      (1L, wav, "audio/wav"),
      (2L, bmp, "image/bmp"),
      (3L, Array[Byte](1, 2, 3), "video/mp4"),
      (4L, png, "image/png"))
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
    val pngRow = got(3)
    assert(pngRow.getAs[Int]("width") == 2 &&
      pngRow.getAs[Int]("height") == 2)
    assert(pngRow.getAs[Double]("mean_r") == 8.0 &&
      pngRow.getAs[Double]("mean_g") == 16.0 &&
      pngRow.getAs[Double]("mean_b") == 24.0)
  }

  test("resizeImages: nearest-neighbor mapping, identity round trip, passthrough") {
    // 4x2 gradient: r = x*10, g = y*100, b = 5
    val rgb = Array.tabulate(4 * 2 * 3) { i =>
      val px = i / 3
      (i % 3 match {
        case 0 => (px % 4) * 10
        case 1 => (px / 4) * 100
        case _ => 5
      }).toByte
    }
    val src = Seq(
      (1L, MediaCodec.bmpEncode(4, 2, rgb), "image/bmp"),
      (2L, MediaCodec.pngEncode(4, 2, rgb), "image/png"),
      (3L, Array[Byte](1, 2), "application/zstd"))
      .toDF("media_id", "payload", "mime")
    val out = Multimodal.resizeImages(src, 2, 2)
      .collect().sortBy(_.getLong(0))
    // downscale picks source columns {0, 2} and rows {0, 1}
    val (w1, h1, p1) = MediaCodec.bmpDecode(out(0).getAs[Array[Byte]]("payload"))
    assert(w1 == 2 && h1 == 2)
    assert(p1.map(_ & 0xff).toSeq == Seq(0, 0, 5, 20, 0, 5, 0, 100, 5, 20, 100, 5))
    // PNG input resamples to the same pixels (lossless decode)
    val (_, _, p2) = MediaCodec.bmpDecode(out(1).getAs[Array[Byte]]("payload"))
    assert(p2.toSeq == p1.toSeq)
    assert(out(0).getAs[String]("mime") == "image/bmp" &&
      out(1).getAs[Boolean]("resized"))
    // non-image rows pass through byte-identical
    assert(!out(2).getAs[Boolean]("resized") &&
      out(2).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2))
    // identity resize round-trips every pixel
    val same = Multimodal.resizeImages(src.filter($"media_id" === 1), 4, 2)
      .collect().head
    val (_, _, p3) = MediaCodec.bmpDecode(same.getAs[Array[Byte]]("payload"))
    assert(p3.toSeq == rgb.toSeq)
  }

  test("fused resize->stats decodes each payload once and matches the re-decode pipeline") {
    val rgb = Array.tabulate(4 * 3 * 3)(i => ((i * 7) % 256).toByte)
    val src = Seq(
      (1L, MediaCodec.bmpEncode(4, 3, rgb), "image/bmp"),
      (2L, MediaCodec.pngEncode(4, 3, rgb), "image/png"),
      (3L, MediaCodec.wavEncode(Array[Short](100, -100, 50), 8000, 1),
        "audio/wav"))
      .toDF("media_id", "payload", "mime")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("media_id", "mime", "n_bytes", "width", "height",
        "mean_r", "mean_g", "mean_b", "duration_s", "rms")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toInt).toSeq
    // row-identity: fused pipeline == resize-then-re-decode pipeline
    val fused = rows(Multimodal.statsFromDecoded(
      Multimodal.resizeImagesDecoded(src, 2, 2)))
    val redecoded = rows(Multimodal.decodeMedia(
      Multimodal.resizeImages(src, 2, 2)))
    assert(fused == redecoded, s"$fused vs $redecoded")
    // decode economy: the fused pipeline decodes each image payload
    // exactly once (2 images); the re-decode pipeline pays twice
    def decodesDuring(body: => Unit): Long = {
      val before = MediaCodec.imageDecodes.sum()
      body
      MediaCodec.imageDecodes.sum() - before
    }
    val nFused = decodesDuring {
      Multimodal.statsFromDecoded(
        Multimodal.resizeImagesDecoded(src, 2, 2)).collect()
    }
    val nRedecode = decodesDuring {
      Multimodal.decodeMedia(Multimodal.resizeImages(src, 2, 2)).collect()
    }
    assert(nFused == 2, s"fused pipeline decoded $nFused times, want 2")
    assert(nRedecode == 4, s"re-decode pipeline decoded $nRedecode, want 4")
  }
}
