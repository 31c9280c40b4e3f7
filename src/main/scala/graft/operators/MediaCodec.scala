package graft.operators

/** REAL pure-JVM media codecs — no native libraries anywhere:
  *
  *  - RIFF/WAVE PCM-16 audio and BMP 24-bit images are hand-written
  *    byte-level codecs (chunk walking, padding, bottom-up row order,
  *    channel interleave);
  *  - compressed images (PNG / JPEG / GIF) go through the JDK's own
  *    `javax.imageio` plugins, which are pure Java and ship in every
  *    JDK — the "container has no codecs" constraint never applied to
  *    images ([[imageDecode]] / [[pngEncode]] / [[jpegEncode]]).
  *
  * Compressed AUDIO/VIDEO (MP3, H.264, …) remains the one genuinely
  * unsupported family: the JDK has no decoder and the container no
  * native libs — [[Multimodal.decodeMedia]] surfaces those mimes as
  * null-stats rows rather than guessing.
  *
  * All decoders fail LOUDLY on malformed input (wrong magic,
  * truncated chunks, unsupported bpp/compression, undecodable
  * stream) — a corrupt payload must surface, not decode to garbage
  * features.
  */
object MediaCodec {

  /** Image-decode call counter (test instrumentation): local-mode specs
    * assert a fused resize->stats pipeline decodes each payload ONCE.
    * LongAdder so concurrent executor threads never contend. */
  private[graft] val imageDecodes = new java.util.concurrent.atomic.LongAdder

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def wle16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def wle32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** RIFF/WAVE writer: PCM 16-bit LE, `samples` channel-interleaved. */
  def wavEncode(samples: Array[Short], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels >= 1, "channels must be >= 1")
    require(samples.length % channels == 0,
      "sample count must be a channel multiple")
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); wle32(out, 36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); wle32(out, 16)
    wle16(out, 1) // PCM
    wle16(out, channels)
    wle32(out, sampleRate)
    wle32(out, sampleRate * channels * 2) // byte rate
    wle16(out, channels * 2) // block align
    wle16(out, 16) // bits/sample
    out.write("data".getBytes("US-ASCII")); wle32(out, dataLen)
    samples.foreach(s => wle16(out, s & 0xffff))
    out.toByteArray
  }

  /** RIFF/WAVE reader: walks the chunk list (tolerates extra chunks
    * like LIST/INFO), returns (sampleRate, channels, interleaved
    * samples). PCM-16 only — anything else throws. */
  def wavDecode(b: Array[Byte]): (Int, Int, Array[Short]) = {
    require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
      "not a RIFF/WAVE payload")
    var rate = -1; var channels = -1; var bits = -1
    var data: Array[Short] = null
    var o = 12
    while (o + 8 <= b.length) {
      val id = tag(b, o); val len = le32(b, o + 4)
      require(len >= 0 && o + 8 + len <= b.length,
        s"truncated '$id' chunk (len $len at offset $o)")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          val fmt = le16(b, o + 8)
          require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
          channels = le16(b, o + 10)
          rate = le32(b, o + 12)
          bits = le16(b, o + 22)
          require(bits == 16, s"unsupported bit depth $bits (16 only)")
        case "data" =>
          require(len % 2 == 0, "odd PCM-16 data length")
          data = new Array[Short](len / 2)
          var i = 0
          while (i < data.length) {
            data(i) = le16(b, o + 8 + i * 2).toShort; i += 1
          }
        case _ => () // skip unknown chunk
      }
      o += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(rate > 0 && channels > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    require(data.length % channels == 0, "data not a channel multiple")
    (rate, channels, data)
  }

  /** BMP writer: 24-bit uncompressed, BITMAPINFOHEADER; input is RGB
    * triplets row-major TOP-DOWN; rows are stored bottom-up with 4-byte
    * padding and BGR order per the format. */
  def bmpEncode(width: Int, height: Int,
      rgbTopDown: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    require(rgbTopDown.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${rgbTopDown.length}")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataLen = (rowBytes + pad) * height
    val out = new java.io.ByteArrayOutputStream(54 + dataLen)
    out.write('B'); out.write('M')
    wle32(out, 54 + dataLen); wle32(out, 0); wle32(out, 54)
    wle32(out, 40); wle32(out, width); wle32(out, height)
    wle16(out, 1); wle16(out, 24); wle32(out, 0); wle32(out, dataLen)
    wle32(out, 2835); wle32(out, 2835); wle32(out, 0); wle32(out, 0)
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        out.write(rgbTopDown(p + 2)) // B
        out.write(rgbTopDown(p + 1)) // G
        out.write(rgbTopDown(p)) // R
        x += 1
      }
      var k = 0
      while (k < pad) { out.write(0); k += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** BMP reader: returns (width, height, RGB triplets row-major
    * top-down). 24-bit uncompressed only; bottom-up or top-down
    * (negative height) row order both handled. */
  def bmpDecode(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    imageDecodes.increment()
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP payload")
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    require(bpp == 24, s"unsupported bpp $bpp (24 only)")
    require(compression == 0, s"unsupported compression $compression")
    require(width > 0 && height > 0, "bad dimensions")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    require(dataOff + stride.toLong * height <= b.length, "truncated pixel data")
    val rgb = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val srcRow = if (bottomUp) height - 1 - row else row
      val src = dataOff + srcRow * stride
      var x = 0
      while (x < width) {
        val d = (row * width + x) * 3
        rgb(d) = b(src + x * 3 + 2) // R
        rgb(d + 1) = b(src + x * 3 + 1) // G
        rgb(d + 2) = b(src + x * 3) // B
        x += 1
      }
      row += 1
    }
    (width, height, rgb)
  }

  /** PNG writer via the JDK's pure-Java ImageIO plugin: 24-bit RGB,
    * input row-major top-down triplets. PNG is lossless, so
    * encode → [[imageDecode]] round-trips every pixel bit-exact. */
  def pngEncode(width: Int, height: Int,
      rgbTopDown: Array[Byte]): Array[Byte] =
    imageEncode(width, height, rgbTopDown, "png")

  /** JPEG writer via the JDK's pure-Java ImageIO plugin. LOSSY — use
    * for exercising the decode path, never for exact round-trips. */
  def jpegEncode(width: Int, height: Int,
      rgbTopDown: Array[Byte]): Array[Byte] =
    imageEncode(width, height, rgbTopDown, "jpg")

  /** GIF writer via the JDK's ImageIO plugin (palette format — exact
    * only for images with ≤256 distinct colors). */
  def gifEncode(width: Int, height: Int,
      rgbTopDown: Array[Byte]): Array[Byte] =
    imageEncode(width, height, rgbTopDown, "gif")

  private def imageEncode(width: Int, height: Int, rgbTopDown: Array[Byte],
      fmt: String): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    require(rgbTopDown.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${rgbTopDown.length}")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        img.setRGB(x, y, ((rgbTopDown(p) & 0xff) << 16) |
          ((rgbTopDown(p + 1) & 0xff) << 8) | (rgbTopDown(p + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    // never spill through ImageIO's tmp-file cache on executors
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, fmt, out),
      s"no JDK ImageIO writer for format '$fmt'")
    out.toByteArray
  }

  /** Compressed-image reader via JDK ImageIO (PNG / JPEG / GIF / and
    * whatever other pure-Java plugins the JDK registers): returns
    * (width, height, RGB triplets row-major top-down), converting any
    * source color model (palette, grayscale, CMYK-decoded) to sRGB.
    * Undecodable bytes throw — ImageIO returning null is a loud
    * failure here, not a null row. */
  def imageDecode(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    imageDecodes.increment()
    require(b != null && b.length > 0, "empty image payload")
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "not a decodable image payload (PNG/JPEG/GIF)")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      rgb(i * 3) = ((px(i) >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((px(i) >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (px(i) & 0xff).toByte
      i += 1
    }
    (w, h, rgb)
  }
}
