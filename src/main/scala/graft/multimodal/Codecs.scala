package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the two media container formats that are
  * fully specified as plain headers + raw samples — PCM WAV (RIFF) and
  * uncompressed 24-bit BMP. No native or third-party libraries: a
  * `ByteBuffer` and the published layouts are enough, which is exactly
  * why these two are the honest place to make the multimodal seam REAL
  * (compressed/container formats — JPEG, MP3, MP4 — stay stubbed; no
  * sane pipeline hand-rolls an entropy decoder).
  *
  * Both codecs are deterministic byte-for-byte, so
  * `decode(encode(x)) == x` is testable and the oracle can derive
  * expected features of generated media in closed form.
  */
object WavCodec {

  /** Decoded PCM WAV: mono/stereo interleaved 16-bit samples. */
  final case class Wav(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Short])

  /** Canonical 44-byte-header PCM WAV: RIFF → fmt (PCM, mono, 16-bit)
    * → data, little-endian throughout (the format's own byte order).
    */
  def encodePcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate=$sampleRate must be > 0")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Chunk-walking RIFF parse: tolerates extra chunks (LIST, fact, …)
    * between fmt and data — real-world WAVs carry them — and refuses
    * loudly on anything that is not 16-bit PCM.
    */
  def decode(bytes: Array[Byte]): Wav = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt // riff size (trusted length is the array's)
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag(); val size = buf.getInt
      id match {
        case "fmt " =>
          val fmtEnd = buf.position() + size
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not PCM (format=$audioFormat)")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort
          require(bits == 16, s"only 16-bit PCM supported (got $bits)")
          buf.position(fmtEnd)
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(samples != null, "no data chunk")
    Wav(sampleRate, channels, bits, samples)
  }
}

object BmpCodec {

  /** Decoded 24-bit BMP: pixels packed `0xRRGGBB`, row-major TOP-DOWN
    * (the decoder un-reverses BMP's bottom-up storage).
    */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int]) {
    def rgb(x: Int, y: Int): Int = pixels(y * width + x)
  }

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER): bottom-up rows, BGR
    * byte order, rows padded to 4 bytes — the format's exact layout.
    * `rgb(x, y)` supplies the top-down pixel as (r, g, b) in 0..255.
    */
  def encode24(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = rowStride(width)
    val dataLen = stride * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  def decode(bytes: Array[Byte]): Bmp = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
    buf.getInt; buf.getInt
    val dataOffset = buf.getInt
    val headerSize = buf.getInt
    require(headerSize >= 40, s"unsupported DIB header ($headerSize)")
    val width = buf.getInt
    val heightRaw = buf.getInt
    buf.getShort // planes
    val bpp = buf.getShort
    require(bpp == 24, s"only 24-bit BMP supported (got $bpp)")
    val compression = buf.getInt
    require(compression == 0, s"only uncompressed BMP supported")
    val bottomUp = heightRaw > 0
    val height = math.abs(heightRaw)
    val stride = rowStride(width)
    val px = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val srcY = if (bottomUp) height - 1 - row else row
      var x = 0
      var p = dataOffset + srcY * stride
      while (x < width) {
        val b = bytes(p) & 0xff
        val g = bytes(p + 1) & 0xff
        val r = bytes(p + 2) & 0xff
        px(row * width + x) = (r << 16) | (g << 8) | b
        x += 1; p += 3
      }
      row += 1
    }
    Bmp(width, height, px)
  }

  /** Nearest-neighbor resample — the real resize the seam's stub only
    * pretended to do. Deterministic: source index = floor(i·src/dst).
    */
  def resizeNearest(img: Bmp, width: Int, height: Int): Bmp = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val sy = (y.toLong * img.height / height).toInt
      var x = 0
      while (x < width) {
        val sx = (x.toLong * img.width / width).toInt
        px(y * width + x) = img.rgb(sx, sy)
        x += 1
      }
      y += 1
    }
    Bmp(width, height, px)
  }
}
