package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the media container formats a JVM can
  * parse without native libraries — PCM WAV (RIFF), uncompressed
  * 24-bit BMP, and 8-bit truecolor PNG (whose only compression is
  * DEFLATE, which `java.util.zip` ships). No third-party libraries: a
  * `ByteBuffer`, `Deflater`/`Inflater` and the published layouts are
  * enough. Baseline JPEG — the dominant real-world image format —
  * lives in its own module ([[JpegCodec]]: hand-rolled Huffman, 8×8
  * DCT, 4:2:0 chroma), and the ISO-BMFF (MP4) CONTAINER in
  * [[Mp4Codec]] (box walk + sample-table resolution — an MJPEG track
  * feeds the existing frame pipelines from real files); the remaining
  * stub surface is the compressed audio/video BITSTREAM codecs
  * (MP3/AAC audio, H.26x video — SIMD-hungry entropy formats a
  * production deployment binds to native decoders behind the same
  * sample-extraction seam) plus fragmented MP4 (`moof`, refused
  * loudly) and progressive JPEG (SOF2, refused loudly).
  *
  * All codecs are deterministic byte-for-byte, so
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
      // declared sizes are UNTRUSTED (same hardening as the BMP/PNG
      // dim guards): a negative size would walk the cursor backwards
      // (infinite loop) or throw NegativeArraySizeException, and a
      // size past the payload would allocate gigabytes from a 50-byte
      // file before any read failed — refuse loudly up front instead
      require(size >= 0 && size <= buf.remaining(),
        s"chunk '$id' declares $size bytes but ${buf.remaining()} remain")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short ($size bytes)")
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
    // same untrusted-dims hardening as PngCodec.decode: BMP is
    // uncompressed, so declared dims are a lie unless the payload
    // actually holds height x stride bytes past the data offset — check
    // in LONG arithmetic before allocating width*height ints (the int
    // product overflows near 2^31 and a huge declaration would OOM).
    require(width > 0 && height > 0, s"bad BMP dims ${width}x$heightRaw")
    val strideL = (width.toLong * 3 + 3) & ~3L
    // bound via DIVISION, not the product: strideL*height itself wraps
    // Long for dims near 2^31 (the first version of this guard had
    // exactly that hole — the check must not overflow before it checks)
    // the offset must also clear the file + DIB headers: an offset
    // pointing INSIDE them would silently decode header bytes as
    // pixels instead of refusing loudly
    require(dataOffset >= 14L + headerSize && dataOffset < bytes.length &&
      height <= (bytes.length - dataOffset) / strideL,
      s"BMP declares ${width}x$height but holds only ${bytes.length} " +
        s"bytes past offset $dataOffset (headers end at ${14L + headerSize})")
    require(width.toLong * height <= Int.MaxValue, // no Long overflow: <= 2^62
      s"BMP pixel count ${width}x$height overflows")
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

/** 8-bit truecolor PNG (ISO/IEC 15948): the critical-chunk subset —
  * IHDR / IDAT / IEND, zlib-DEFLATE pixel stream, all five scanline
  * filter types (None, Sub, Up, Average, Paeth). `java.util.zip`
  * provides the one non-trivial piece (DEFLATE), so the codec is
  * pure-JVM like its WAV/BMP siblings. Ancillary chunks are skipped on
  * decode, multiple IDATs concatenate (the spec requires treating them
  * as one stream), and everything outside 8-bit color-type-2
  * non-interlaced refuses loudly rather than misreading.
  */
object PngCodec {

  /** Decoded PNG: pixels packed `0xRRGGBB`, row-major top-down (PNG's
    * own row order — no BMP-style flip).
    */
  final case class Png(width: Int, height: Int, pixels: Array[Int]) {
    def rgb(x: Int, y: Int): Int = pixels(y * width + x)
  }

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private val Bpp = 3 // bytes per pixel: 8-bit RGB

  /** Paeth predictor (spec §9.4): closest of left/up/up-left to
    * `a + b - c`, ties resolved left → up → up-left.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      .putInt(data.length).array()
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      .putInt(crc.getValue.toInt).array())
  }

  /** Encode 8-bit truecolor, one IDAT, non-interlaced. `filterForRow`
    * picks each scanline's filter type (0–4) — any choice is valid PNG
    * (filters are a per-row encoder freedom), so a round-trip generated
    * with VARYING filters proves the decoder's whole de-filter matrix,
    * not just the trivial None path.
    */
  def encodeRgb8(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int),
      filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = width * Bpp
    val raw = new Array[Byte](height * (1 + stride))
    val cur = new Array[Int](stride)   // this row's unfiltered bytes
    val prior = new Array[Int](stride) // previous row's unfiltered bytes
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        cur(x * Bpp) = r & 0xff; cur(x * Bpp + 1) = g & 0xff
        cur(x * Bpp + 2) = b & 0xff
        x += 1
      }
      val f = filterForRow(y)
      require(f >= 0 && f <= 4, s"bad filter type $f for row $y")
      val rowOff = y * (1 + stride)
      raw(rowOff) = f.toByte
      var i = 0
      while (i < stride) {
        val left = if (i >= Bpp) cur(i - Bpp) else 0
        val up = if (y > 0) prior(i) else 0
        val upLeft = if (y > 0 && i >= Bpp) prior(i - Bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(rowOff + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished())
      zipped.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zipped.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Png = {
    require(bytes.length > 8 && Signature.indices.forall(i =>
      bytes(i) == Signature(i)), "not a PNG")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    buf.position(8)
    var width = -1; var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && buf.remaining() >= 12) {
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining() - 8,
        s"corrupt chunk length $len")
      val t = new Array[Byte](4); buf.get(t)
      val typ = new String(t, "US-ASCII")
      typ match {
        case "IHDR" =>
          require(len == 13, s"bad IHDR length $len")
          width = buf.getInt; height = buf.getInt
          val depth = buf.get(); val color = buf.get()
          val comp = buf.get(); val filt = buf.get(); val ilace = buf.get()
          require(depth == 8, s"only 8-bit PNG supported (depth=$depth)")
          require(color == 2,
            s"only truecolor (type 2) PNG supported (type=$color)")
          require(comp == 0 && filt == 0, "nonstandard compression/filter")
          require(ilace == 0, "interlaced PNG not supported")
        case "IDAT" =>
          require(width > 0, "IDAT before IHDR")
          val d = new Array[Byte](len); buf.get(d); idat.write(d)
        case "IEND" => sawEnd = true
        case _ => buf.position(buf.position() + len) // ancillary: skip
      }
      if (!sawEnd) buf.getInt // CRC (trusting transport integrity)
    }
    require(sawEnd, "no IEND chunk")
    require(width > 0 && height > 0, "no IHDR chunk")
    // dims come from untrusted bytes: validate with LONG arithmetic
    // BEFORE any allocation. Width near 2^30 overflows the int stride
    // math, and a tiny file declaring huge dims must not force a
    // multi-GB raw buffer — DEFLATE expands at most 1032x (zlib's
    // documented bound), so a declared raw size beyond idat·1032 is a
    // lie the inflate loop would otherwise discover only after the OOM.
    // bound stride first, then height via DIVISION: the raw-length
    // product itself wraps Long for dims near 2^31 (the first version
    // of this guard had exactly that hole)
    val strideL = width.toLong * Bpp // <= 3*2^31: no overflow
    require(strideL <= Int.MaxValue - 1,
      s"IHDR width $width: scanline stride overflows")
    require(height <= Int.MaxValue / (1L + strideL),
      s"IHDR declares ${width}x$height: raw size overflows")
    val rawLenL = height * (1L + strideL) // safe: <= Int.MaxValue now
    require(rawLenL <= idat.size.toLong * 1032L,
      s"IHDR declares $rawLenL raw bytes but IDAT holds only " +
        s"${idat.size} — beyond DEFLATE's 1032x max expansion")
    val stride = width * Bpp
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(),
        "truncated or corrupt IDAT stream")
      off += n
    }
    // surplus guard: a stream carrying MORE pixel data than IHDR
    // declares must refuse, not silently serve the declared prefix —
    // one probe inflate decides (a valid stream yields 0 bytes and
    // reports finished once its trailer is consumed)
    val probe = new Array[Byte](1)
    val extra = if (inflater.finished()) 0 else inflater.inflate(probe)
    require(extra == 0 && inflater.finished(),
      if (extra > 0) "IDAT stream carries more pixel data than IHDR declares"
      else "truncated IDAT stream (no end-of-stream trailer)")
    // ...and compressed junk AFTER the zlib trailer must refuse too —
    // finished() only says the stream ended, not that IDAT did
    require(inflater.getRemaining == 0,
      s"${inflater.getRemaining} trailing bytes after the zlib stream " +
        "inside IDAT")
    inflater.end()
    require(off == raw.length,
      s"IDAT inflated to $off bytes, expected ${raw.length}")
    val px = new Array[Int](width * height)
    val cur = new Array[Int](stride)
    val prior = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride)
      val f = raw(rowOff) & 0xff
      require(f <= 4, s"bad filter type $f in row $y")
      var i = 0
      while (i < stride) {
        val left = if (i >= Bpp) cur(i - Bpp) else 0
        val up = if (y > 0) prior(i) else 0
        val upLeft = if (y > 0 && i >= Bpp) prior(i - Bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        cur(i) = ((raw(rowOff + 1 + i) & 0xff) + pred) & 0xff
        i += 1
      }
      var x = 0
      while (x < width) {
        px(y * width + x) =
          (cur(x * Bpp) << 16) | (cur(x * Bpp + 1) << 8) | cur(x * Bpp + 2)
        x += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    Png(width, height, px)
  }

  /** Nearest-neighbor resample, mirroring [[BmpCodec.resizeNearest]]. */
  def resizeNearest(img: Png, width: Int, height: Int): Png = {
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
    Png(width, height, px)
  }
}
