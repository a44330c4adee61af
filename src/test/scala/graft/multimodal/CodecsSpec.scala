package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real pure-JVM codecs: exact round trips, format-layout hazards
  * (row padding, bottom-up order, chunk walking, endianness), real
  * nearest-neighbor resize.
  */
class CodecsSpec extends AnyFunSuite {

  test("WAV: encode→decode round-trips samples, rate and width exactly") {
    val samples = Array.tabulate(997)(i => ((i * 31 - 500) % 32000).toShort)
    val wav = WavCodec.decode(WavCodec.encodePcm16Mono(22050, samples))
    assert(wav.sampleRate === 22050)
    assert(wav.channels === 1)
    assert(wav.bitsPerSample === 16)
    assert(wav.samples.toSeq === samples.toSeq)
  }

  test("WAV: the chunk walk tolerates foreign chunks before data and " +
    "refuses non-PCM loudly") {
    val base = WavCodec.encodePcm16Mono(8000, Array[Short](1, -2, 3))
    // splice a LIST chunk (odd size → word-aligned skip) between fmt
    // and data, fixing up the RIFF size
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'x', 'y', 'z', 'w', 'v', 0)
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    assert(WavCodec.decode(spliced).samples.toSeq === Seq[Short](1, -2, 3))
    val nonPcm = base.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    val e = intercept[IllegalArgumentException](WavCodec.decode(nonPcm))
    assert(e.getMessage.contains("PCM"))
  }

  test("BMP: encode→decode round-trips pixels at padded AND unpadded " +
    "widths, top-down order restored from bottom-up storage") {
    for (w <- Seq(8, 9, 10, 11); h <- Seq(3, 5)) { // 9,10,11 need row pad
      val img = BmpCodec.decode(BmpCodec.encode24(w, h,
        (x, y) => (x * 20 % 256, y * 40 % 256, (x + y) % 256)))
      assert(img.width === w && img.height === h)
      for (x <- 0 until w; y <- 0 until h) {
        val p = img.rgb(x, y)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) ===
          ((x * 20 % 256, y * 40 % 256, (x + y) % 256)),
          s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("BMP: nearest-neighbor resize picks floor(i*src/dst) sources; " +
    "JvmMediaDecoder re-encodes a real resized BMP") {
    val src = BmpCodec.decode(BmpCodec.encode24(4, 4,
      (x, y) => (x * 60, y * 60, 0)))
    val up = BmpCodec.resizeNearest(src, 8, 8)
    assert(up.width === 8 && up.height === 8)
    assert(up.rgb(7, 7) === src.rgb(3, 3))
    assert(up.rgb(1, 0) === src.rgb(0, 0))
    val dec = new MediaOps.JvmMediaDecoder(8)
    val resizedBytes = dec.resize("image", "bmp",
      BmpCodec.encode24(4, 4, (x, y) => (x * 60, y * 60, 0)), 2, 2)
    val back = BmpCodec.decode(resizedBytes)
    assert(back.width === 2 && back.height === 2)
    assert(back.rgb(1, 1) === src.rgb(2, 2))
  }

  test("PNG: encode→decode round-trips pixels under EVERY filter type " +
    "(None/Sub/Up/Average/Paeth), single and cycling") {
    def rule(x: Int, y: Int) = (x * 17 % 256, (y * 29 + 3) % 256, (x * y) % 256)
    for (f <- 0 to 4; (w, h) <- Seq((9, 7), (1, 5), (16, 1))) {
      val img = PngCodec.decode(
        PngCodec.encodeRgb8(w, h, rule, filterForRow = _ => f))
      assert(img.width === w && img.height === h, s"filter $f dims")
      for (x <- 0 until w; y <- 0 until h) {
        val p = img.rgb(x, y)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === rule(x, y),
          s"pixel ($x,$y) of ${w}x$h under filter $f")
      }
    }
    // per-row cycling filters: each row reconstructs against the
    // PREVIOUS row's already-reconstructed bytes — the cross-row
    // dependency a per-filter loop can't catch
    val img = PngCodec.decode(
      PngCodec.encodeRgb8(11, 10, rule, filterForRow = y => y % 5))
    for (x <- 0 until 11; y <- 0 until 10) {
      val p = img.rgb(x, y)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === rule(x, y),
        s"pixel ($x,$y) under cycling filters")
    }
  }

  test("PNG: decoder skips ancillary chunks, concatenates split IDATs, " +
    "and refuses unsupported layouts loudly") {
    import java.nio.{ByteBuffer, ByteOrder}
    val base = PngCodec.encodeRgb8(4, 3, (x, y) => (x, y, x + y))
    // locate the single IDAT and split it into two consecutive IDATs,
    // inserting a tEXt ancillary chunk before them
    def be(i: Int) =
      ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(i).array()
    def mkChunk(typ: String, data: Array[Byte]) = {
      val crc = new java.util.zip.CRC32()
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      be(data.length) ++ t ++ data ++ be(crc.getValue.toInt)
    }
    val ihdrEnd = 8 + 4 + 4 + 13 + 4
    val idatLen = ByteBuffer.wrap(base, ihdrEnd, 4)
      .order(ByteOrder.BIG_ENDIAN).getInt
    val idatData = base.slice(ihdrEnd + 8, ihdrEnd + 8 + idatLen)
    val tail = base.drop(ihdrEnd + 8 + idatLen + 4) // IEND
    val (d1, d2) = idatData.splitAt(idatData.length / 2)
    val spliced = base.take(ihdrEnd) ++
      mkChunk("tEXt", "comment\u0000hi".getBytes("US-ASCII")) ++
      mkChunk("IDAT", d1) ++ mkChunk("IDAT", d2) ++ tail
    val img = PngCodec.decode(spliced)
    assert(img.width === 4 && img.height === 3)
    assert(img.rgb(3, 2) === ((3 << 16) | (2 << 8) | 5))
    // grayscale (color type 0) must refuse, not misread
    val gray = base.clone()
    gray(8 + 8 + 9) = 0 // color type byte inside IHDR
    val e = intercept[IllegalArgumentException](PngCodec.decode(gray))
    assert(e.getMessage.contains("truecolor"))
    val notPng = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    intercept[IllegalArgumentException](PngCodec.decode(notPng))
    // surplus data must refuse both ways: decompressed rows beyond
    // IHDR's declaration, and compressed junk after the zlib trailer
    val taller = PngCodec.encodeRgb8(4, 6, (x, y) => (x, y, x + y))
    val tallerIdatLen = ByteBuffer.wrap(taller, ihdrEnd, 4)
      .order(ByteOrder.BIG_ENDIAN).getInt
    val tallerData = taller.slice(ihdrEnd + 8, ihdrEnd + 8 + tallerIdatLen)
    val surplusRows = base.take(ihdrEnd) ++ // IHDR says 4x3
      mkChunk("IDAT", tallerData) ++ tail   // stream carries 4x6
    val e2 = intercept[IllegalArgumentException](PngCodec.decode(surplusRows))
    assert(e2.getMessage.contains("more pixel data"))
    val junkAfter = base.take(ihdrEnd) ++
      mkChunk("IDAT", idatData ++ Array[Byte](7, 7, 7, 7)) ++ tail
    val e3 = intercept[IllegalArgumentException](PngCodec.decode(junkAfter))
    assert(e3.getMessage.contains("trailing bytes"))
  }

  test("PNG: JvmMediaDecoder decodes real PNG features and resizes " +
    "via decode→resample→re-encode") {
    val dec = new MediaOps.JvmMediaDecoder(8)
    val g = dec.decode("image", "png",
      PngCodec.encodeRgb8(5, 4, (_, _) => (255, 0, 51),
        filterForRow = y => y % 5))
    assert(g(0) === 5f && g(1) === 4f)
    assert(math.abs(g(2) - 1f) < 1e-6 && g(3) === 0f &&
      math.abs(g(4) - 0.2f) < 1e-3)
    val resized = dec.resize("image", "png",
      PngCodec.encodeRgb8(4, 4, (x, y) => (x * 60, y * 60, 0)), 2, 2)
    val back = PngCodec.decode(resized)
    assert(back.width === 2 && back.height === 2)
    assert(back.rgb(1, 1) === ((2 * 60) << 16 | (2 * 60) << 8))
  }

  test("JPEG: JvmMediaDecoder decodes real baseline-JFIF features and " +
    "resizes via decode→resample→re-encode (the lossy path)") {
    val dec = new MediaOps.JvmMediaDecoder(8)
    // constant gray 100: decodes exactly by the DC closed form
    val g = dec.decode("image", "jpeg",
      JpegCodec.encode420(16, 16, (_, _) => (100, 100, 100)))
    assert(g(0) === 16f && g(1) === 16f)
    val expect = math.min(255, 2 * ((100 + 1) / 2)) / 255f
    assert(math.abs(g(2) - expect) < 1e-6 && math.abs(g(3) - expect) < 1e-6
      && math.abs(g(4) - expect) < 1e-6)
    val resized = dec.resize("image", "jpeg",
      JpegCodec.encode420(32, 32, (_, _) => (200, 200, 200)), 16, 16)
    val back = JpegCodec.decode(resized)
    assert(back.width === 16 && back.height === 16)
    // two lossy round trips: 200 is even and dec() is idempotent on
    // even values, so the constant survives both hops exactly
    assert(back.pixels.forall(p => (p & 0xFF) === 200))
  }

  test("adversarial declared dims refuse BEFORE allocating: a tiny " +
    "payload claiming huge or overflowing dims must not OOM") {
    import java.nio.{ByteBuffer, ByteOrder}
    // PNG: IHDR width at offset 16, height at 20 (big-endian); CRCs
    // are not verified (transport integrity), so patching is enough
    val png = PngCodec.encodeRgb8(4, 3, (x, y) => (x, y, x + y))
    def patchPng(w: Int, h: Int): Array[Byte] = {
      val p = png.clone()
      ByteBuffer.wrap(p, 16, 8).order(ByteOrder.BIG_ENDIAN).putInt(w).putInt(h)
      p
    }
    // (1) int-overflow class: width near 2^30 overflows stride math
    val e1 = intercept[IllegalArgumentException](
      PngCodec.decode(patchPng(1 << 30, 1 << 20)))
    assert(e1.getMessage.contains("overflows"))
    // (2) OOM class: dims whose raw size fits an Int but exceeds any
    // possible inflate of the tiny IDAT (DEFLATE max expansion 1032x)
    val e2 = intercept[IllegalArgumentException](
      PngCodec.decode(patchPng(20000, 20000)))
    assert(e2.getMessage.contains("1032x"))
    // BMP: width at offset 18, height at 22 (little-endian)
    val bmp = BmpCodec.encode24(4, 3, (x, y) => (x, y, x + y))
    def patchBmp(w: Int, h: Int): Array[Byte] = {
      val p = bmp.clone()
      ByteBuffer.wrap(p, 18, 8).order(ByteOrder.LITTLE_ENDIAN).putInt(w).putInt(h)
      p
    }
    val e3 = intercept[IllegalArgumentException](
      BmpCodec.decode(patchBmp(1 << 30, 1 << 20)))
    assert(e3.getMessage.contains("holds only"))
    val e4 = intercept[IllegalArgumentException](
      BmpCodec.decode(patchBmp(20000, 20000)))
    assert(e4.getMessage.contains("holds only"))
    intercept[IllegalArgumentException](BmpCodec.decode(patchBmp(-4, 3)))
    // (3) the GUARD itself must not overflow: dims near 2^31 wrap the
    // naive stride*height Long product and would slip past a product-
    // form check into the allocation
    intercept[IllegalArgumentException](
      BmpCodec.decode(patchBmp(1900000000, 1900000000)))
    intercept[IllegalArgumentException](
      PngCodec.decode(patchPng(1900000000, 1900000000)))
    intercept[IllegalArgumentException]( // height alone overflows raw len
      PngCodec.decode(patchPng(1000, 1900000000)))
    // sane files still decode after the hardening
    assert(PngCodec.decode(png).width === 4)
    assert(BmpCodec.decode(bmp).width === 4)
  }

  test("adversarial RIFF chunk sizes refuse loudly: negative sizes " +
    "cannot loop or throw raw array errors, oversized data cannot OOM") {
    import java.nio.{ByteBuffer, ByteOrder}
    val wav = WavCodec.encodePcm16Mono(8000, Array[Short](1, 2, 3, 4))
    // data chunk size field sits at offset 40 in the canonical 44-byte
    // header; fmt size at 16
    def patched(off: Int, v: Int): Array[Byte] = {
      val p = wav.clone()
      ByteBuffer.wrap(p, off, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
      p
    }
    // (1) negative data size: NegativeArraySizeException class
    val e1 = intercept[IllegalArgumentException](
      WavCodec.decode(patched(40, -8)))
    assert(e1.getMessage.contains("declares"))
    // (2) huge declared data in a tiny file: multi-GB allocation class
    val e2 = intercept[IllegalArgumentException](
      WavCodec.decode(patched(40, 0x7ffffffe)))
    assert(e2.getMessage.contains("remain"))
    // (3) negative size on a SKIPPED foreign chunk: the word-aligned
    // skip would walk the cursor backwards and spin forever
    val junk = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    junk.put("RIFF".getBytes("US-ASCII")).putInt(12)
      .put("WAVE".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(-8)
    intercept[IllegalArgumentException](WavCodec.decode(junk.array()))
    // (4) fmt chunk too short to hold the PCM header
    intercept[IllegalArgumentException](WavCodec.decode(patched(16, 4)))
    // sane files still decode after the hardening
    assert(WavCodec.decode(wav).samples.toSeq === Seq[Short](1, 2, 3, 4))
  }

  test("a BMP data offset pointing inside the headers refuses instead " +
    "of silently decoding header bytes as pixels") {
    import java.nio.{ByteBuffer, ByteOrder}
    // pad the file so the pixel-payload bound passes at offset 0 — only
    // the headers-end check can reject it
    val bmp = BmpCodec.encode24(4, 3, (x, y) => (x, y, x + y)) ++
      Array.fill[Byte](64)(0)
    def withOffset(off: Int): Array[Byte] = {
      val p = bmp.clone()
      ByteBuffer.wrap(p, 10, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(off)
      p
    }
    val e = intercept[IllegalArgumentException](BmpCodec.decode(withOffset(0)))
    assert(e.getMessage.contains("headers end"))
    intercept[IllegalArgumentException](BmpCodec.decode(withOffset(53)))
    assert(BmpCodec.decode(withOffset(54)).width === 4) // first legal byte
  }

  test("JvmMediaDecoder: wav features come from the REAL samples " +
    "(square wave: rms == peak == amplitude), bmp features from the " +
    "REAL pixels; unknown formats fall back to the stub") {
    val amp = 8192
    val samples = Array.tabulate(400)(i =>
      (if ((i / 4) % 2 == 0) amp else -amp).toShort)
    val dec = new MediaOps.JvmMediaDecoder(8)
    val f = dec.decode("audio", "wav",
      WavCodec.encodePcm16Mono(16000, samples))
    assert(math.abs(f(1) - amp / 32768f) < 1e-6, s"rms ${f(1)}")
    assert(math.abs(f(2) - amp / 32768f) < 1e-6, s"peak ${f(2)}")
    assert(math.abs(f(3) - 99f / 400f) < 1e-6, s"zcr ${f(3)}")
    val g = dec.decode("image", "bmp",
      BmpCodec.encode24(5, 4, (_, _) => (255, 0, 51)))
    assert(g(0) === 5f && g(1) === 4f)
    assert(math.abs(g(2) - 1f) < 1e-6 && g(3) === 0f &&
      math.abs(g(4) - 0.2f) < 1e-3)
    // fallback path still serves for stubbed formats
    assert(dec.decode("video", "fake-video", Array[Byte](1, 2, 3)).length === 8)
  }
}
