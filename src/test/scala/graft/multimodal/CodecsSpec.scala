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
