package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp4Codec]]: ISO-BMFF box walking and sample-table resolution,
  * pinned against HAND-ASSEMBLED files (built from the published box
  * layout — no round-trip circularity), plus the encoder round trip,
  * the multi-chunk stsc run logic, 64-bit forms, the refusal surface,
  * and a full single-byte corruption sweep (the untrusted-length rule
  * every codec in this module follows).
  */
class Mp4CodecSpec extends AnyFunSuite {

  // ------------------------------------------------- hand assembly

  private def beBox(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
    b.array()
  }

  private def beFull(typ: String, vf: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + payload.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt(vf).put(payload)
    beBox(typ, b.array())
  }

  private def ints(vs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.BIG_ENDIAN)
    vs.foreach(b.putInt)
    b.array()
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var p = 0
    parts.foreach { a => System.arraycopy(a, 0, out, p, a.length); p += a.length }
    out
  }

  /** Hand-built single-track file: `samples` land in `mdat` in order,
    * chunk layout given by (first_chunk, samples_per_chunk) runs and
    * per-chunk offsets computed here; `co64` switches the offset box.
    */
  private def handFile(samples: Seq[Array[Byte]],
      runs: Seq[(Int, Int)], nChunks: Int, co64: Boolean = false,
      codec: String = "jpeg", handler: String = "vide"): Array[Byte] = {
    val ftyp = beBox("ftyp", cat("isom".getBytes, ints(0x200), "isom".getBytes))
    val mdat = beBox("mdat", cat(samples: _*))
    val mdatPayloadOff = ftyp.length + 8
    // expand runs to per-chunk counts, then chunk offsets
    val perChunk = (0 until nChunks).map { c =>
      val run = runs.lastIndexWhere(_._1 <= c + 1)
      runs(run)._2
    }
    val offsets = perChunk.scanLeft((mdatPayloadOff.toLong, 0)) {
      case ((off, si), cnt) =>
        (off + samples.slice(si, si + cnt).map(_.length).sum, si + cnt)
    }.map(_._1).init
    val stsd = beFull("stsd", 0, cat(ints(1),
      beBox(codec, cat(new Array[Byte](6), Array[Byte](0, 1),
        new Array[Byte](16), Array[Byte](0, 24, 0, 16), // 24x16
        ints(0x00480000, 0x00480000, 0), Array[Byte](0, 1),
        new Array[Byte](32), Array[Byte](0, 24, 0xFF.toByte, 0xFF.toByte)))))
    val stts = beFull("stts", 0, ints(1, samples.length, 25))
    val stsc = beFull("stsc", 0, cat(ints(runs.length),
      cat(runs.map { case (fc, n) => ints(fc, n, 1) }: _*)))
    val stsz = beFull("stsz", 0, cat(ints(0, samples.length),
      cat(samples.map(s => ints(s.length)): _*)))
    val stco =
      if (!co64) beFull("stco", 0, cat(ints(offsets.length),
        cat(offsets.map(o => ints(o.toInt)): _*)))
      else beFull("co64", 0, cat(ints(offsets.length),
        cat(offsets.map { o =>
          val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
          b.putLong(o); b.array()
        }: _*)))
    val stbl = beBox("stbl", cat(stsd, stts, stsc, stsz, stco))
    val minf = beBox("minf",
      cat(beFull("vmhd", 1, new Array[Byte](8)),
        beBox("dinf", beFull("dref", 0,
          cat(ints(1), beFull("url ", 1, Array.emptyByteArray)))),
        stbl))
    val hdlr = beFull("hdlr", 0,
      cat(ints(0), handler.getBytes("ISO-8859-1"), ints(0, 0, 0)))
    val mdhd = beFull("mdhd", 0, cat(ints(0, 0, 600, 25 * samples.length),
      Array[Byte](0x55, 0xC4.toByte, 0, 0)))
    val mdia = beBox("mdia", cat(mdhd, hdlr, minf))
    val tkhd = beFull("tkhd", 7, cat( // version 0, flags 7
      ints(0, 0, 1, 0, 25 * samples.length), // times, track_ID 1, res, dur
      ints(0, 0), new Array[Byte](8), // reserved(8) + layer/alt/vol/res
      ints(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      ints(24 << 16, 16 << 16)))
    val trak = beBox("trak", cat(tkhd, mdia))
    val mvhd = beFull("mvhd", 0, cat(
      ints(0, 0, 600, 25 * samples.length, 0x00010000),
      Array[Byte](1, 0, 0, 0), ints(0, 0),
      ints(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      ints(0, 0, 0, 0, 0, 0, 2)))
    cat(ftyp, mdat, beBox("moov", cat(mvhd, trak)))
  }

  private def s(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  test("hand-built file: box walk + two-run stsc + stco resolve every " +
    "sample byte-exactly, in order") {
    val samples = Seq(s(1, 2, 3), s(4, 5), s(6), s(7, 8, 9, 10), s(11))
    // chunks: (1..2 hold 2 samples each), chunk 3 holds 1
    val f = handFile(samples, runs = Seq((1, 2), (3, 1)), nChunks = 3)
    val mp4 = Mp4Codec.decode(f)
    assert(mp4.majorBrand === "isom")
    val t = mp4.tracks.head
    assert(t.trackId === 1L && t.handler === "vide" && t.codec === "jpeg")
    assert(t.timescale === 600L && t.duration === 125L)
    assert(t.width === 24 && t.height === 16)
    assert(t.samples.length === 5)
    t.samples.zip(samples).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got.toSeq === want.toSeq, s"sample $i")
    }
  }

  test("co64 (64-bit chunk offsets) resolves identically") {
    val samples = Seq(s(9, 9), s(8), s(7, 7, 7))
    val f = handFile(samples, runs = Seq((1, 1)), nChunks = 3, co64 = true)
    val t = Mp4Codec.decode(f).tracks.head
    assert(t.samples.length === 3)
    t.samples.zip(samples).foreach { case (g, w) => assert(g.toSeq === w.toSeq) }
  }

  test("encodeMjpeg round-trips: every frame comes back bit-exact " +
    "through the real two-chunk layout, and mjpegTrack finds it") {
    val frames = (0 until 5).map(i =>
      JpegCodec.encode420(16, 16, (x, y) => ((x * 17 + i) % 256,
        (y * 29 + i) % 256, (x + y + i) % 256)))
    val f = Mp4Codec.encodeMjpeg(frames, 16, 16)
    val mp4 = Mp4Codec.decode(f)
    val t = mp4.mjpegTrack.getOrElse(fail("no mjpeg track found"))
    assert(t.width === 16 && t.height === 16)
    assert(t.samples.length === 5)
    t.samples.zip(frames).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.toSeq === w.toSeq, s"frame $i not bit-exact")
      val img = JpegCodec.decode(g) // and it IS a decodable JPEG
      assert(img.width === 16 && img.height === 16)
    }
  }

  test("largesize (size=1 + 64-bit) and size=0 (to end) box forms parse") {
    val inner = handFile(Seq(s(5)), runs = Seq((1, 1)), nChunks = 1)
    // rewrite the trailing moov box to the largesize form
    val moovAt = {
      var p = 0; var found = -1
      while (p < inner.length) {
        val sz = ByteBuffer.wrap(inner, p, 4).order(ByteOrder.BIG_ENDIAN).getInt()
        if (new String(inner, p + 4, 4, "ISO-8859-1") == "moov") found = p
        p += sz
      }
      found
    }
    val moovSz = ByteBuffer.wrap(inner, moovAt, 4)
      .order(ByteOrder.BIG_ENDIAN).getInt()
    val large = ByteBuffer.allocate(inner.length + 8).order(ByteOrder.BIG_ENDIAN)
    large.put(inner, 0, moovAt)
      .putInt(1).put("moov".getBytes("ISO-8859-1")).putLong(moovSz + 8L)
      .put(inner, moovAt + 8, moovSz - 8)
    assert(Mp4Codec.decode(large.array()).tracks.head.samples.length === 1)
    // size=0: the last top-level box may extend to EOF
    val zero = inner.clone()
    ByteBuffer.wrap(zero, moovAt, 4).order(ByteOrder.BIG_ENDIAN).putInt(0)
    assert(Mp4Codec.decode(zero).tracks.head.samples.length === 1)
  }

  test("FRAGMENTED: encodeMjpegFragmented round-trips through " +
    "moof/traf/trun — every frame bit-exact across fragments, trex " +
    "defaults honored when the trun carries no sizes") {
    val frames = (0 until 5).map(i =>
      JpegCodec.encode420(16, 16, (x, y) => ((x * 13 + i) % 256,
        (y * 31 + i) % 256, (x * y + i) % 256)))
    val f = Mp4Codec.encodeMjpegFragmented(frames, 16, 16,
      framesPerFragment = 2) // fragments of 2, 2, 1
    val t = Mp4Codec.decode(f).mjpegTrack.getOrElse(fail("no mjpeg track"))
    assert(t.samples.length === 5)
    t.samples.zip(frames).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.toSeq === w.toSeq, s"fragmented frame $i not bit-exact")
    }
    // the plain and fragmented packings of the SAME frames decode to
    // the same samples — the video_dedup_mp4 mixed-corpus contract
    val plain = Mp4Codec.decode(Mp4Codec.encodeMjpeg(frames, 16, 16))
      .mjpegTrack.get.samples
    assert(plain.zip(t.samples).forall { case (a, b) => a.toSeq == b.toSeq })

    // trex default size path: constant-size samples, a trun with ONLY
    // a data offset (flags 0x1) — sizes resolve from trex
    val const = Seq(s(7, 7, 7, 7), s(9, 9, 9, 9))
    val ftyp = beBox("ftyp", cat("isom".getBytes, ints(0x200)))
    val stbl = beBox("stbl", cat(
      beFull("stsd", 0, cat(ints(1), beBox("jpeg", cat(
        new Array[Byte](6), Array[Byte](0, 1), new Array[Byte](16),
        Array[Byte](0, 24, 0, 16), ints(0x00480000, 0x00480000, 0),
        Array[Byte](0, 1), new Array[Byte](32),
        Array[Byte](0, 24, 0xFF.toByte, 0xFF.toByte))))),
      beFull("stts", 0, ints(0)), beFull("stsc", 0, ints(0)),
      beFull("stsz", 0, ints(0, 0)), beFull("stco", 0, ints(0))))
    val minf = beBox("minf", cat(beFull("vmhd", 1, new Array[Byte](8)),
      beBox("dinf", beFull("dref", 0,
        cat(ints(1), beFull("url ", 1, Array.emptyByteArray)))), stbl))
    val mdia = beBox("mdia", cat(
      beFull("mdhd", 0, cat(ints(0, 0, 600, 50),
        Array[Byte](0x55, 0xC4.toByte, 0, 0))),
      beFull("hdlr", 0, cat(ints(0), "vide".getBytes, ints(0, 0, 0))),
      minf))
    val tkhd = beFull("tkhd", 7, cat(ints(0, 0, 1, 0, 50), ints(0, 0),
      new Array[Byte](8),
      ints(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      ints(24 << 16, 16 << 16)))
    val moov = beBox("moov", cat(
      beFull("mvhd", 0, cat(ints(0, 0, 600, 50, 0x00010000),
        Array[Byte](1, 0, 0, 0), ints(0, 0),
        ints(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
        ints(0, 0, 0, 0, 0, 0, 2))),
      beBox("trak", cat(tkhd, mdia)),
      beBox("mvex", beFull("trex", 0, ints(1, 1, 25, 4, 0))))) // size 4
    def moofOf(off: Int): Array[Byte] = beBox("moof", cat(
      beFull("mfhd", 0, ints(1)),
      beBox("traf", cat(
        beFull("tfhd", 0x020000, ints(1)), // default-base-is-moof
        beFull("trun", 0x000001, ints(2, off)))))) // offset only
    val frag = cat(moofOf(moofOf(0).length + 8), beBox("mdat", cat(const: _*)))
    val whole = cat(ftyp, moov, frag)
    val t2 = Mp4Codec.decode(whole).tracks.head
    assert(t2.samples.length === 2)
    t2.samples.zip(const).foreach { case (g, w) => assert(g.toSeq === w.toSeq) }
  }

  test("PCM audio track: encodePcm16 round-trips through the sowt " +
    "sample tables — concatenated pcm16 is bit-exact, incl. a " +
    "partial last chunk; pcmTrack and mjpegTrack don't cross-match") {
    val samples = Array.tabulate(10000)(i =>
      ((i * 131 + 7) % 65536 - 32768).toShort)
    val f = Mp4Codec.encodePcm16(samples, 16000, samplesPerChunk = 4096)
    val mp4 = Mp4Codec.decode(f)
    val t = mp4.pcmTrack.getOrElse(fail("no pcm track"))
    assert(t.handler === "soun" && t.codec === "sowt")
    assert(t.timescale === 16000L && t.duration === 10000L)
    assert(t.samples.length === 3, "10000 samples @ 4096/chunk = 3 MP4 samples")
    assert(t.pcm16.toSeq === samples.toSeq, "PCM not bit-exact")
    assert(mp4.mjpegTrack.isEmpty, "an audio file has no mjpeg track")
  }

  test("FRAGMENTED corruption sweep: single-byte corruptions of a " +
    "moof/trun file parse or refuse loudly") {
    val base = Mp4Codec.encodeMjpegFragmented(
      (0 until 3).map(i => JpegCodec.encode420(16, 8,
        (x, y) => ((x + i) % 256, (y * 3) % 256, 128))), 16, 8)
    def attempt(b: Array[Byte], what: String): Unit =
      try { Mp4Codec.decode(b); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"$what: ${e.getClass.getName}: ${e.getMessage}")
      }
    base.indices.foreach { i =>
      val zeroed = base.clone(); zeroed(i) = 0
      attempt(zeroed, s"byte $i zeroed")
      val flipped = base.clone(); flipped(i) = (flipped(i) ^ 0xFF).toByte
      attempt(flipped, s"byte $i flipped")
    }
    (0 until base.length by 5).foreach { n =>
      attempt(base.take(n), s"truncated to $n bytes")
    }
  }

  test("refusals: non-BMFF, missing moov, unknown-track moof, no MJPEG " +
    "track for the frame hasher") {
    intercept[IllegalArgumentException](
      Mp4Codec.decode("not a container at all".getBytes))
    val ok = handFile(Seq(s(1)), runs = Seq((1, 1)), nChunks = 1)
    // a moof naming a track the moov never declared refuses loudly
    val badMoof = beBox("moof", beBox("traf",
      beFull("tfhd", 0x020000, ints(99))))
    val e1 = intercept[IllegalArgumentException](
      Mp4Codec.decode(cat(ok, badMoof)))
    assert(e1.getMessage.contains("99"), e1.getMessage)
    val noMoov = {
      val ftyp = beBox("ftyp", cat("isom".getBytes, ints(0x200)))
      cat(ftyp, beBox("mdat", s(1, 2, 3)))
    }
    val e2 = intercept[IllegalArgumentException](Mp4Codec.decode(noMoov))
    assert(e2.getMessage.contains("moov"), e2.getMessage)
    // a soun-handler track is parsed but is not an MJPEG track
    val audio = handFile(Seq(s(1)), runs = Seq((1, 1)), nChunks = 1,
      codec = "mp4a", handler = "soun")
    assert(Mp4Codec.decode(audio).mjpegTrack.isEmpty)
  }

  test("corruption sweep: every single-byte corruption either parses " +
    "or refuses with the loud IllegalArgumentException — never an " +
    "index/allocation error, never a hang") {
    val base = Mp4Codec.encodeMjpeg(
      (0 until 3).map(i => JpegCodec.encode420(16, 8,
        (x, y) => ((x + i) % 256, (y * 3) % 256, 128))), 16, 8)
    def attempt(b: Array[Byte], what: String): Unit =
      try { Mp4Codec.decode(b); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"$what: ${e.getClass.getName}: ${e.getMessage}")
      }
    base.indices.foreach { i =>
      val zeroed = base.clone(); zeroed(i) = 0
      attempt(zeroed, s"byte $i zeroed")
      val flipped = base.clone(); flipped(i) = (flipped(i) ^ 0xFF).toByte
      attempt(flipped, s"byte $i flipped")
      val maxed = base.clone(); maxed(i) = 0xFF.toByte
      attempt(maxed, s"byte $i maxed")
    }
    (0 until base.length by 5).foreach { n =>
      attempt(base.take(n), s"truncated to $n bytes")
    }
  }
}
