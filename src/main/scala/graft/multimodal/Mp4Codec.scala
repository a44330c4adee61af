package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM ISO-BMFF (MP4) container codec — the container half of
  * the audio/video entropy surface ([[Codecs]] doc): real corpora
  * arrive as ISO base-media files, and parsing one needs no native
  * library — the format is a length-prefixed box tree
  * (ISO/IEC 14496-12): `ftyp`, `mdat` (sample bytes), `moov` with the
  * per-track sample tables under `trak/mdia/minf/stbl`:
  *
  *  - `stsd` — codec fourcc + visual dimensions;
  *  - `stts` — sample durations (with `mdhd`'s timescale);
  *  - `stsz` — per-sample byte sizes (or one constant size);
  *  - `stsc` — sample→chunk runs (first_chunk, samples_per_chunk);
  *  - `stco`/`co64` — absolute chunk offsets (32/64-bit).
  *
  * [[decode]] walks the tree, resolves the tables, and materializes
  * every track's samples as byte ranges of `mdat` — which feeds the
  * EXISTING media chains directly: a Motion-JPEG track's samples are
  * baseline JFIF streams that [[JpegCodec.decode]] turns into pixels
  * for [[VideoDedup.frameHashDf]]'s shot pipeline (the
  * `video_dedup_mp4` gate query), no new pixel path at all.
  *
  * Untrusted-length hardening (the WAV/BMP/PNG/JPEG rule): every box
  * size is validated against its parent's extent before use (≥ the
  * header's own bytes, no overrun), the 64-bit `largesize` and
  * to-end-of-enclosure (`size = 0`) forms are supported with the same
  * checks, table entry counts are bounded by the box payload, and
  * sample ranges must land inside the FILE — a corrupt length refuses
  * loudly with the precise message, never an index error or a hang
  * (corruption-sweep pinned in Mp4CodecSpec).
  *
  * [[encodeMjpeg]] writes the minimal honest MJPEG-in-MP4 file
  * (ftyp / mdat / moov with a `vide` track, `jpeg` sample entry,
  * two-chunk layout so `stsc` run logic is genuinely exercised) —
  * deterministic byte-for-byte, so generated corpora round-trip and
  * the oracle replays features in closed form.
  *
  * Scope: one `moov` per file, sample tables for every track with a
  * complete stbl; `stss`/`ctts`/edit lists are skipped by length
  * (sync/composition metadata — not needed to extract samples).
  * FRAGMENTED MP4 (fMP4, the DASH/HLS segment layout) decodes too
  * ([[decodeFragments]]): `moov/mvex/trex` defaults, per-fragment
  * `moof/traf/trun` sample tables with the base-data-offset /
  * default-base-is-moof rules — [[encodeMjpegFragmented]] writes the
  * segment form, and the `video_dedup_mp4` corpus mixes both layouts
  * so one oracle hash match proves both protocols.
  */
object Mp4Codec {

  /** One parsed track: identity, codec, timing, dimensions, and its
    * samples as byte arrays in presentation order.
    */
  final case class Mp4Track(trackId: Long, handler: String, codec: String,
      timescale: Long, duration: Long, width: Int, height: Int,
      samples: Array[Array[Byte]]) {

    /** The track's samples as one concatenated little-endian 16-bit
      * PCM signal (the `sowt` payload layout). Refuses on odd-length
      * payloads rather than dropping a byte.
      */
    def pcm16: Array[Short] = {
      val total = samples.iterator.map(_.length).sum
      require(total % 2 == 0, "PCM payload is not 16-bit aligned")
      val out = new Array[Short](total / 2)
      var o = 0
      samples.foreach { s =>
        val bb = ByteBuffer.wrap(s).order(ByteOrder.LITTLE_ENDIAN)
        while (bb.remaining() >= 2) { out(o) = bb.getShort(); o += 1 }
      }
      out
    }
  }

  final case class Mp4(majorBrand: String, tracks: Seq[Mp4Track]) {
    /** The first video track carrying `jpeg` samples, if any. */
    def mjpegTrack: Option[Mp4Track] =
      tracks.find(t => t.handler == "vide" && t.codec == "jpeg")

    /** The first audio track carrying `sowt` (LE 16-bit PCM), if any. */
    def pcmTrack: Option[Mp4Track] =
      tracks.find(t => t.handler == "soun" && t.codec == "sowt")
  }

  // ------------------------------------------------------------ decode

  private final case class Box(typ: String, start: Int, payloadStart: Int,
      payloadEnd: Int)

  /** Walk the boxes of `[start, end)`; returns them in file order. */
  private def boxes(b: Array[Byte], start: Int, end: Int): Seq[Box] = {
    val out = ArrayBuffer.empty[Box]
    var pos = start
    while (pos < end) {
      require(end - pos >= 8, s"truncated box header at $pos")
      val size32 = ByteBuffer.wrap(b, pos, 4)
        .order(ByteOrder.BIG_ENDIAN).getInt() & 0xFFFFFFFFL
      val typ = new String(b, pos + 4, 4, "ISO-8859-1")
      var hdr = 8L
      val size: Long =
        if (size32 == 1L) { // 64-bit largesize follows the TYPE field
          require(end - pos >= 16, s"truncated largesize box at $pos")
          hdr = 16L
          ByteBuffer.wrap(b, pos + 8, 8).order(ByteOrder.BIG_ENDIAN).getLong()
        } else if (size32 == 0L) (end - pos).toLong // extends to enclosure end
        else size32
      require(size >= hdr, s"box '$typ' at $pos: size $size < header $hdr")
      require(pos + size <= end,
        s"box '$typ' at $pos: size $size overruns enclosure end $end")
      out += Box(typ, pos, (pos + hdr).toInt, (pos + size).toInt)
      pos = (pos + size).toInt
    }
    out.toSeq
  }

  private def child(b: Array[Byte], parent: Box, typ: String): Option[Box] =
    boxes(b, parent.payloadStart, parent.payloadEnd).find(_.typ == typ)

  private def requiredChild(b: Array[Byte], parent: Box, typ: String): Box =
    child(b, parent, typ).getOrElse(
      throw new IllegalArgumentException(
        s"'${parent.typ}' has no '$typ' box"))

  /** Full-box header: (version, payload position past version+flags). */
  private def fullBox(b: Array[Byte], box: Box): (Int, Int) = {
    require(box.payloadEnd - box.payloadStart >= 4,
      s"'${box.typ}' too short for a full-box header")
    ((b(box.payloadStart) & 0xFF), box.payloadStart + 4)
  }

  private def u32(b: Array[Byte], pos: Int, end: Int, what: String): Long = {
    require(pos + 4 <= end, s"$what: truncated u32 at $pos")
    ByteBuffer.wrap(b, pos, 4).order(ByteOrder.BIG_ENDIAN).getInt() & 0xFFFFFFFFL
  }

  private def u64(b: Array[Byte], pos: Int, end: Int, what: String): Long = {
    require(pos + 8 <= end, s"$what: truncated u64 at $pos")
    ByteBuffer.wrap(b, pos, 8).order(ByteOrder.BIG_ENDIAN).getLong()
  }

  /** Entry-counted table guard: `n` entries of `entryBytes` must fit
    * the box payload — an attacker-controlled count cannot force reads
    * past the box.
    */
  private def tableCount(b: Array[Byte], box: Box, entryBytes: Int,
      what: String): (Long, Int) = {
    val (_, p) = fullBox(b, box)
    val n = u32(b, p, box.payloadEnd, what)
    require(n * entryBytes <= box.payloadEnd - p - 4,
      s"$what: declared $n entries overrun the box")
    (n, p + 4)
  }

  def decode(bytes: Array[Byte]): Mp4 = {
    val top = boxes(bytes, 0, bytes.length)
    val ftyp = top.find(_.typ == "ftyp").getOrElse(
      throw new IllegalArgumentException("not an ISO-BMFF file (no ftyp)"))
    require(ftyp.payloadEnd - ftyp.payloadStart >= 8,
      "ftyp too short for major_brand")
    val brand = new String(bytes, ftyp.payloadStart, 4, "ISO-8859-1")
    val moov = top.find(_.typ == "moov").getOrElse(
      throw new IllegalArgumentException("no moov box (no sample tables)"))

    val tracks = boxes(bytes, moov.payloadStart, moov.payloadEnd)
      .filter(_.typ == "trak").map { trak =>
        val tkhd = requiredChild(bytes, trak, "tkhd")
        val (tv, tp) = fullBox(bytes, tkhd)
        // v0: times are u32; v1: u64 — track id sits past them
        val trackId =
          if (tv == 0) u32(bytes, tp + 8, tkhd.payloadEnd, "tkhd.track_id")
          else u64(bytes, tp + 16, tkhd.payloadEnd, "tkhd.track_id") // v1 id is still u32; read high half guard below
        val tid = if (tv == 0) trackId else (trackId >>> 32)
        // width/height: last 8 bytes of tkhd, 16.16 fixed
        val w16 = u32(bytes, tkhd.payloadEnd - 8, tkhd.payloadEnd, "tkhd.width")
        val h16 = u32(bytes, tkhd.payloadEnd - 4, tkhd.payloadEnd, "tkhd.height")

        val mdia = requiredChild(bytes, trak, "mdia")
        val mdhd = requiredChild(bytes, mdia, "mdhd")
        val (mv, mp) = fullBox(bytes, mdhd)
        val (timescale, duration) =
          if (mv == 0)
            (u32(bytes, mp + 8, mdhd.payloadEnd, "mdhd.timescale"),
              u32(bytes, mp + 12, mdhd.payloadEnd, "mdhd.duration"))
          else
            (u32(bytes, mp + 16, mdhd.payloadEnd, "mdhd.timescale"),
              u64(bytes, mp + 20, mdhd.payloadEnd, "mdhd.duration"))
        val hdlr = requiredChild(bytes, mdia, "hdlr")
        val (_, hp) = fullBox(bytes, hdlr)
        require(hp + 8 <= hdlr.payloadEnd, "hdlr too short for handler_type")
        val handler = new String(bytes, hp + 4, 4, "ISO-8859-1")

        val minf = requiredChild(bytes, mdia, "minf")
        val stbl = requiredChild(bytes, minf, "stbl")

        // stsd: first sample entry's fourcc (+ visual dims as a check)
        val stsd = requiredChild(bytes, stbl, "stsd")
        val (_, sp) = fullBox(bytes, stsd)
        val nDesc = u32(bytes, sp, stsd.payloadEnd, "stsd.entry_count")
        require(nDesc >= 1, "stsd: zero sample descriptions")
        val entries = boxes(bytes, sp + 4, stsd.payloadEnd)
        require(entries.nonEmpty, "stsd: entry list empty")
        val codec = entries.head.typ

        // stsz: per-sample sizes (sample_size != 0 = constant size)
        val stsz = requiredChild(bytes, stbl, "stsz")
        val (_, zp) = fullBox(bytes, stsz)
        val constSize = u32(bytes, zp, stsz.payloadEnd, "stsz.sample_size")
        val sampleCount = u32(bytes, zp + 4, stsz.payloadEnd, "stsz.sample_count")
        require(sampleCount <= Int.MaxValue, "stsz: absurd sample count")
        require(constSize != 0L || sampleCount * 4 <= stsz.payloadEnd - zp - 8,
          s"stsz: declared $sampleCount sizes overrun the box")
        val sizes = Array.tabulate(sampleCount.toInt) { i =>
          if (constSize != 0L) constSize
          else u32(bytes, zp + 8 + 4 * i, stsz.payloadEnd, "stsz.size")
        }

        // stco / co64: chunk offsets
        val (nChunks, chunkOff) = child(bytes, stbl, "stco") match {
          case Some(stco) =>
            val (n, p) = tableCount(bytes, stco, 4, "stco")
            (n.toInt, (i: Int) => u32(bytes, p + 4 * i, stco.payloadEnd, "stco"))
          case None =>
            val co64 = requiredChild(bytes, stbl, "co64")
            val (n, p) = tableCount(bytes, co64, 8, "co64")
            (n.toInt, (i: Int) => u64(bytes, p + 8 * i, co64.payloadEnd, "co64"))
        }

        // stsc: (first_chunk, samples_per_chunk, desc) runs — expand to
        // a per-chunk sample count, bounded by the chunk table
        val stsc = requiredChild(bytes, stbl, "stsc")
        val (nRuns, rp) = tableCount(bytes, stsc, 12, "stsc")
        val runs = Array.tabulate(nRuns.toInt) { i =>
          (u32(bytes, rp + 12 * i, stsc.payloadEnd, "stsc.first_chunk"),
            u32(bytes, rp + 12 * i + 4, stsc.payloadEnd, "stsc.samples_per_chunk"))
        }
        require(runs.nonEmpty || sampleCount == 0, "stsc: no runs")
        runs.headOption.foreach { case (fc, _) =>
          require(fc == 1L, s"stsc: first run starts at chunk $fc, not 1") }

        // materialize samples chunk by chunk
        val samples = ArrayBuffer.empty[Array[Byte]]
        var run = 0
        var chunk = 0
        var si = 0
        while (chunk < nChunks && si < sizes.length) {
          while (run + 1 < runs.length && chunk + 1 >= runs(run + 1)._1)
            run += 1
          val perChunk = runs(run)._2
          var off = chunkOff(chunk)
          var j = 0L
          while (j < perChunk && si < sizes.length) {
            val sz = sizes(si)
            require(off >= 0 && sz >= 0 && off + sz <= bytes.length,
              s"sample $si: range [$off, ${off + sz}) outside the file")
            samples += java.util.Arrays.copyOfRange(
              bytes, off.toInt, (off + sz).toInt)
            off += sz
            si += 1
            j += 1
          }
          chunk += 1
        }
        require(si == sizes.length,
          s"chunk tables cover $si of ${sizes.length} samples")

        Mp4Track(tid, handler, codec, timescale, duration,
          (w16 >>> 16).toInt, (h16 >>> 16).toInt, samples.toArray)
      }

    val moofs = top.filter(_.typ == "moof")
    if (moofs.isEmpty) Mp4(brand, tracks)
    else Mp4(brand, decodeFragments(bytes, moov, moofs, tracks))
  }

  /** FRAGMENTED MP4 (fMP4 — the DASH/HLS segment layout): sample
    * tables live in per-fragment `moof/traf/trun` boxes instead of
    * `stbl`; `moov/mvex/trex` carries per-track defaults. Each traf's
    * base data offset is the explicit `base-data-offset` when present,
    * else the MOOF BOX START (the `default-base-is-moof` rule, also
    * the spec default for the first traf); truns advance a running
    * offset (explicit `data_offset` rebases it). Per-sample sizes come
    * from the trun when present, else tfhd's default, else trex's —
    * a fragment that resolves no size anywhere refuses loudly.
    */
  private def decodeFragments(bytes: Array[Byte], moov: Box,
      moofs: Seq[Box], tracks: Seq[Mp4Track]): Seq[Mp4Track] = {
    // trex defaults: track_id -> default_sample_size
    val trexSize: Map[Long, Long] = child(bytes, moov, "mvex") match {
      case None => Map.empty
      case Some(mvex) =>
        boxes(bytes, mvex.payloadStart, mvex.payloadEnd)
          .filter(_.typ == "trex").map { trex =>
            val (_, p) = fullBox(bytes, trex)
            (u32(bytes, p, trex.payloadEnd, "trex.track_id"),
              u32(bytes, p + 12, trex.payloadEnd, "trex.default_sample_size"))
          }.toMap
    }
    val acc: Map[Long, ArrayBuffer[Array[Byte]]] =
      tracks.map(t => t.trackId -> (ArrayBuffer.empty[Array[Byte]] ++=
        t.samples)).toMap
    moofs.foreach { moof =>
      boxes(bytes, moof.payloadStart, moof.payloadEnd)
        .filter(_.typ == "traf").foreach { traf =>
          val tfhd = requiredChild(bytes, traf, "tfhd")
          val (_, fp) = fullBox(bytes, tfhd)
          val tfFlags = u32(bytes, tfhd.payloadStart, tfhd.payloadEnd,
            "tfhd.flags") & 0xFFFFFF
          val trackId = u32(bytes, fp, tfhd.payloadEnd, "tfhd.track_id")
          val out = acc.getOrElse(trackId,
            throw new IllegalArgumentException(
              s"moof references unknown track $trackId"))
          var q = fp + 4
          val baseOffset: Long =
            if ((tfFlags & 0x1) != 0) {
              val v = u64(bytes, q, tfhd.payloadEnd, "tfhd.base_data_offset")
              q += 8; v
            } else moof.start.toLong // default-base-is-moof / first-traf rule
          if ((tfFlags & 0x2) != 0) q += 4 // sample_description_index
          if ((tfFlags & 0x8) != 0) q += 4 // default_sample_duration
          val tfhdDefaultSize: Option[Long] =
            if ((tfFlags & 0x10) != 0) {
              val v = u32(bytes, q, tfhd.payloadEnd, "tfhd.default_sample_size")
              q += 4; Some(v)
            } else None
          var off = baseOffset
          boxes(bytes, traf.payloadStart, traf.payloadEnd)
            .filter(_.typ == "trun").foreach { trun =>
              val (_, tp0) = fullBox(bytes, trun)
              val trFlags = u32(bytes, trun.payloadStart, trun.payloadEnd,
                "trun.flags") & 0xFFFFFF
              val n = u32(bytes, tp0, trun.payloadEnd, "trun.sample_count")
              require(n <= Int.MaxValue, "trun: absurd sample count")
              var p = tp0 + 4
              if ((trFlags & 0x1) != 0) { // data_offset (signed) rebases
                off = baseOffset +
                  ByteBuffer.wrap(bytes, p, 4).order(ByteOrder.BIG_ENDIAN).getInt()
                p += 4
              }
              if ((trFlags & 0x4) != 0) p += 4 // first_sample_flags
              val perSample = Seq(0x100, 0x200, 0x400, 0x800)
                .map(f => (trFlags & f) != 0)
              val entryBytes = perSample.count(identity) * 4
              require(p + n * entryBytes <= trun.payloadEnd,
                s"trun: $n samples overrun the box")
              var i = 0L
              while (i < n) {
                var e = (p + i * entryBytes).toInt
                if (perSample(0)) e += 4 // duration
                val sz: Long =
                  if (perSample(1)) u32(bytes, e, trun.payloadEnd, "trun.size")
                  else tfhdDefaultSize.orElse(trexSize.get(trackId)).getOrElse(
                    throw new IllegalArgumentException(
                      s"track $trackId: no sample size in trun, tfhd or trex"))
                require(off >= 0 && sz >= 0 && off + sz <= bytes.length,
                  s"fragment sample: range [$off, ${off + sz}) outside the file")
                out += java.util.Arrays.copyOfRange(
                  bytes, off.toInt, (off + sz).toInt)
                off += sz
                i += 1
              }
            }
        }
    }
    tracks.map(t => t.copy(samples = acc(t.trackId).toArray))
  }

  // ------------------------------------------------------------ encode

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
    b.array()
  }

  private def full(typ: String, version: Int, flags: Int,
      payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + payload.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt((version << 24) | (flags & 0xFFFFFF)).put(payload)
    box(typ, b.array())
  }

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var p = 0
    parts.foreach { a => System.arraycopy(a, 0, out, p, a.length); p += a.length }
    out
  }

  private def be(vals: (Int, Any)*): Array[Byte] = {
    val len = vals.map { case (n, _) => n }.sum
    val b = ByteBuffer.allocate(len).order(ByteOrder.BIG_ENDIAN)
    vals.foreach {
      case (1, v: Int) => b.put(v.toByte)
      case (2, v: Int) => b.putShort(v.toShort)
      case (4, v: Int) => b.putInt(v)
      case (4, v: Long) => b.putInt(v.toInt)
      case (8, v: Long) => b.putLong(v)
      case (n, v: Array[Byte]) => require(v.length == n); b.put(v)
      case other => throw new IllegalArgumentException(s"be: $other")
    }
    b.array()
  }

  /** Minimal MJPEG-in-MP4: `frames` are baseline JFIF byte streams
    * (one sample each, constant `frameDuration` in `timescale` units).
    * Samples land in TWO chunks (first ⌈n/2⌉, then the rest) so the
    * `stsc` run logic is genuinely exercised on every file this
    * library itself produces. Deterministic byte-for-byte.
    */
  def encodeMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
      timescale: Long = 600L, frameDuration: Long = 25L): Array[Byte] = {
    require(frames.nonEmpty, "encodeMjpeg: no frames")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val ftyp = box("ftyp", be(
      (4, "isom".getBytes("ISO-8859-1")), (4, 0x200),
      (4, "isom".getBytes("ISO-8859-1")), (4, "iso2".getBytes("ISO-8859-1"))))
    val mdatPayload = concat(frames: _*)
    val mdat = box("mdat", mdatPayload)
    val n = frames.length
    val firstChunkN = (n + 1) / 2
    val chunk1Off = ftyp.length + 8L // past mdat's own header
    val chunk2Off = chunk1Off + frames.take(firstChunkN).map(_.length).sum
    val duration = frameDuration * n

    val stts = full("stts", 0, 0,
      be((4, 1), (4, n), (4, frameDuration)))
    val stsc = full("stsc", 0, 0, concat(
      be((4, if (n > firstChunkN) 2 else 1)),
      be((4, 1), (4, firstChunkN), (4, 1)),
      if (n > firstChunkN) be((4, 2), (4, n - firstChunkN), (4, 1))
      else Array.emptyByteArray))
    val stsz = full("stsz", 0, 0, concat(
      be((4, 0), (4, n)),
      concat(frames.map(f => be((4, f.length))): _*)))
    val stco = full("stco", 0, 0, concat(
      be((4, if (n > firstChunkN) 2 else 1)),
      be((4, chunk1Off)),
      if (n > firstChunkN) be((4, chunk2Off)) else Array.emptyByteArray))
    val stbl = box("stbl", concat(stsdJpeg(width, height), stts, stsc,
      stsz, stco))
    val moov = box("moov", concat(mvhdBox(timescale, duration),
      trakBox(width, height, timescale, duration, stbl)))
    concat(ftyp, mdat, moov)
  }

  /** FRAGMENTED MJPEG-in-MP4 (fMP4 — the DASH/HLS segment layout): an
    * empty `stbl` + `mvex/trex` defaults in moov, then one
    * `moof(mfhd, traf(tfhd default-base-is-moof, trun data-offset +
    * per-sample sizes)) + mdat` pair per `framesPerFragment` frames —
    * the layout streaming corpora actually arrive in. Deterministic
    * byte-for-byte; decoded samples are identical to [[encodeMjpeg]]'s
    * of the same frames.
    */
  def encodeMjpegFragmented(frames: Seq[Array[Byte]], width: Int,
      height: Int, framesPerFragment: Int = 2, timescale: Long = 600L,
      frameDuration: Long = 25L): Array[Byte] = {
    require(frames.nonEmpty, "encodeMjpegFragmented: no frames")
    require(framesPerFragment >= 1, "framesPerFragment must be >= 1")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val ftyp = box("ftyp", be(
      (4, "isom".getBytes("ISO-8859-1")), (4, 0x200),
      (4, "isom".getBytes("ISO-8859-1")), (4, "iso5".getBytes("ISO-8859-1"))))
    val duration = frameDuration * frames.length
    // empty sample tables: fragmented samples live in trun boxes
    val stbl = box("stbl", concat(stsdJpeg(width, height),
      full("stts", 0, 0, be((4, 0))),
      full("stsc", 0, 0, be((4, 0))),
      full("stsz", 0, 0, be((4, 0), (4, 0))),
      full("stco", 0, 0, be((4, 0)))))
    val trex = full("trex", 0, 0,
      be((4, 1), (4, 1), (4, frameDuration), (4, 0), (4, 0)))
    val moov = box("moov", concat(mvhdBox(timescale, duration),
      trakBox(width, height, timescale, duration, stbl),
      box("mvex", trex)))
    val frags = frames.grouped(framesPerFragment).zipWithIndex.map {
      case (fs, i) =>
        def moofOf(dataOff: Int): Array[Byte] = {
          val mfhd = full("mfhd", 0, 0, be((4, i + 1)))
          val tfhd = full("tfhd", 0, 0x020000, be((4, 1))) // base-is-moof
          val trun = full("trun", 0, 0x000201, concat( // data-offset+sizes
            be((4, fs.length), (4, dataOff)),
            concat(fs.map(f => be((4, f.length))): _*)))
          box("moof", concat(mfhd, box("traf", concat(tfhd, trun))))
        }
        val moofLen = moofOf(0).length
        concat(moofOf(moofLen + 8), box("mdat", concat(fs: _*)))
    }.toSeq
    concat((ftyp +: moov +: frags): _*)
  }

  /** PCM-in-MP4 (`soun` track, `sowt` little-endian 16-bit sample
    * entry — the QuickTime/ISO uncompressed-audio shape): mono 16-bit
    * samples packed `samplesPerChunk` PCM frames per MP4 sample
    * (per-sample sizes in `stsz`, two-chunk `stsc` layout like the
    * video twin), so the generic sample extraction hands back
    * contiguous little-endian PCM ranges that concatenate to the
    * original signal — real audio container bytes feeding the
    * EXISTING energy/block fingerprint chains
    * ([[AudioDedup]]; the `audio_dedup_mp4` gate query).
    */
  def encodePcm16(samples: Array[Short], sampleRate: Int,
      samplesPerChunk: Int = 4096): Array[Byte] = {
    require(samples.nonEmpty, "encodePcm16: no samples")
    require(sampleRate > 0 && samplesPerChunk > 0,
      s"bad rate/chunk $sampleRate/$samplesPerChunk")
    val pcm = {
      val bb = ByteBuffer.allocate(samples.length * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val ftyp = box("ftyp", be(
      (4, "isom".getBytes("ISO-8859-1")), (4, 0x200),
      (4, "isom".getBytes("ISO-8859-1")), (4, "iso2".getBytes("ISO-8859-1"))))
    val mdat = box("mdat", pcm)
    // MP4 samples: groups of samplesPerChunk PCM frames (last partial)
    val sizes = (0 until samples.length by samplesPerChunk)
      .map(i => math.min(samplesPerChunk, samples.length - i) * 2)
    val n = sizes.length
    val firstChunkN = (n + 1) / 2
    val chunk1Off = ftyp.length + 8L
    val chunk2Off = chunk1Off + sizes.take(firstChunkN).map(_.toLong).sum
    val stsdSowt = full("stsd", 0, 0, concat(be((4, 1)),
      box("sowt", be(
        (6, new Array[Byte](6)), (2, 1), // reserved + data_ref_index
        (2, 0), (2, 0), (4, 0), // version/revision/vendor
        (2, 1), (2, 16), (2, 0), (2, 0), // mono, 16-bit, compression/pkt
        (4, sampleRate << 16))))) // 16.16 rate
    val stts = full("stts", 0, 0, be((4, 1), (4, n), (4, samplesPerChunk)))
    val stsc = full("stsc", 0, 0, concat(
      be((4, if (n > firstChunkN) 2 else 1)),
      be((4, 1), (4, firstChunkN), (4, 1)),
      if (n > firstChunkN) be((4, 2), (4, n - firstChunkN), (4, 1))
      else Array.emptyByteArray))
    val stsz = full("stsz", 0, 0, concat(
      be((4, 0), (4, n)), concat(sizes.map(s => be((4, s))): _*)))
    val stco = full("stco", 0, 0, concat(
      be((4, if (n > firstChunkN) 2 else 1)),
      be((4, chunk1Off)),
      if (n > firstChunkN) be((4, chunk2Off)) else Array.emptyByteArray))
    val stbl = box("stbl", concat(stsdSowt, stts, stsc, stsz, stco))
    val duration = samples.length.toLong
    val dinf = box("dinf", full("dref", 0, 0, concat(
      be((4, 1)), full("url ", 0, 1, Array.emptyByteArray))))
    val smhd = full("smhd", 0, 0, be((2, 0), (2, 0))) // balance + reserved
    val minf = box("minf", concat(smhd, dinf, stbl))
    val hdlr = full("hdlr", 0, 0, concat(
      be((4, 0), (4, "soun".getBytes("ISO-8859-1")), (4, 0), (4, 0), (4, 0)),
      "graft".getBytes("ISO-8859-1")))
    val mdhd = full("mdhd", 0, 0, be(
      (4, 0), (4, 0), (4, sampleRate.toLong), (4, duration),
      (2, 0x55C4), (2, 0)))
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    val tkhd = full("tkhd", 0, 7, be(
      (4, 0), (4, 0), (4, 1), (4, 0), (4, duration),
      (4, 0), (4, 0), (2, 0), (2, 0), (2, 0x0100), (2, 0), // volume 1.0
      (36, identityMatrix),
      (4, 0), (4, 0))) // audio: zero visual dims
    val trak = box("trak", concat(tkhd, mdia))
    val moov = box("moov", concat(mvhdBox(sampleRate.toLong, duration), trak))
    concat(ftyp, mdat, moov)
  }

  /** The `jpeg` visual sample description (`stsd`). */
  private def stsdJpeg(width: Int, height: Int): Array[Byte] =
    full("stsd", 0, 0, concat(be((4, 1)),
      box("jpeg", be(
        (6, new Array[Byte](6)), (2, 1), // reserved + data_ref_index
        (2, 0), (2, 0), (4, 0), (4, 0), (4, 0), // predefined/reserved
        (2, width), (2, height),
        (4, 0x00480000), (4, 0x00480000), // 72 dpi
        (4, 0), (2, 1), // reserved, frame_count
        (32, new Array[Byte](32)), // compressorname
        (2, 24), (2, 0xFFFF))))) // depth, pre_defined = -1

  private def identityMatrix: Array[Byte] = be(
    (4, 0x00010000), (4, 0), (4, 0),
    (4, 0), (4, 0x00010000), (4, 0),
    (4, 0), (4, 0), (4, 0x40000000))

  private def mvhdBox(timescale: Long, duration: Long): Array[Byte] =
    full("mvhd", 0, 0, concat(be(
      (4, 0), (4, 0), (4, timescale), (4, duration),
      (4, 0x00010000), (2, 0x0100), (2, 0), (4, 0), (4, 0)),
      identityMatrix,
      be((4, 0), (4, 0), (4, 0), (4, 0), (4, 0), (4, 0), (4, 2))))

  /** `trak(tkhd, mdia(mdhd, hdlr vide, minf(vmhd, dinf, stbl)))`. */
  private def trakBox(width: Int, height: Int, timescale: Long,
      duration: Long, stbl: Array[Byte]): Array[Byte] = {
    val dinf = box("dinf", full("dref", 0, 0, concat(
      be((4, 1)), full("url ", 0, 1, Array.emptyByteArray))))
    val vmhd = full("vmhd", 0, 1, be((2, 0), (2, 0), (2, 0), (2, 0)))
    val minf = box("minf", concat(vmhd, dinf, stbl))
    val hdlr = full("hdlr", 0, 0, concat(
      be((4, 0), (4, "vide".getBytes("ISO-8859-1")), (4, 0), (4, 0), (4, 0)),
      "graft".getBytes("ISO-8859-1")))
    val mdhd = full("mdhd", 0, 0, be(
      (4, 0), (4, 0), (4, timescale), (4, duration),
      (2, 0x55C4), (2, 0))) // language "und"
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    val tkhd = full("tkhd", 0, 7, be(
      (4, 0), (4, 0), (4, 1), (4, 0), (4, duration), // times, id, dur
      (4, 0), (4, 0), (2, 0), (2, 0), (2, 0), (2, 0), // reserved/layer/volume
      (36, identityMatrix),
      (4, width << 16), (4, height << 16)))
    box("trak", concat(tkhd, mdia))
  }
}
