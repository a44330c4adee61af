package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VIDEO NEAR-DUPLICATE DEDUPLICATION — frame-sampled perceptual
  * matching: sample every `stride`-th frame, dHash each sampled frame
  * from REAL decoded pixels ([[ImageDedup.dHash64]] over
  * [[BmpCodec]]/[[PngCodec]]), block candidate pairs per (frame,
  * Hamming band), and verify by counting exactly-matching frames.
  * The published shape is frame-signature video copy detection (Wu,
  * Ngo & Hauptmann's near-duplicate video elimination: keyframe
  * perceptual signatures matched position-wise, pairs scored by the
  * fraction of matching keyframes); the per-frame fingerprint and
  * blocking engine are shared with [[ImageDedup]], so image, audio
  * and video dedup all ride ONE audited banded-join plan.
  *
  * Container: real video containers (MP4/MKV) need entropy decoders
  * no sane pipeline hand-rolls, so the container here is GVID — a
  * trivial length-prefixed frame list DEFINED by this module (magic,
  * frame count, then per frame: codec tag + byte length + the real
  * PNG/BMP payload). The container parse is a deterministic fake per
  * the multimodal brief; everything INSIDE it — pixel codecs, hashing,
  * blocking — is real and oracle-proven.
  *
  * Matching semantics: for a candidate pair, a sampled frame index
  * MATCHES iff both videos sampled it and the frame dHashes sit
  * within `maxHamming`; the pair is a near-dup iff at least
  * `minMatched` indices match. Per frame index the banded blocking is
  * pigeonhole-EXACT (same argument as the image operator), so the
  * match count — and therefore the emitted pair set — is exact, not
  * approximate.
  *
  * Scale: frame hashing is one narrow decode pass that explodes
  * `ceil(frames/stride)` small rows per video (the media-codec
  * mapPartitions seam); banding multiplies by 64/bandBits; the
  * self-join is hash-partitioned on (frame, band, value); the exact
  * re-check and match count run only on candidates. No driver state,
  * no cartesian — 100 TB of video flows through the same plan.
  */
object VideoDedup {

  private val Magic = 0x47564944 // "GVID"

  /** Serialize frames `(format, bytes)` into the GVID container. */
  def encodeGvid(frames: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(frames.nonEmpty, "a video needs at least one frame")
    val size = 8 + frames.map(5 + _._2.length).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(Magic).putInt(frames.length)
    frames.foreach { case (fmt, bytes) =>
      val tag: Byte = fmt match {
        case "bmp" => 0
        case "png" => 1
        case "jpeg" => 2 // Motion-JPEG shape: entropy-coded frames
        case other => throw new IllegalArgumentException(
          s"GVID carries real pixel codecs only; '$other' is not one")
      }
      buf.put(tag).putInt(bytes.length).put(bytes)
    }
    buf.array()
  }

  /** Parse a GVID container back into `(format, bytes)` frames. */
  def decodeGvid(bytes: Array[Byte]): Array[(String, Array[Byte])] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(buf.remaining() >= 8 && buf.getInt() == Magic, "not a GVID file")
    val n = buf.getInt()
    require(n > 0 && n <= buf.remaining() / 5,
      s"frame count $n inconsistent with ${buf.remaining()} payload bytes")
    Array.fill(n) {
      require(buf.remaining() >= 5,
        "truncated container: a frame header runs past the payload")
      val fmt = buf.get() match {
        case 0 => "bmp"
        case 1 => "png"
        case 2 => "jpeg"
        case t => throw new IllegalArgumentException(s"unknown codec tag $t")
      }
      val len = buf.getInt()
      require(len >= 0 && len <= buf.remaining(),
        s"frame length $len exceeds remaining ${buf.remaining()} bytes")
      val b = new Array[Byte](len); buf.get(b); (fmt, b)
    }
  }

  /** Per-sampled-frame dHashes over a media frame `(idCol, format,
    * bytes)`: one narrow decode pass emitting `(id, frame, h_hi,
    * h_lo)` for frame indices `0, stride, 2*stride, …`. Containers:
    * GVID, and ISO-BMFF MP4 carrying an MJPEG track
    * ([[Mp4Codec]] box walk → sample extraction → the same per-frame
    * [[JpegCodec]] decode — real files feed the existing shot chain
    * with no new pixel path). Anything else refuses loudly.
    */
  def frameHashDf(media: DataFrame, idCol: String, stride: Int): DataFrame = {
    require(stride >= 1, s"stride=$stride must be >= 1")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame", IntegerType, nullable = false),
      StructField("h_hi", LongType, nullable = false),
      StructField("h_lo", LongType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = media.schema.fieldIndex(idCol)
    val fmtIx = media.schema.fieldIndex("format")
    val bIx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val fmt = r.getString(fmtIx)
        val id = r.getLong(idIx)
        val frames: IndexedSeq[(String, Array[Byte])] = fmt match {
          case "gvid" => decodeGvid(r.getAs[Array[Byte]](bIx))
          case "mp4" =>
            val mp4 = Mp4Codec.decode(r.getAs[Array[Byte]](bIx))
            val t = mp4.mjpegTrack.getOrElse(
              throw new IllegalArgumentException(
                "mp4 carries no MJPEG (jpeg sample entry, vide handler) " +
                  "track to hash"))
            t.samples.iterator.map(("jpeg", _)).toIndexedSeq
          case other => throw new IllegalArgumentException(
            s"frame hashing needs a GVID or MP4 container; format " +
              s"'$other' is neither")
        }
        (0 until frames.length by stride).iterator.map { f =>
          val (w, h, px) = frames(f) match {
            case ("png", b) =>
              val img = PngCodec.decode(b); (img.width, img.height, img.pixels)
            case ("bmp", b) =>
              val img = BmpCodec.decode(b); (img.width, img.height, img.pixels)
            case ("jpeg", b) => // the Motion-JPEG path: real entropy decode
              val img = JpegCodec.decode(b); (img.width, img.height, img.pixels)
            case (other, _) => throw new IllegalArgumentException(
              s"unsupported frame codec '$other'") // unreachable past decodeGvid
          }
          val (hi, lo) = ImageDedup.dHash64(w, h, px)
          Row(id, f, hi, lo)
        }
      }
    }(enc)
  }

  /** Near-duplicate video pairs from per-frame fingerprints
    * `(idCol, frame, h_hi, h_lo)`: banded candidates PER FRAME INDEX,
    * exact popcount re-check, pairs scored by the count of matching
    * indices. Emits `(id_a, id_b, n_matched, n_common)` for pairs with
    * `n_matched >= minMatched`, where `n_common` counts frame indices
    * sampled by both sides (the denominator for a match-fraction cut).
    * `maxHamming < 64/bandBits` keeps the per-frame pigeonhole exact,
    * which makes the match COUNT exact too.
    */
  def nearDupPairs(frameHashes: DataFrame, idCol: String, maxHamming: Int,
      minMatched: Int, bandBits: Int = 16,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    ImageDedup.requireExactPigeonhole(maxHamming, bandBits)
    require(minMatched >= 1, s"minMatched=$minMatched must be >= 1")
    // the shared blocking engine, with the frame index carried through
    // as an extra join key (candidates must collide at the SAME
    // sampled position); the bucket cap ([[ImageDedup.capBuckets]],
    // off by default) is keyed per (frame, band, bv) — an adversarial
    // corpus of black frames cannot quadratic a position's bucket
    val bands = ImageDedup.capBuckets(
      ImageDedup.bandExploded(
        frameHashes.select(col(idCol), col("frame"), col("h_hi"),
          col("h_lo")), bandBits),
      maxBucketSize, "frame", "band", "bv")
    val a = bands.select(col(idCol).as("id_a"), col("frame"),
      col("h_hi").as("hia"), col("h_lo").as("loa"), col("band"), col("bv"))
    val b = bands.select(col(idCol).as("id_b"), col("frame"),
      col("h_hi").as("hib"), col("h_lo").as("lob"), col("band"), col("bv"))
    // exact per-frame matches: candidates share a band value AT THE
    // SAME sampled index, re-checked by full popcount
    val matched = a.join(b, Seq("frame", "band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "frame", "hia", "loa", "hib", "lob")
      .distinct() // frames agreeing on several bands match once
      .filter(
        (bit_count(col("hia").bitwiseXOR(col("hib"))) +
          bit_count(col("loa").bitwiseXOR(col("lob")))) <= maxHamming)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("n_matched"))
      .filter(col("n_matched") >= minMatched)
    // denominator: indices sampled by both sides — computed only for
    // surviving pairs (broadcast-sized after the minMatched cut)
    val perIdx = frameHashes.select(col(idCol), col("frame"))
    val common = matched.select("id_a", "id_b")
      .join(perIdx.select(col(idCol).as("id_a"), col("frame")), Seq("id_a"))
      .join(perIdx.select(col(idCol).as("id_b"), col("frame")),
        Seq("id_b", "frame"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("n_common"))
    matched.join(common, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("n_matched"), col("n_common"))
  }

  /** Frame rows with their shot id — the shared cut-detection half of
    * [[shots]] and [[shotSignatures]]: ONE window spec computes the
    * lag distances, cut indicators and the prefix-sum shot ids
    * (partitioned by video, one exchange + per-partition sort total).
    */
  private def withShotIdx(frameHashes: DataFrame, idCol: String,
      cutHamming: Int): DataFrame = {
    require(cutHamming >= 1 && cutHamming <= 64,
      s"cutHamming=$cutHamming must be in [1, 64]")
    import org.apache.spark.sql.expressions.Window
    val perVideo = Window.partitionBy(col(idCol)).orderBy(col("frame"))
    // cut indicator per frame: 1 iff this frame starts a new shot
    // (distance to its predecessor > threshold); the first sampled
    // frame starts shot 1
    frameHashes
      .select(col(idCol), col("frame"), col("h_hi"), col("h_lo"))
      .withColumn("phi", lag(col("h_hi"), 1).over(perVideo))
      .withColumn("plo", lag(col("h_lo"), 1).over(perVideo))
      .withColumn("cut",
        when(col("phi").isNull, lit(1))
          .when((bit_count(col("h_hi").bitwiseXOR(col("phi"))) +
            bit_count(col("h_lo").bitwiseXOR(col("plo")))) > cutHamming,
            lit(1))
          .otherwise(lit(0)))
      .withColumn("shot_idx", sum(col("cut")).over(perVideo).cast("long"))
  }

  /** SHOT-BOUNDARY DETECTION (temporal segmentation): the classic
    * frame-difference formulation — a CUT lies between consecutive
    * frames whose perceptual distance exceeds a threshold; maximal
    * runs between cuts are SHOTS. Here the frame difference is the
    * dHash Hamming distance (the same fingerprint the dedup and k-NN
    * operators use) against the PREVIOUS SAMPLED frame, taken with
    * `lag` over the per-video frame order; a prefix sum over the same
    * window turns cut indicators into shot ids. The shot table is
    * what per-scene downstream work (keyframe extraction, captioning)
    * consumes — the video analog of the audio segmenter.
    *
    * Scale: ONE window spec does everything ([[withShotIdx]]) — lag
    * and prefix sum share a single exchange + per-partition sort,
    * partitioned BY VIDEO (thousands of frames each, millions of
    * videos — maximal parallelism, no global sort, and no self-join
    * re-reading the frame table). Because the predecessor is the
    * previous SAMPLED frame, strided frame tables segment the sampled
    * sequence instead of degenerating. Emits `(id, shot_idx,
    * start_frame, end_frame, n_frames)`, shot_idx 1-based.
    */
  def shots(frameHashes: DataFrame, idCol: String,
      cutHamming: Int): DataFrame =
    withShotIdx(frameHashes, idCol, cutHamming)
      .groupBy(col(idCol), col("shot_idx"))
      .agg(min("frame").cast("long").as("start_frame"),
        max("frame").cast("long").as("end_frame"),
        count(lit(1)).cast("long").as("n_frames"))

  /** One signature per detected shot: the shot's FIRST frame's dHash
    * (the canonical keyframe signature — deterministic, and for any
    * within-shot-stable content representative of the whole shot).
    * Emits `(id, shot_idx, start_frame, h_hi, h_lo)` — the unit table
    * [[SignatureDedup.nearDupPairsBySignature]] consumes for
    * ALIGNMENT-ROBUST video near-dup: shot boundaries re-detect
    * relative to the content itself, so a trimmed copy's surviving
    * shots keep their signatures even though every absolute frame
    * index shifted (the case the frame-index matcher
    * [[nearDupPairs]] provably misses).
    *
    * Scale: rides [[withShotIdx]]'s single per-video window, then one
    * hash-agg with `min_by` picking the keyframe hash — no self-join
    * back onto the frame table.
    */
  def shotSignatures(frameHashes: DataFrame, idCol: String,
      cutHamming: Int): DataFrame =
    withShotIdx(frameHashes, idCol, cutHamming)
      .groupBy(col(idCol), col("shot_idx"))
      .agg(min("frame").cast("long").as("start_frame"),
        min_by(col("h_hi"), col("frame")).as("h_hi"),
        min_by(col("h_lo"), col("frame")).as("h_lo"))

  /** Deterministic synthetic SHOT corpus for the oracle-gated shots
    * query: `12 + g%3` frames per video, shot changes at frames 4 and
    * 9 — within a shot frames are BIT-IDENTICAL (distance 0), across a
    * cut the gradient directions re-roll entirely (the edited-frame
    * rule keyed by the shot index), so distances are large and the
    * spec can pin cuts exactly at {4, 9}. Even ids encode PNG, odd
    * BMP.
    */
  def syntheticShotVideos(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIx)
        val g = id
        val nFrames = (12 + g % 3).toInt
        val cw = (2 + g % 3).toInt; val ch = (2 + g % 2).toInt
        val w = 9 * cw; val h = 8 * ch
        val frames = (0 until nFrames).map { f =>
          val s = (if (f >= 4) 1 else 0) + (if (f >= 9) 1 else 0)
          def rgbAt(x: Int, y: Int): (Int, Int, Int) = {
            val cx = x / cw; val cy = y / ch
            val p = (((cx * (7 + (g + s) % 5) + cy * (13 + (g + s) % 11) +
              (g + s * 7) * 31) % 17) * 15).toInt
            (p, (p + 60) % 256, (p + 120) % 256)
          }
          if (g % 2 == 0)
            ("png", PngCodec.encodeRgb8(w, h, rgbAt, filterForRow = y => y % 5))
          else
            ("bmp", BmpCodec.encode24(w, h, rgbAt))
        }
        Row(id, "gvid", encodeGvid(frames))
      }
    }(enc)
  }

  /** Deterministic TRIMMED-VARIANT shot corpus for the oracle-gated
    * alignment-robust query: a group (`g = id / 4`) shares a 4-shot
    * MASTER video (every shot `3 + g%3` frames of bit-identical
    * cell-constant content, directions re-rolled per shot — the
    * [[syntheticShotVideos]] construction); variant `v = id % 4` DROPS
    * the first `v` shots. Uniform per-video shot length makes every
    * trim offset a MULTIPLE of the shot length, so two variants never
    * show the same master shot at the same absolute frame index —
    * [[nearDupPairs]] (same-index matching) misses EVERY within-group
    * pair, provably, while shot-signature matching finds the
    * overlaps (a draft with per-shot lengths `3 + (g+s)%3` left long
    * later shots partially overlapping at the same indices, and the
    * frame matcher caught one-shot trims). Variants additionally
    * perturb the rightmost cell column for `cy < v` with a
    * v-independent formula, so two variants' common shots sit within
    * `|v_a - v_b| <= 3` Hamming bits (true NEAR-dups, the image
    * generator's construction): variants `(v_a, v_b)` share the
    * `4 - max(v_a, v_b)` trailing master shots. Even groups encode
    * PNG, odd BMP.
    */
  def syntheticTrimmedShotVideos(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIx)
        val g = id / 4; val v = (id % 4).toInt
        val cw = (2 + g % 3).toInt; val ch = (2 + g % 2).toInt
        val w = 9 * cw; val h = 8 * ch
        val frames = (v to 3).flatMap { s =>
          // pattern key = the globally-unique MASTER shot id, driving
          // the gradient DIRECTIONS through multiplicative
          // permutations. Two drafts of this rule degenerated: the
          // image generators' ((linear) % 17)*15 family collapses the
          // hash space to four mod-17 residues (thousands of
          // distance-0 collisions between unrelated shots at sf0.01),
          // and fixed directions with only an m-dependent OFFSET make
          // content periodic in m mod the cell modulus (identical
          // shots every 251 master ids — quadratic pair blowup at
          // sf0.1). m*K % 65521 is a PERMUTATION of m for every K
          // coprime to the prime 65521 (injective beyond sf1's id
          // range), so the three direction residues are jointly
          // collision-free at any test scale and unrelated shots land
          // effectively independent 64-bit hashes. Pure integer closed
          // form — the oracle replays it verbatim.
          // two structural rules, both learned by measuring collisions:
          // (1) the cx² term varies the step INSIDE each row — without
          // it rows are constant-step progressions mod 251 whose
          // gradient bits are ~256 possible wrap patterns, and
          // unrelated shots collided within 3 bits at ~1.4e-3 per unit
          // pair; (2) each coefficient gets its OWN coprime modulus —
          // any polynomial in m mod n is PERIODIC in m with period n,
          // so a shared modulus made shots at m and m+250 near-twins
          // (449 cross-group distance-0 pairs at sf0.01); with four
          // coprime moduli the joint coefficient period is ~7.7e11,
          // unique at any test scale. Pure integer closed form — the
          // oracle replays it verbatim.
          val m = g * 4 + s
          def rgbAt(x: Int, y: Int): (Int, Int, Int) = {
            val cx = x / cw; val cy = y / ch
            val base = ((cx * (1 + (m * m + m * 131) % 241) +
              cy * (1 + (m * m * 3 + m * 137) % 239) +
              cx * cy * (1 + (m * m * 7 + m * 139) % 233) +
              cx * cx * (1 + (m * m * 11 + m * 149) % 229) + m) % 251).toInt
            // the variant perturbation is keyed by cy ONLY (not v), so
            // two variants' common shots differ in exactly the cells
            // cy in [min(va,vb), max(va,vb)) — each in ONE gradient
            // comparison — bounding their signature distance by 3
            val p = if (cx == 8 && cy < v) ((base + 40 * (cy + 1)) % 256).toInt
              else base
            (p, (p + 60) % 256, (p + 120) % 256)
          }
          val nFrames = (3 + g % 3).toInt
          val frame =
            if (g % 2 == 0)
              ("png", PngCodec.encodeRgb8(w, h, rgbAt, filterForRow = y => y % 5))
            else
              ("bmp", BmpCodec.encode24(w, h, rgbAt))
          Seq.fill(nFrames)(frame) // within a shot, frames bit-identical
        }
        Row(id, "gvid", encodeGvid(frames))
      }
    }(enc)
  }

  /** [[syntheticTrimmedShotVideos]] carried through the LOSSY codec —
    * the Motion-JPEG corpus for the oracle-gated
    * `video_dedup_shots_jpeg` query: the same 4-shot master / v-trim
    * group structure and coprime-moduli content rule, but GRAY cells
    * sized in multiples of 8 (cw ∈ {8,16}, ch = 8 — cell boundaries
    * land on JPEG block boundaries, so every block is constant and
    * decodes on the DC closed form `dec(p)`), every frame encoded
    * baseline 4:2:0 JFIF. The oracle replays the full
    * generate→ENCODE→DECODE→shot-detect→signature→match chain with
    * one extra `dec()` wrap over the cell values; quantization
    * collapses only adjacent (odd, even) value pairs, so the ±40·k
    * perturbation structure — and the within-group distance <= 3
    * contract — survives the loss.
    */
  def syntheticTrimmedShotVideosJpeg(
      ids: DataFrame, idCol: String): DataFrame =
    trimmedShotJpegCorpus(ids, idCol, mp4 = false)

  /** [[syntheticTrimmedShotVideosJpeg]]'s frames in a REAL ISO-BMFF
    * container instead of GVID — the `video_dedup_mp4` corpus. EVEN
    * ids pack as plain MP4 ([[Mp4Codec.encodeMjpeg]], two-chunk
    * stsc/stsz/stco layout); ODD ids as FRAGMENTED MP4
    * ([[Mp4Codec.encodeMjpegFragmented]], moof/traf/trun segments) —
    * so one query proves BOTH sample-table protocols. Same ids →
    * bit-identical frame bytes, so the query shares the GVID twin's
    * oracle: the hash match is the container-parse proof (the only
    * thing that differs is the packaging).
    */
  def syntheticTrimmedShotVideosMp4(
      ids: DataFrame, idCol: String): DataFrame =
    trimmedShotJpegCorpus(ids, idCol, mp4 = true)

  /** The shared trimmed-shot MJPEG frame rule (scaladoc above), packed
    * in either container.
    */
  private def trimmedShotJpegCorpus(
      ids: DataFrame, idCol: String, mp4: Boolean): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIx)
        val g = id / 4; val v = (id % 4).toInt
        val cw = (8 * (1 + g % 2)).toInt; val ch = 8
        val w = 9 * cw; val h = 8 * ch
        val frames = (v to 3).flatMap { s =>
          val m = g * 4 + s
          def grayAt(x: Int, y: Int): Int = {
            val cx = x / cw; val cy = y / ch
            val base = ((cx * (1 + (m * m + m * 131) % 241) +
              cy * (1 + (m * m * 3 + m * 137) % 239) +
              cx * cy * (1 + (m * m * 7 + m * 139) % 233) +
              cx * cx * (1 + (m * m * 11 + m * 149) % 229) + m) % 251).toInt
            if (cx == 8 && cy < v) ((base + 40 * (cy + 1)) % 256).toInt
            else base
          }
          val nFrames = (3 + g % 3).toInt
          val frame = JpegCodec.encode420(w, h, (x, y) => {
            val p = grayAt(x, y); (p, p, p)
          })
          Seq.fill(nFrames)(frame) // within a shot, frames bit-identical
        }
        if (mp4 && id % 2 == 1)
          Row(id, "mp4", Mp4Codec.encodeMjpegFragmented(frames, w, h))
        else if (mp4) Row(id, "mp4", Mp4Codec.encodeMjpeg(frames, w, h))
        else Row(id, "gvid", encodeGvid(frames.map(("jpeg", _))))
      }
    }(enc)
  }

  /** Deterministic synthetic video corpus for the oracle-gated query
    * (testdata carries no real video assets): id → a GVID clip of
    * `8 + g%3` frames of cell-constant images following the
    * [[ImageDedup.syntheticImages]] closed-form rule with the FRAME
    * INDEX mixed into the gradient, so the oracle replays
    * decode→downsample→hash per frame in SQL.
    *
    * Near-dup structure: ids group by `id / 4`; variant `v = id % 4`
    * REPLACES the content of frames `f < v` (a re-rolled gradient —
    * edited intro frames, the classic near-dup video case); frames
    * `f >= v` are bit-identical across the group. Two variants of one
    * group therefore agree on every sampled frame except those in
    * `[min(v_a,v_b), max(v_a,v_b))` — at stride 2 that is at most 2
    * indices, so within-group pairs match on all but <= 2 sampled
    * frames (the recall contract the spec pins). Even groups encode
    * PNG frames, odd groups BMP — both real codecs sit inside the
    * hash path.
    */
  def syntheticVideos(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIx)
        val g = id / 4; val v = (id % 4).toInt
        val nFrames = (8 + g % 3).toInt
        val cw = (2 + g % 3).toInt; val ch = (2 + g % 2).toInt
        val w = 9 * cw; val h = 8 * ch
        val frames = (0 until nFrames).map { f =>
          val edited = f < v
          def rgbAt(x: Int, y: Int): (Int, Int, Int) = {
            val cx = x / cw; val cy = y / ch
            // edited frames re-roll the gradient directions entirely
            // (replaced content), unedited frames mix f in linearly
            val p =
              if (edited)
                (((cx * (11 + g % 3) + cy * (5 + g % 13) + f * 7 + g * 19)
                  % 17) * 15).toInt
              else
                (((cx * (7 + g % 5) + cy * (13 + g % 11) + f * 19 + g * 31)
                  % 17) * 15).toInt
            (p, (p + 60) % 256, (p + 120) % 256)
          }
          if (g % 2 == 0)
            ("png", PngCodec.encodeRgb8(w, h, rgbAt, filterForRow = y => y % 5))
          else
            ("bmp", BmpCodec.encode24(w, h, rgbAt))
        }
        Row(id, "gvid", encodeGvid(frames))
      }
    }(enc)
  }
}
