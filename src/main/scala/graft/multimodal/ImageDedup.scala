package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IMAGE NEAR-DUPLICATE DEDUPLICATION — perceptual difference-hash
  * (dHash, the published 9×8 gradient fingerprint) computed from REAL
  * decoded pixels ([[BmpCodec]]/[[PngCodec]]), paired by Hamming-band
  * blocking. The first MULTIMODAL dedup operator: the same
  * banded-equi-join scale shape as SimHash text dedup, driven by
  * pixels instead of shingles.
  *
  * dHash (Krawetz's published algorithm): grayscale the image,
  * downsample to a 9×8 grid (nearest neighbor, `floor(i*src/dst)` —
  * the codecs' own resample rule), set bit `row*8 + col` iff
  * `gray(col) > gray(col+1)` in that row — 8 comparisons per row × 8
  * rows = a 64-bit fingerprint robust to scaling and brightness-
  * preserving re-encodes. Carried as TWO 32-bit halves in BIGINTs
  * (`h_hi`, `h_lo`) so every downstream step — banding, XOR popcount —
  * is plain non-negative int64 arithmetic, identical in Spark and the
  * DuckDB oracle (a single int64 would put bit 63 in the sign).
  *
  * Pairing: the 64 bits split into `64/bandBits` bands; candidates
  * share at least one (band, value) — an EQUI-join, never all-pairs.
  * Pigeonhole makes the blocking EXACT for `maxHamming < bands`:
  * fewer differing bits than bands forces one band equal, so no true
  * pair is missed (same argument as SimHash's 4-chunk split).
  *
  * Band width IS the scale knob — selectivity per band is
  * `2^bandBits`: 8-bit bands admit threshold 7 but hash random
  * fingerprints into only 256 buckets per band (candidate volume
  * ~N²/32 — quadratic at a billion images); 16-bit bands cap the
  * threshold at 3 but give 65,536-way selectivity (~N²/16k) — the
  * REGISTERED 100 TB configuration, the standard multi-index-hashing
  * trade (Norouzi et al.; systems needing both high threshold AND
  * selectivity move to longer perceptual hashes, e.g. 256-bit PDQ
  * with 16-bit bands, which is this same plan with 16 bands).
  *
  * Scale: hashing is one narrow decode pass (the documented
  * mapPartitions media-codec seam); banding explodes `bands` small
  * rows per image; the self-join is hash-partitioned on (band,
  * value); exact Hamming re-check runs only on candidates. 100 TB of
  * images flows through the same plan — no driver state, no
  * cartesian.
  */
object ImageDedup {

  /** BT.601-ish integer grayscale used on both sides (no floats —
    * the oracle must replay bit-for-bit): `(77r + 150g + 29b) >> 8`.
    */
  def grayOf(rgb: Int): Int =
    (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
      29 * (rgb & 0xff)) >> 8

  /** 64-bit dHash of decoded pixels as (hi32, lo32). */
  def dHash64(width: Int, height: Int, pixels: Array[Int]): (Long, Long) = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad image ${width}x$height with ${pixels.length} px")
    val gray = Array.ofDim[Int](8, 9)
    var cy = 0
    while (cy < 8) {
      val sy = (cy.toLong * height / 8).toInt
      var cx = 0
      while (cx < 9) {
        val sx = (cx.toLong * width / 9).toInt
        gray(cy)(cx) = grayOf(pixels(sy * width + sx))
        cx += 1
      }
      cy += 1
    }
    var hi = 0L; var lo = 0L
    cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (gray(cy)(cx) > gray(cy)(cx + 1)) {
          val j = cy * 8 + cx
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        }
        cx += 1
      }
      cy += 1
    }
    (hi, lo)
  }

  /** The shared pixel-decode seam of both fingerprint passes: only
    * the real pixel codecs are decodable; anything else refuses loudly
    * rather than fingerprinting undecoded bytes.
    */
  private def decodePixels(fmt: String,
      bytes: Array[Byte]): (Int, Int, Array[Int]) = fmt match {
    case "png" =>
      val img = PngCodec.decode(bytes); (img.width, img.height, img.pixels)
    case "bmp" =>
      val img = BmpCodec.decode(bytes); (img.width, img.height, img.pixels)
    case "jpeg" | "jpg" =>
      val img = JpegCodec.decode(bytes); (img.width, img.height, img.pixels)
    case other => throw new IllegalArgumentException(
      s"dHash needs decoded pixels; format '$other' is not a " +
        "supported pixel codec")
  }

  /** dHash over a media frame `(idCol, format, bytes)`: one narrow
    * decode→hash pass (the media-codec mapPartitions seam — constant
    * memory, partitioning preserved).
    */
  def dHashDf(media: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("h_hi", LongType, nullable = false),
      StructField("h_lo", LongType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = media.schema.fieldIndex(idCol)
    val fmtIx = media.schema.fieldIndex("format")
    val bIx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) =
          decodePixels(r.getString(fmtIx), r.getAs[Array[Byte]](bIx))
        val (hi, lo) = dHash64(w, h, px)
        Row(r.getLong(idIx), hi, lo)
      }
    }(enc)
  }

  /** Validates the exact-pigeonhole contract shared by every 64-bit
    * Hamming-band blocking join: `64/bandBits` bands, candidate
    * recall is exact only for `maxHamming < bands`.
    */
  private[graft] def requireExactPigeonhole(
      maxHamming: Int, bandBits: Int): Unit = {
    require(bandBits == 8 || bandBits == 16,
      s"bandBits=$bandBits: the 32-bit halves split evenly at 8 or 16")
    val nBands = 64 / bandBits
    require(maxHamming >= 0 && maxHamming < nBands,
      s"maxHamming=$maxHamming: the $nBands-band pigeonhole is exact " +
        s"only for thresholds < $nBands")
  }

  /** Explodes `64/bandBits` (band, bv) rows per fingerprint — the
    * blocking half every 64-bit Hamming dedup shares (image, audio,
    * video). All input columns are carried through, so callers can
    * thread extra join keys (e.g. the video frame index) alongside
    * `(h_hi, h_lo)`.
    */
  private[graft] def bandExploded(
      hashes: DataFrame, bandBits: Int): DataFrame = {
    val nBands = 64 / bandBits
    val perHalf = 32 / bandBits
    val mask = (1L << bandBits) - 1
    val bvals = array((0 until nBands).map { k =>
      val half = if (k < perHalf) col("h_lo") else col("h_hi")
      struct(lit(k).as("band"),
        shiftright(half, bandBits * (k % perHalf)).bitwiseAND(lit(mask))
          .as("bv"))
    }: _*)
    val carried = hashes.columns.map(col).toSeq
    hashes
      .select(carried :+ explode(bvals).as("b"): _*)
      .select(carried :+ col("b.band").as("band") :+ col("b.bv").as("bv"): _*)
  }

  /** Drops every blocking bucket larger than `cap` from exploded band
    * rows — [[graft.dedup.MinHashLSH]]'s `maxBucketSize` recall trade
    * brought to Hamming blocking: an ADVERSARIAL real-world corpus
    * (flat images, black frames, silence) can put millions of
    * fingerprints into one (band, value) bucket, and a banded
    * self-join is quadratic IN THE BUCKET — the cap bounds every
    * bucket's pair contribution at `cap²` for a documented recall
    * trade (members of an over-cap bucket skip blocking on that band;
    * they can still pair through their other, unskewed bands, and a
    * bucket past the cap is near-certainly a degenerate-content
    * cluster, not a near-dup FRONTIER). The window's partitionBy is
    * exactly the join's distribution, so Catalyst reuses the exchange
    * (one shuffle total — the MinHashLSH plan shape). `cap =
    * Int.MaxValue` (the default everywhere) applies no window at all:
    * plans and results of the exact-pigeonhole configurations are
    * unchanged. `keys` are the bucket identity columns (video threads
    * `frame` through).
    *
    * CHOOSING a production cap — the worked default: under 16-bit
    * bands a non-degenerate corpus spreads ~uniformly, so the expected
    * bucket load is `L = N / 65536` fingerprints per (band, value)
    * (per extra key value for video/audio — N there is units per
    * frame/position). Set `cap ≈ 100·L` (min a few hundred): two
    * orders of magnitude above the expected load only ever trips on
    * degenerate content (flat images, silence, black frames) — which
    * upstream exact dedup should have collapsed anyway — while
    * bounding the worst bucket's pair contribution at `cap²` ≈ 10⁴·L²
    * instead of the flood's unbounded quadratic. Worked: N = 10⁹
    * images → L ≈ 15k → cap ≈ 1.5M is still too permissive to matter;
    * N = 10⁶ per shuffle partition of a banded join → L ≈ 15 → cap ≈
    * 1500. Size it off the JOIN's N (what one bucket can actually
    * collect), re-derive when N grows 10×, and treat every cap trip as
    * a data-quality signal to investigate, not noise.
    */
  private[graft] def capBuckets(bands: DataFrame, cap: Int,
      keys: String*): DataFrame =
    if (cap == Int.MaxValue) bands
    else {
      require(cap >= 1, s"maxBucketSize=$cap must be >= 1")
      import org.apache.spark.sql.expressions.Window
      bands
        .withColumn("bsz",
          count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
        .filter(col("bsz") <= cap)
        .drop("bsz")
    }

  /** Near-duplicate pairs among `(idCol, h_hi, h_lo)` fingerprints:
    * Hamming-banded candidate join + exact popcount re-check.
    * `maxHamming < 64/bandBits` keeps the pigeonhole exact; see the
    * object doc for the band-width selectivity trade (16-bit bands are
    * the registered billion-image configuration). `maxBucketSize`
    * bounds hot blocking buckets ([[capBuckets]] — a recall trade,
    * OFF by default so the pigeonhole exactness contract holds).
    */
  def nearDupPairs(hashes: DataFrame, idCol: String,
      maxHamming: Int, bandBits: Int = 16,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    requireExactPigeonhole(maxHamming, bandBits)
    val bands = capBuckets(
      bandExploded(hashes.select(col(idCol), col("h_hi"),
        col("h_lo")), bandBits),
      maxBucketSize, "band", "bv")
    val a = bands.select(col(idCol).as("id_a"), col("h_hi").as("hia"),
      col("h_lo").as("loa"), col("band"), col("bv"))
    val b = bands.select(col(idCol).as("id_b"), col("h_hi").as("hib"),
      col("h_lo").as("lob"), col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "hia", "loa", "hib", "lob")
      .distinct() // images sharing several bands pair once
      .withColumn("hamming",
        (bit_count(col("hia").bitwiseXOR(col("hib"))) +
          bit_count(col("loa").bitwiseXOR(col("lob")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** 256-BIT dHash — the documented scale path for workloads needing
    * a HIGH Hamming threshold AND high band selectivity at once (the
    * 64-bit hash caps the exact threshold at 3 under 16-bit bands;
    * production image-matching systems use 256-bit perceptual hashes
    * — Facebook's PDQ is the published example — for exactly this
    * reason). Grid: 16 rows × 17 columns, one 16-bit limb per row
    * (`bit c` iff `gray(c) > gray(c+1)`), fingerprint = 16 limbs.
    *
    * The limb IS the band: 16 bands × 16 bits by construction, so the
    * pigeonhole admits thresholds up to 15 at 65,536-way selectivity
    * per band. Banding is `posexplode` of the limb array — no halves,
    * no shift/mask — and the exact Hamming verify is a RELATIONAL
    * re-join of the two candidates' limb rows summed per pair (16
    * small rows each; stays in codegen, no array lambdas).
    */
  def dHash256(width: Int, height: Int, pixels: Array[Int]): Array[Long] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad image ${width}x$height with ${pixels.length} px")
    val gray = Array.ofDim[Int](16, 17)
    var cy = 0
    while (cy < 16) {
      val sy = (cy.toLong * height / 16).toInt
      var cx = 0
      while (cx < 17) {
        val sx = (cx.toLong * width / 17).toInt
        gray(cy)(cx) = grayOf(pixels(sy * width + sx))
        cx += 1
      }
      cy += 1
    }
    val limbs = new Array[Long](16)
    cy = 0
    while (cy < 16) {
      var limb = 0L
      var cx = 0
      while (cx < 16) {
        if (gray(cy)(cx) > gray(cy)(cx + 1)) limb |= 1L << cx
        cx += 1
      }
      limbs(cy) = limb
      cy += 1
    }
    limbs
  }

  /** [[dHash256]] over a media frame `(idCol, format, bytes)`: emits
    * `(idCol, fp array<bigint>)` — same decode seam and refusal
    * contract as [[dHashDf]].
    */
  def dHash256Df(media: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("fp", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = media.schema.fieldIndex(idCol)
    val fmtIx = media.schema.fieldIndex("format")
    val bIx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) =
          decodePixels(r.getString(fmtIx), r.getAs[Array[Byte]](bIx))
        Row(r.getLong(idIx), dHash256(w, h, px))
      }
    }(enc)
  }

  /** Packs the 16 × 16-bit limb array into four BIGINTs (4 limbs
    * each, limb `4k+j` at bit `16j` of word `k`): XOR + popcount over
    * the packed words IS the 256-bit Hamming distance, so candidate
    * verification needs no relational limb re-join — the words ride
    * the banded exchange like the 64-bit operator's (h_hi, h_lo). The
    * top limb of word 3 can set bit 63 (a negative BIGINT); XOR and
    * popcount are bit-level, so the sign is irrelevant.
    */
  private[graft] def packedWords256(
      fpCol: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    (0 until 4).map { k =>
      (0 until 4).map { j =>
        shiftleft(element_at(fpCol, k * 4 + j + 1), 16 * j)
      }.reduce(_.bitwiseOR(_))
    }

  private[graft] def packedFp256(fpCol: org.apache.spark.sql.Column,
      prefix: String = "p"): Seq[org.apache.spark.sql.Column] =
    packedWords256(fpCol).zipWithIndex.map { case (c, k) => c.as(s"$prefix$k") }

  private[graft] def packedHamming(
      a: Seq[org.apache.spark.sql.Column],
      b: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    (0 until 4).map(k => bit_count(a(k).bitwiseXOR(b(k))))
      .reduce(_ + _).cast("long")

  /** Near-duplicate pairs among 256-bit fingerprints `(idCol, fp)`:
    * limb-band blocking (pigeonhole-exact for `maxHamming < 16`) +
    * exact-Hamming verify over the PACKED fingerprint (four BIGINT
    * words carried through the banded join — the 64-bit operator's
    * plan shape). The previous relational verify re-joined both
    * sides' 16 limb rows per candidate (two joins + an aggregate,
    * 16× the candidate volume through two exchanges); carrying 32
    * bytes per band row instead removes those joins outright
    * (optimization guide §2.3-2.4: shuffle a few extra bytes to
    * delete whole exchanges). The higher admissible threshold is
    * paid for in candidate volume — 16 bands at 65,536-way
    * selectivity is ~4× the 64-bit operator's blocking cost, the
    * standard long-hash trade.
    */
  def nearDupPairs256(hashes: DataFrame, idCol: String,
      maxHamming: Int, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16,
      s"maxHamming=$maxHamming: the 16-limb pigeonhole is exact only " +
        "for thresholds < 16")
    val limbs = hashes.select(
      (col(idCol) +: packedFp256(col("fp"))) :+
        posexplode(col("fp")).as(Seq("band", "bv")): _*)
    // the cap applies to CANDIDATE GENERATION only; the packed words
    // are the whole uncapped fingerprint, so every emitted distance
    // stays the exact 256-bit Hamming distance
    val blocked = capBuckets(limbs, maxBucketSize, "band", "bv")
    def side(tag: String) = blocked.select(
      col(idCol).as(s"id_$tag") +:
        (0 until 4).map(k => col(s"p$k").as(s"p$k$tag")) :+
        col("band") :+ col("bv"): _*)
    side("a").join(side("b"), Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(Seq(col("id_a"), col("id_b")) ++
        (0 until 4).map(k => col(s"p${k}a")) ++
        (0 until 4).map(k => col(s"p${k}b")): _*)
      .distinct() // fingerprints sharing several bands pair once
      .withColumn("hamming", packedHamming(
        (0 until 4).map(k => col(s"p${k}a")),
        (0 until 4).map(k => col(s"p${k}b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Deterministic 17×16-cell synthetic corpus for the 256-bit query:
    * the [[syntheticImages]] construction on the wider grid, with a
    * near-dup structure that EXERCISES the high threshold — variant
    * `v = id % 4` perturbs the last column's cells in rows
    * `cy < 3v`, each sitting in exactly one gradient comparison, so
    * within-group distances are bounded by 9: inside the 16-limb
    * pigeonhole's exactness but far beyond the 64-bit operator's
    * threshold-3 ceiling.
    */
  def syntheticImages256(ids: DataFrame, idCol: String): DataFrame = {
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
        val w = 17 * cw; val h = 16 * ch
        def rgbAt(x: Int, y: Int): (Int, Int, Int) = {
          val cx = x / cw; val cy = y / ch
          // the cx*cy cross-term matters at the LIMB level: without it
          // each row's 16-bit gradient pattern collapsed to ~1,462
          // distinct (band, value) pairs corpus-wide, so the banded
          // join degenerated into hot buckets (2.1M candidate pairs
          // from 5k images at sf0.1 — the 64-bit generator's
          // "gradient directions" lesson, one level up). With it the
          // per-band value space spreads ~6k-wide and candidates stay
          // pair-sparse.
          val base =
            (((cx * (7 + g % 5) + cy * (13 + g % 11) +
              cx * cy * (3 + g % 7) + g * 31) % 17) * 15).toInt
          val p =
            if (cx == 16 && cy < 3 * v)
              ((base + 40 * (cy + 1)) % 256).toInt
            else base
          (p, (p + 60) % 256, (p + 120) % 256)
        }
        if (g % 2 == 0)
          Row(id, "png",
            PngCodec.encodeRgb8(w, h, rgbAt, filterForRow = y => y % 5))
        else
          Row(id, "bmp", BmpCodec.encode24(w, h, rgbAt))
      }
    }(enc)
  }

  /** Deterministic synthetic JPEG corpus for the oracle-gated
    * `image_dedup_jpeg` query — [[syntheticImages]]' construction
    * carried through the LOSSY codec: cells are sized in multiples of
    * 8 (`cw ∈ {8,16,24}`, `ch ∈ {8,16}`), so every 8×8 JPEG block is
    * CONSTANT (cell boundaries land on block boundaries; the encoder's
    * edge-replicated MCU padding extends the last cell, so padded
    * blocks stay constant too) and every block quantizes on the DC
    * closed form. Content is GRAY (r = g = b = p): the fixed-point
    * color matrices then put chroma at exactly 128 through the whole
    * 4:2:0 encode→decode chain, so the decoded pixel is
    * `dec(p) = min(255, 2·((p+1) div 2))` ([[JpegCodec]] doc) and the
    * oracle replays generate→ENCODE→DECODE→downsample→hash fully in
    * SQL — Huffman tables, bit stuffing, DC prediction, the IDCT: all
    * proven by the hash match. The dHash grid samples cell corners
    * (dims are 9cw × 8ch), and `dec` collapses only ADJACENT values
    * (odd p joins p+1) while cell values step in ±40·k mod 256, so
    * the perturbation structure (variant v = id%4 perturbs the
    * rightmost column's first v cells → within-group distance <= 3)
    * survives quantization.
    */
  def syntheticImagesJpeg(ids: DataFrame, idCol: String): DataFrame =
    syntheticImagesJpegImpl(ids, idCol, progressive = false)

  /** [[syntheticImagesJpeg]]'s corpus encoded PROGRESSIVE
    * ([[JpegCodec.encodeGrayProgressive]]: SOF2, DC successive
    * approximation + AC band scan) — the `image_dedup_jpeg_progressive`
    * gate corpus. Content is gray, and the progressive refinement
    * reaches exactly the baseline's quantized values, so decoded
    * pixels — and therefore the ORACLE — are identical to the
    * baseline twin: the hash match proves the multi-scan accumulation
    * path end to end.
    */
  def syntheticImagesJpegProgressive(ids: DataFrame, idCol: String): DataFrame =
    syntheticImagesJpegImpl(ids, idCol, progressive = true)

  private def syntheticImagesJpegImpl(ids: DataFrame, idCol: String,
      progressive: Boolean): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIx)
        val g = id / 4; val v = id % 4
        val cw = (8 * (1 + g % 3)).toInt; val ch = (8 * (1 + g % 2)).toInt
        val w = 9 * cw; val h = 8 * ch
        def grayAt(x: Int, y: Int): Int = {
          val cx = x / cw; val cy = y / ch
          val base =
            (((cx * (7 + g % 5) + cy * (13 + g % 11) + g * 31) % 17) * 15).toInt
          if (cx == 8 && cy < v) ((base + 40 * (cy + 1)) % 256).toInt
          else base
        }
        val bytes =
          if (progressive) JpegCodec.encodeGrayProgressive(w, h, grayAt)
          else JpegCodec.encode420(w, h, (x, y) => {
            val p = grayAt(x, y); (p, p, p)
          })
        Row(id, "jpeg", bytes)
      }
    }(enc)
  }

  /** Deterministic synthetic image corpus for the oracle-gated query
    * (testdata carries no real image assets): id → a cell-constant
    * image whose 9×8 cell grid follows a closed-form rule, so the
    * decoded-then-downsampled grays equal the generator's cell values
    * and the oracle can replay the WHOLE pipeline in SQL — any codec
    * or hash bug lands on different integers.
    *
    * Near-dup structure: ids group by `id / 4`; variant `v = id % 4`
    * perturbs cells `(8, cy)` for `cy < v` — the RIGHTMOST column's
    * cells sit in exactly ONE gradient comparison each, so
    * within-group Hamming distances are <= 3 by construction (the
    * recall contract the spec pins, inside the 16-bit-band blocking's
    * exact threshold). Even groups encode PNG (a different scanline
    * filter per row), odd groups BMP — both real codecs sit inside
    * the hash path.
    */
  def syntheticImages(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIx)
        val g = id / 4; val v = id % 4
        val cw = (2 + g % 3).toInt; val ch = (2 + g % 2).toInt
        val w = 9 * cw; val h = 8 * ch
        def rgbAt(x: Int, y: Int): (Int, Int, Int) = {
          val cx = x / cw; val cy = y / ch
          // group-dependent gradient DIRECTIONS (not just a constant
          // offset): with fixed multipliers the pattern space collapsed
          // to ~102 classes and 40% of all pairs were exact-dup —
          // degenerate for a near-dup operator. Period lcm(5,11,17,3,2)
          // = 5610 groups, beyond both test scales.
          val base =
            (((cx * (7 + g % 5) + cy * (13 + g % 11) + g * 31) % 17) * 15).toInt
          val p =
            if (cx == 8 && cy < v)
              ((base + 40 * (cy + 1)) % 256).toInt
            else base
          (p, (p + 60) % 256, (p + 120) % 256)
        }
        if (g % 2 == 0)
          Row(id, "png",
            PngCodec.encodeRgb8(w, h, rgbAt, filterForRow = y => y % 5))
        else
          Row(id, "bmp", BmpCodec.encode24(w, h, rgbAt))
      }
    }(enc)
  }
}
