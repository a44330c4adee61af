package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types._

/** AUDIO NEAR-DUPLICATE DEDUPLICATION — a sign-of-energy-delta
  * fingerprint computed from REAL decoded PCM ([[WavCodec]]), paired
  * by the same Hamming-band blocking as [[ImageDedup]]. Completes the
  * multimodal dedup family: text (MinHash/SimHash), image (dHash),
  * audio (this).
  *
  * The bit derivation is the published Haitsma–Kalker principle (A
  * Highly Robust Audio Fingerprint System, ISMIR 2002): a fingerprint
  * bit is the SIGN of an energy difference, which is invariant under
  * global gain (volume normalization, the dominant benign re-encode
  * for audio). Haitsma–Kalker takes the difference across FFT bands;
  * this operator takes it across TIME windows — 65 equal windows over
  * the clip, `bit j = 1` iff `E(j+1) > E(j)` where `E(w)` is the
  * window's integer energy `sum(s_i^2)` — because a spectral transform
  * in the fingerprint path would make the DuckDB oracle unreplayable,
  * while the time-domain envelope keeps the sign-of-delta robustness
  * property AND replays in closed form (the same trade the image
  * operator makes by hashing the decoded-downsample grid). 64 bits
  * are carried as two 32-bit halves in BIGINTs, exactly like dHash, so
  * [[ImageDedup.nearDupPairs]] — banding, pigeonhole-exact candidate
  * equi-join, XOR popcount re-check — is reused verbatim: one blocking
  * engine for every 64-bit perceptual fingerprint.
  *
  * Scale: fingerprinting is one narrow decode pass (mapPartitions over
  * the media frame — constant memory, partitioning preserved, the
  * documented media-codec seam); everything downstream is
  * [[ImageDedup.nearDupPairs]]'s audited banded join. 100 TB of audio
  * flows through the same plan — no driver state, no cartesian.
  */
object AudioDedup {

  /** 65 windows → 64 energy-delta bits (one 64-bit fingerprint). */
  val Windows = 65

  /** Sign-of-energy-delta fingerprint of one PCM clip as (hi32, lo32).
    * Window `w` covers samples `[w*n/65, (w+1)*n/65)` (the codecs' own
    * long-math boundary rule); energies are exact int64 (a 16-bit
    * sample squared is < 2^30, so clips up to 2^33 samples — 53 hours
    * at 44.1 kHz — cannot overflow); bit `j` = 1 iff `E(j+1) > E(j)`.
    * Gain-invariant: scaling every sample by a constant scales every
    * energy by its square, preserving all comparisons.
    */
  /** Exact int64 energies over the 65-window long-math grid — the one
    * windowing rule the fingerprint and the segmenter share (a change
    * here changes both, by construction).
    */
  private def windowEnergies(samples: Array[Short]): Array[Long] = {
    val n = samples.length
    require(n >= Windows,
      s"clip of $n samples is shorter than the $Windows-window grid")
    val e = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val from = (w.toLong * n / Windows).toInt
      val until = ((w + 1).toLong * n / Windows).toInt
      var s = 0L
      var i = from
      while (i < until) { val v = samples(i).toLong; s += v * v; i += 1 }
      e(w) = s
      w += 1
    }
    e
  }

  def energyHash64(samples: Array[Short]): (Long, Long) = {
    val e = windowEnergies(samples)
    var hi = 0L; var lo = 0L
    var j = 0
    while (j < 64) {
      if (e(j + 1) > e(j)) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    (hi, lo)
  }

  /** Decode a media row to mono 16-bit PCM: WAV ([[WavCodec]]) or an
    * ISO-BMFF MP4 carrying a `sowt` (LE 16-bit PCM) audio track
    * ([[Mp4Codec]] — the generic sample extraction concatenates to
    * the signal, so real container bytes feed the SAME fingerprint
    * chains). Anything else refuses loudly rather than fingerprinting
    * undecoded bytes (the [[ImageDedup.dHashDf]] contract).
    */
  private def decodePcm(fmt: String, bytes: Array[Byte],
      what: String): Array[Short] = fmt match {
    case "wav" => WavCodec.decode(bytes).samples
    case "mp4" =>
      Mp4Codec.decode(bytes).pcmTrack.getOrElse(
        throw new IllegalArgumentException(
          s"$what: mp4 carries no PCM (sowt sample entry, soun " +
            "handler) audio track")).pcm16
    case other => throw new IllegalArgumentException(
      s"$what needs decoded PCM; format '$other' is not a supported " +
        "audio codec")
  }

  /** Fingerprints over a media frame `(idCol, format, bytes)`: one
    * narrow decode→hash pass. Real PCM WAV and PCM-in-MP4 are
    * hashable; anything else refuses loudly (see [[decodePcm]]).
    */
  def energyHashDf(media: DataFrame, idCol: String): DataFrame = {
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
        val samples = decodePcm(r.getString(fmtIx),
          r.getAs[Array[Byte]](bIx), "energy fingerprint")
        val (hi, lo) = energyHash64(samples)
        Row(r.getLong(idIx), hi, lo)
      }
    }(enc)
  }

  /** Near-duplicate pairs among audio fingerprints — delegated to the
    * shared 64-bit Hamming-band engine (same pigeonhole exactness and
    * band-width selectivity trade; 16-bit bands are the registered
    * 100 TB configuration there and here).
    */
  def nearDupPairs(hashes: DataFrame, idCol: String,
      maxHamming: Int, bandBits: Int = 16): DataFrame =
    ImageDedup.nearDupPairs(hashes, idCol, maxHamming, bandBits)

  /** OFFSET-ROBUST fingerprint SEQUENCE over FIXED-DURATION blocks —
    * the trim/padding fix for [[energyHash64]]'s documented boundary:
    * the 65-window grid there is CLIP-RELATIVE (window w covers
    * `[w*n/65, (w+1)*n/65)`), so trimming the clip re-stretches every
    * window and changes every bit. Here the clip is cut into
    * consecutive blocks of exactly `blockSamples` samples (a trailing
    * partial block is dropped — it has no complete grid) and each
    * block fingerprints independently on ITS OWN 65-window grid, so a
    * block's bits depend only on the block's samples: a copy trimmed
    * by whole blocks keeps every surviving block's fingerprint
    * bit-identical, and [[SignatureDedup.nearDupPairsBySignature]]
    * matches the sequences alignment-free (same engine as video shot
    * signatures — this is Haitsma–Kalker's sub-fingerprint-sequence
    * shape with the blocks as sub-fingerprints). Trims that are not
    * block-aligned shift the grid inside every block and are OUT of
    * this operator's contract (real systems recover them with
    * overlapping hop offsets — a constant-factor emission increase on
    * the same plan, documented, not implemented).
    *
    * Emits `(id, block_idx, h_hi, h_lo)`. One narrow decode pass,
    * `floor(samples/blockSamples)` small rows per clip — the same
    * media-codec mapPartitions seam as every fingerprint pass.
    */
  def blockHashDf(media: DataFrame, idCol: String,
      blockSamples: Int): DataFrame =
    blockHashDf(media, idCol, blockSamples, hopSamples = blockSamples)

  /** OVERLAPPING-HOP variant — the recovery path for trims that are
    * NOT block-aligned: fingerprints are emitted at every start
    * `k·hopSamples` with a full block ahead, so any trim that is a
    * multiple of the HOP (a `blockSamples/hopSamples`× finer grid)
    * leaves every surviving hop-aligned block's fingerprint
    * bit-identical. This is exactly the constant-factor emission
    * increase the published systems pay (Haitsma–Kalker emit a
    * sub-fingerprint per ~11 ms hop over ~370 ms frames): the same
    * decode pass emits `blockSamples/hopSamples`× more rows through
    * the SAME downstream plan — no new join shape, just denser units.
    * `hopSamples = blockSamples` is the non-overlapping contract
    * above; the trim granularity knob is the hop.
    */
  def blockHashDf(media: DataFrame, idCol: String,
      blockSamples: Int, hopSamples: Int): DataFrame = {
    require(blockSamples >= Windows,
      s"blockSamples=$blockSamples cannot carry the $Windows-window grid")
    require(hopSamples >= 1 && hopSamples <= blockSamples,
      s"hopSamples=$hopSamples must be in [1, blockSamples=$blockSamples]")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("block_idx", LongType, nullable = false),
      StructField("h_hi", LongType, nullable = false),
      StructField("h_lo", LongType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = media.schema.fieldIndex(idCol)
    val fmtIx = media.schema.fieldIndex("format")
    val bIx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val samples = decodePcm(r.getString(fmtIx),
          r.getAs[Array[Byte]](bIx), "block fingerprints")
        val id = r.getLong(idIx)
        val n = samples.length
        val nHops =
          if (n < blockSamples) 0 else (n - blockSamples) / hopSamples + 1
        (0 until nHops).iterator.map { k =>
          val start = k * hopSamples
          val (hi, lo) = energyHash64(java.util.Arrays.copyOfRange(
            samples, start, start + blockSamples))
          Row(id, k.toLong, hi, lo)
        }
      }
    }(enc)
  }

  /** ENERGY-BASED SEGMENTATION (voice-activity endpointing): the
    * published Rabiner–Sambur shape — an utterance's endpoints are
    * found by thresholding short-time ENERGY against a clip-relative
    * level — on the same 65-window integer-energy grid as the
    * fingerprint, so decode, windowing and energies are shared and
    * the DuckDB oracle replays segmentation in closed form. A window
    * is ACTIVE iff `5·E(w) > max_w E(w)` (20% of the clip's peak —
    * clip-relative, so global gain cancels exactly like the
    * fingerprint bits); consecutive active windows merge into
    * segments. This is the audio analog of text chunking: the
    * segment table is what downstream per-utterance feature
    * extraction consumes.
    *
    * Returns `(start_win, end_win, n_windows, sum_energy)` per
    * segment, in start order. Row-local per clip (the media seam):
    * one decode, one 65-energy array, one scan.
    */
  def segmentsOf(samples: Array[Short]): Seq[(Int, Int, Int, Long)] = {
    val e = windowEnergies(samples)
    val emax = e.max
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    var start = -1
    var sum = 0L
    var w = 0
    while (w <= Windows) {
      val active = w < Windows && 5L * e(w) > emax
      if (active) {
        if (start < 0) { start = w; sum = 0L }
        sum += e(w)
      } else if (start >= 0) {
        out += ((start, w - 1, w - start, sum))
        start = -1
      }
      w += 1
    }
    out.toSeq
  }

  /** [[segmentsOf]] over a media frame `(idCol, format, bytes)`: one
    * narrow decode pass emitting
    * `(id, seg_idx, start_win, end_win, n_windows, sum_energy)` rows
    * (seg_idx 1-based in start order). Same WAV-only refusal contract
    * as [[energyHashDf]]; a clip with no active window emits nothing.
    */
  def segmentsDf(media: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("seg_idx", LongType, nullable = false),
      StructField("start_win", LongType, nullable = false),
      StructField("end_win", LongType, nullable = false),
      StructField("n_windows", LongType, nullable = false),
      StructField("sum_energy", LongType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIx = media.schema.fieldIndex(idCol)
    val fmtIx = media.schema.fieldIndex("format")
    val bIx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val samples = decodePcm(r.getString(fmtIx),
          r.getAs[Array[Byte]](bIx), "segmentation")
        val id = r.getLong(idIx)
        segmentsOf(samples).zipWithIndex.map {
          case ((s, eW, nW, sum), i) =>
            Row(id, (i + 1).toLong, s.toLong, eW.toLong, nW.toLong, sum)
        }
      }
    }(enc)
  }

  /** Deterministic TRIMMED-VARIANT block corpus for the oracle-gated
    * offset-robust query: a group (`g = id / 4`) shares a 6-block
    * MASTER clip (block `b` = 65 windows × 64 samples of
    * window-constant ±A amplitude, the amplitude residue a quadratic
    * in `w` whose coefficients are multiplicative permutations of the
    * globally-unique master block id `m = g·6+b` — see the inline
    * rule — so unrelated blocks cannot collide at test scale);
    * variant `v = id % 4` DROPS the
    * first `v` blocks — a block-aligned trim, the transform that
    * changes EVERY bit of the clip-relative [[energyHash64]] (its 65
    * windows re-stretch over the shorter clip) while every surviving
    * block's [[blockHashDf]] fingerprint stays bit-identical.
    * Variants `(v_a, v_b)` share the `6 - max(v_a, v_b)` trailing
    * master blocks.
    */
  def syntheticOffsetAudio(ids: DataFrame, idCol: String): DataFrame =
    syntheticOffsetAudioImpl(ids, idCol, mp4 = false)

  /** [[syntheticOffsetAudio]]'s samples in a REAL ISO-BMFF container
    * ([[Mp4Codec.encodePcm16]], `sowt` PCM track) instead of WAV —
    * the `audio_dedup_mp4` corpus. Same ids → bit-identical PCM, so
    * the query shares the WAV twin's oracle: the hash match proves
    * the audio-track sample extraction end to end.
    */
  def syntheticOffsetAudioMp4(ids: DataFrame, idCol: String): DataFrame =
    syntheticOffsetAudioImpl(ids, idCol, mp4 = true)

  private def syntheticOffsetAudioImpl(
      ids: DataFrame, idCol: String, mp4: Boolean): DataFrame = {
    val blockSamples = OffsetBlockSamples
    val winlen = blockSamples / Windows
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
        val blocks = (v until 6).toArray
        val samples = new Array[Short](blocks.length * blockSamples)
        var bi = 0
        while (bi < blocks.length) {
          val b = blocks(bi)
          // pattern key = the globally-unique MASTER block id, driving
          // the w-polynomial's COEFFICIENTS through multiplicative
          // permutations (m*K % 65521 is injective in m beyond sf1's
          // id range for K coprime to the prime) — a rule whose
          // m-dependence passes only through a small modulus is
          // PERIODIC in m (identical blocks every few hundred master
          // ids → quadratic accidental pairs at sf0.1), and the
          // syntheticAudio per-clip residue family reused per block
          // left unrelated blocks within 3 bits 4:1 over true pairs.
          // Integer closed form throughout for the oracle.
          val m = g * 6 + b
          var w = 0
          while (w < Windows) {
            val res = ((w.toLong * (1 + (m * 73 % 65521) % 996) +
              w.toLong * w * (1 + (m * 79 % 65521) % 996) + m) % 997) % 23
            val a = (1 + res * 40).toShort
            var i = 0
            while (i < winlen) {
              samples(bi * blockSamples + w * winlen + i) =
                if (i % 2 == 0) a else (-a).toShort
              i += 1
            }
            w += 1
          }
          bi += 1
        }
        if (mp4) Row(id, "mp4", Mp4Codec.encodePcm16(samples, 16000))
        else Row(id, "wav", WavCodec.encodePcm16Mono(16000, samples))
      }
    }(enc)
  }

  /** Fixed block duration of the offset-robust corpus and query:
    * 65 windows × 64 samples — `windowEnergies`' long-math boundaries
    * land exactly on the 64-sample sub-windows, so the oracle replays
    * each block's energies as `64·A²` in closed form.
    */
  val OffsetBlockSamples: Int = Windows * 64

  /** Hop of the overlapping-hop corpus and query: 13 windows × 64
    * samples — 1/5 of a block, and a multiple of the 64-sample window
    * so hop-aligned blocks keep their sub-windows on the master
    * window grid (what lets the oracle stay closed-form).
    */
  val HopSamples: Int = 13 * 64

  /** Deterministic HOP-TRIMMED corpus for the overlapping-hop query:
    * one MASTER timeline of `6 × 65` windows per group (amplitude
    * keyed by the ABSOLUTE master window index `w` and the group —
    * same de-linearized residue family as [[syntheticOffsetAudio]],
    * no block structure at all); variant `v = id % 4` trims the first
    * `v` HOPS (`v × 13` windows = `v × 832` samples) — a trim that is
    * NOT block-aligned, so every non-overlapping block fingerprint
    * changes, while every surviving hop-aligned block (master starts
    * `u × 13 >= v × 13`) is bit-identical across variants.
    */
  def syntheticHopAudio(ids: DataFrame, idCol: String): DataFrame = {
    val winlen = 64
    val masterWindows = 6 * Windows // 390
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
        val from = v * 13
        val samples = new Array[Short]((masterWindows - from) * winlen)
        var w = from
        while (w < masterWindows) {
          val res = ((w.toLong * (1 + (g * 73 % 65521) % 996) +
            w.toLong * w * (1 + (g * 79 % 65521) % 996) + g) % 997) % 23
          val a = (1 + res * 40).toShort
          var i = 0
          while (i < winlen) {
            samples((w - from) * winlen + i) = if (i % 2 == 0) a else (-a).toShort
            i += 1
          }
          w += 1
        }
        Row(id, "wav", WavCodec.encodePcm16Mono(16000, samples))
      }
    }(enc)
  }

  /** Deterministic synthetic audio corpus for the oracle-gated query
    * (testdata carries no real audio assets): id → a clip of 65
    * window-constant-amplitude segments whose amplitudes follow a
    * closed-form rule, so the decoded energies equal
    * `winlen * A(w)^2` and the oracle replays the WHOLE pipeline in
    * SQL — any codec or hash bug lands on different integers (the
    * [[ImageDedup.syntheticImages]] construction, one dimension down).
    *
    * Near-dup structure: ids group by `id / 4`; variant `v = id % 4`
    * re-rolls the amplitude residue of the LAST `v` windows — window
    * `w` sits in exactly the comparisons `(w-1, w)` and `(w, w+1)`, so
    * two variants of one group differ in at most `max(v_a, v_b) <= 3`
    * bits: every within-group pair is a true near-dup inside the
    * 16-bit-band blocking's exact threshold (the recall contract the
    * spec pins). The residue rule mixes `w`, `w^2` and a group offset
    * with coprime-period multipliers (period lcm(7, 11, 23) = 1771
    * groups, beyond both test scales) so the amplitude-pattern space
    * does not collapse into exact-dup classes — the image generator's
    * gradient-direction lesson.
    *
    * Samples alternate `+A, -A` within each window (zero-mean, energy
    * `winlen * A^2`); `winlen` varies by group but cancels out of
    * every within-clip comparison, which is what lets the oracle
    * compare `winlen * A^2` without modeling sample layout.
    */
  def syntheticAudio(ids: DataFrame, idCol: String): DataFrame = {
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
        val winlen = (80 + g % 3 * 40).toInt
        val samples = new Array[Short](Windows * winlen)
        var w = 0
        while (w < Windows) {
          val base = (w * (3 + g % 7) + w.toLong * w * (1 + g % 11) +
            g * 13) % 23
          val res = if (w >= Windows - v) (base + 9) % 23 else base
          val a = (1 + res * 40).toShort
          var i = 0
          while (i < winlen) {
            samples(w * winlen + i) = if (i % 2 == 0) a else (-a).toShort
            i += 1
          }
          w += 1
        }
        Row(id, "wav", WavCodec.encodePcm16Mono(16000, samples))
      }
    }(enc)
  }
}
