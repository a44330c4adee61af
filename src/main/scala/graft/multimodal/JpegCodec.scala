package graft.multimodal

/** Baseline sequential JFIF (ITU-T T.81) — a REAL pure-JVM JPEG codec,
  * closing the dominant gap in the honest-codec family: WAV/BMP/PNG
  * decode genuinely ([[WavCodec]]/[[BmpCodec]]/[[PngCodec]]) but real
  * image corpora are overwhelmingly JPEG, so until this codec the
  * real-pixel dHash dedup family exercised a minority of real-world
  * bytes.
  *
  * Scope — the baseline sequential profile, everything from the
  * published spec:
  *  - canonical Huffman entropy coding (DHT-driven on decode; the
  *    encoder emits the Annex K.3 typical tables), byte stuffing,
  *    restart markers (DRI/RSTn) honored on decode;
  *  - 8×8 FDCT/IDCT in doubles (JVM double math is fully
  *    deterministic — strictfp semantics are unconditional since
  *    JEP 306/Java 17 — so decode is bit-reproducible across
  *    machines), with the DC path computed exactly (sum·1/8 and
  *    dequant·1/8 are powers of two): a CONSTANT 8×8 block round-trips
  *    through quantization in closed integer form, which is what lets
  *    the DuckDB oracle replay generated-JPEG pipelines bit-for-bit;
  *  - Annex K.1/K.2 quantization tables (quality 50);
  *  - grayscale (1 component) and YCbCr with sampling factors in
  *    {1, 2} — 4:4:4, 4:2:2 and the ubiquitous 4:2:0 (2×2 box-average
  *    chroma downsample on encode, replication upsample on decode);
  *  - integer fixed-point color conversion chosen so that
  *    R = G = B = p maps to (Y = p, Cb = Cr = 128) EXACTLY on encode
  *    and (Y, 128, 128) maps back to R = G = B = Y exactly on decode
  *    (the coefficient rows sum to 65536 / 0 by construction).
  *
  * PROGRESSIVE (SOF2) decodes too — the large second share of real
  * web JPEGs: per-scan spectral selection (DC and AC bands) and
  * successive approximation (DC first/refine, AC first with EOB-run
  * codes, AC refinement with correction bits and ±1·2^Al insertions),
  * accumulated into per-component raw-coefficient storage across
  * scans and dequantized+IDCT'd once at EOI — so a fully-refined
  * progressive stream decodes to exactly the pixels of its baseline
  * equivalent (pinned by spec and by the `image_dedup_jpeg_progressive`
  * oracle). The encoder side ships [[encodeGrayProgressive]] (the
  * canonical 3-scan DC-approximation + AC-band structure) for
  * generated corpora; [[encode420]]/[[encodeGray]] stay baseline.
  *
  * Everything else outside those profiles (arithmetic coding, 12-bit
  * precision, hierarchical, lossless) refuses loudly rather than
  * misreading. All parsing treats lengths and dimensions as UNTRUSTED
  * (the WAV/BMP/PNG hardening rules).
  *
  * Decoded-value closed form used by the oracle-gated queries: for a
  * constant block of gray value p (level shift v = p − 128), the only
  * nonzero coefficient is DC = 8v (computed exactly); quantization at
  * the Annex K luma Q(0,0) = 16 gives `round(v/2)` = floorDiv(v+1, 2)
  * (Math.round half-up), dequant·IDCT gives the INTEGER `2·qv + 128`,
  * so `dec(p) = clamp(2·floorDiv(p − 127, 2) + 128) =
  * min(255, 2·((p + 1) div 2))` for p in 0..255 — pure non-negative
  * integer arithmetic on both engines.
  */
object JpegCodec {

  /** Decoded JPEG: pixels packed `0xRRGGBB`, row-major top-down. */
  final case class Jpeg(width: Int, height: Int, pixels: Array[Int]) {
    def rgb(x: Int, y: Int): Int = pixels(y * width + x)
  }

  // ---------------------------------------------------------------- tables

  /** Zigzag scan: ZigZag(k) = natural (row-major) index of the k-th
    * coefficient in scan order (T.81 Figure 5).
    */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization (natural order). Q(0,0) = 16 is
    * load-bearing for the closed form: divisible by 8, so DC-only
    * blocks decode to exact integers (see the object doc).
    */
  private[multimodal] val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization (natural order). */
  private[multimodal] val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 typical Huffman tables: (code counts per length 1..16,
  // then the symbol values in code order)
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** cos((2x+1)·u·π/16) — shared by FDCT and IDCT. */
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cnorm: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) math.sqrt(0.5) else 1.0)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ------------------------------------------------------------- encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** Canonical code assignment from (counts, values) — T.81 Annex C. */
  private def huffEncodeTable(
      bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        codeOf(vals(k)) = code; lenOf(vals(k)) = len
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    (codeOf, lenOf)
  }

  /** Magnitude category: bit length of |v| (0 for 0) — T.81 F.1.2.1. */
  private def magCat(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** FDCT of a level-shifted block (doubles). The DC coefficient is
    * computed on the EXACT path — sum·0.125, both exact in doubles —
    * so constant blocks follow the closed form; the AC path's
    * ~1e-13 residue on constant blocks quantizes to 0 regardless.
    */
  private def fdct(block: Array[Int]): Array[Double] = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += block(y * 8 + x) * Cos(y)(v); y += 1 }
        tmp(v * 8 + x) = 0.5 * Cnorm(v) * s
        x += 1
      }
      v += 1
    }
    val out = new Array[Double](64)
    v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += tmp(v * 8 + x) * Cos(x)(u); x += 1 }
        out(v * 8 + u) = 0.5 * Cnorm(u) * s
        u += 1
      }
      v += 1
    }
    var sum = 0L
    var i = 0
    while (i < 64) { sum += block(i); i += 1 }
    out(0) = sum * 0.125 // exact: integer × 2^-3
    out
  }

  /** Quantize + zigzag + Huffman-encode one block; returns the new DC
    * predictor. `Math.round` = floor(x + 0.5) (half-up) — the
    * quantizer the closed form and the oracle replay.
    */
  private def encodeBlock(bw: BitWriter, coefs: Array[Double],
      qtab: Array[Int], pred: Int,
      dc: (Array[Int], Array[Int]), ac: (Array[Int], Array[Int])): Int = {
    val q = new Array[Int](64) // zigzag order
    var k = 0
    while (k < 64) {
      val nat = ZigZag(k)
      q(k) = Math.round(coefs(nat) / qtab(nat)).toInt
      k += 1
    }
    val diff = q(0) - pred
    val s = magCat(diff)
    bw.put(dc._1(s), dc._2(s))
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    k = 1
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run >= 16) { bw.put(ac._1(0xF0), ac._2(0xF0)); run -= 16 }
        val sz = magCat(q(k))
        val rs = (run << 4) | sz
        bw.put(ac._1(rs), ac._2(rs))
        bw.put(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(ac._1(0x00), ac._2(0x00)) // EOB
    q(0)
  }

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
      payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
  }

  private def headerSegments(out: java.io.ByteArrayOutputStream,
      width: Int, height: Int, gray: Boolean): Unit = {
    out.write(0xFF); out.write(0xD8) // SOI
    writeSeg(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0,
      1, 1, 0, 0, 1, 0, 1, 0, 0)) // JFIF 1.1, unitless 1:1, no thumb
    val dqt = new java.io.ByteArrayOutputStream()
    dqt.write(0x00); ZigZag.foreach(i => dqt.write(QLuma(i)))
    if (!gray) { dqt.write(0x01); ZigZag.foreach(i => dqt.write(QChroma(i))) }
    writeSeg(out, 0xDB, dqt.toByteArray)
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write(height >> 8); sof.write(height & 0xFF)
    sof.write(width >> 8); sof.write(width & 0xFF)
    if (gray) { sof.write(1); sof.write(1); sof.write(0x11); sof.write(0) }
    else {
      sof.write(3)
      sof.write(1); sof.write(0x22); sof.write(0) // Y 2x2, Q0
      sof.write(2); sof.write(0x11); sof.write(1) // Cb 1x1, Q1
      sof.write(3); sof.write(0x11); sof.write(1) // Cr 1x1, Q1
    }
    writeSeg(out, 0xC0, sof.toByteArray)
    val dht = new java.io.ByteArrayOutputStream()
    def table(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      dht.write((cls << 4) | id)
      bits.foreach(dht.write)
      vals.foreach(dht.write)
    }
    table(0, 0, DcLumaBits, DcLumaVals)
    table(1, 0, AcLumaBits, AcLumaVals)
    if (!gray) {
      table(0, 1, DcChromaBits, DcChromaVals)
      table(1, 1, AcChromaBits, AcChromaVals)
    }
    writeSeg(out, 0xC4, dht.toByteArray)
    val sos = new java.io.ByteArrayOutputStream()
    if (gray) { sos.write(1); sos.write(1); sos.write(0x00) }
    else {
      sos.write(3)
      sos.write(1); sos.write(0x00)
      sos.write(2); sos.write(0x11)
      sos.write(3); sos.write(0x11)
    }
    sos.write(0); sos.write(63); sos.write(0) // Ss, Se, Ah/Al
    writeSeg(out, 0xDA, sos.toByteArray)
  }

  /** Integer fixed-point RGB→YCbCr. Coefficient rows sum to 65536 (Y)
    * and 0 (Cb, Cr), so R = G = B = p maps to (p, 128, 128) EXACTLY —
    * the property the gray-content oracle queries rest on.
    */
  private def yccOf(r: Int, g: Int, b: Int): (Int, Int, Int) = (
    clamp255((19595 * r + 38470 * g + 7471 * b + 32768) >> 16),
    clamp255(128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)),
    clamp255(128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)))

  /** Encode baseline 4:2:0 YCbCr color JPEG. `rgb(x, y)` supplies
    * channels in 0..255; coordinates beyond the image replicate the
    * edge (so cell-constant content aligned to 8×8 blocks stays
    * block-constant through the padded MCU grid).
    */
  def encode420(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    headerSegments(out, width, height, gray = false)
    val bw = new BitWriter(out)
    val dcL = huffEncodeTable(DcLumaBits, DcLumaVals)
    val acL = huffEncodeTable(AcLumaBits, AcLumaVals)
    val dcC = huffEncodeTable(DcChromaBits, DcChromaVals)
    val acC = huffEncodeTable(AcChromaBits, AcChromaVals)
    val mcusX = (width + 15) / 16
    val mcusY = (height + 15) / 16
    val ys = new Array[Int](256)
    val cbs = new Array[Int](256)
    val crs = new Array[Int](256)
    val block = new Array[Int](64)
    var predY = 0; var predCb = 0; var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var j = 0
        while (j < 16) {
          val sy = math.min(my * 16 + j, height - 1)
          var i = 0
          while (i < 16) {
            val sx = math.min(mx * 16 + i, width - 1)
            val (r, g, b) = rgb(sx, sy)
            val (yv, cb, cr) = yccOf(r & 0xFF, g & 0xFF, b & 0xFF)
            ys(j * 16 + i) = yv; cbs(j * 16 + i) = cb; crs(j * 16 + i) = cr
            i += 1
          }
          j += 1
        }
        // 4 luma blocks, left-to-right then top-to-bottom
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            var k = 0
            while (k < 64) {
              block(k) =
                ys((by * 8 + k / 8) * 16 + bx * 8 + k % 8) - 128
              k += 1
            }
            predY = encodeBlock(bw, fdct(block), QLuma, predY, dcL, acL)
            bx += 1
          }
          by += 1
        }
        // chroma: 2×2 box average (rounded), one 8×8 block each
        def chromaBlock(src: Array[Int]): Unit = {
          var k = 0
          while (k < 64) {
            val cy = (k / 8) * 2; val cx = (k % 8) * 2
            block(k) = ((src(cy * 16 + cx) + src(cy * 16 + cx + 1) +
              src((cy + 1) * 16 + cx) + src((cy + 1) * 16 + cx + 1) + 2)
              >> 2) - 128
            k += 1
          }
        }
        chromaBlock(cbs)
        predCb = encodeBlock(bw, fdct(block), QChroma, predCb, dcC, acC)
        chromaBlock(crs)
        predCr = encodeBlock(bw, fdct(block), QChroma, predCr, dcC, acC)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode baseline grayscale (one component). */
  def encodeGray(width: Int, height: Int,
      gray: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    headerSegments(out, width, height, gray = true)
    val bw = new BitWriter(out)
    val dcL = huffEncodeTable(DcLumaBits, DcLumaVals)
    val acL = huffEncodeTable(AcLumaBits, AcLumaVals)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val block = new Array[Int](64)
    var pred = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var k = 0
        while (k < 64) {
          val sy = math.min(my * 8 + k / 8, height - 1)
          val sx = math.min(mx * 8 + k % 8, width - 1)
          block(k) = (gray(sx, sy) & 0xFF) - 128
          k += 1
        }
        pred = encodeBlock(bw, fdct(block), QLuma, pred, dcL, acL)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** Encode PROGRESSIVE grayscale (SOF2, three scans): DC first at
    * successive approximation Al=1, DC refinement (the low bit), then
    * the full AC band 1..63 — the canonical spectral-selection +
    * successive-approximation structure of real progressive files,
    * through the same Annex K quantizer as [[encodeGray]], so the
    * DECODED PIXELS are bit-identical to the baseline encoding of the
    * same content (the refinement reaches the same quantized values)
    * and every oracle closed form carries over unchanged. AC blocks
    * end with plain EOB (run length 1 — the only EOB symbol in the
    * Annex K table); multi-block EOB runs are a decoder-side feature
    * pinned by hand-built fixtures in JpegCodecSpec.
    */
  def encodeGrayProgressive(width: Int, height: Int,
      gray: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    // headers as in the gray baseline, but SOF2
    out.write(0xFF); out.write(0xD8)
    writeSeg(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0,
      1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = new java.io.ByteArrayOutputStream()
    dqt.write(0x00); ZigZag.foreach(i => dqt.write(QLuma(i)))
    writeSeg(out, 0xDB, dqt.toByteArray)
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8)
    sof.write(height >> 8); sof.write(height & 0xFF)
    sof.write(width >> 8); sof.write(width & 0xFF)
    sof.write(1); sof.write(1); sof.write(0x11); sof.write(0)
    writeSeg(out, 0xC2, sof.toByteArray)
    val dht = new java.io.ByteArrayOutputStream()
    dht.write(0x00); DcLumaBits.foreach(dht.write); DcLumaVals.foreach(dht.write)
    dht.write(0x10); AcLumaBits.foreach(dht.write); AcLumaVals.foreach(dht.write)
    writeSeg(out, 0xC4, dht.toByteArray)
    val dcL = huffEncodeTable(DcLumaBits, DcLumaVals)
    val acL = huffEncodeTable(AcLumaBits, AcLumaVals)

    // quantized blocks, zigzag order, computed once
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val qblocks = new Array[Array[Int]](mcusX * mcusY)
    val block = new Array[Int](64)
    var bi = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var k = 0
        while (k < 64) {
          val sy = math.min(my * 8 + k / 8, height - 1)
          val sx = math.min(mx * 8 + k % 8, width - 1)
          block(k) = (gray(sx, sy) & 0xFF) - 128
          k += 1
        }
        val f = fdct(block)
        val q = new Array[Int](64)
        k = 0
        while (k < 64) {
          val nat = ZigZag(k)
          q(k) = Math.round(f(nat) / QLuma(nat)).toInt
          k += 1
        }
        qblocks(bi) = q
        bi += 1
        mx += 1
      }
      my += 1
    }

    def sos(comps: Array[Byte], ss: Int, se: Int, ah: Int, al: Int)(
        body: BitWriter => Unit): Unit = {
      val hdr = new java.io.ByteArrayOutputStream()
      hdr.write(comps.length / 2)
      comps.foreach(b => hdr.write(b & 0xFF))
      hdr.write(ss); hdr.write(se); hdr.write((ah << 4) | al)
      writeSeg(out, 0xDA, hdr.toByteArray)
      val bw = new BitWriter(out)
      body(bw)
      bw.flush()
    }

    // scan 1: DC first, Al=1 — diffs of (DC >> 1), arithmetic shift
    sos(Array[Byte](1, 0x00), 0, 0, 0, 1) { bw =>
      var pred = 0
      qblocks.foreach { q =>
        val hi = q(0) >> 1
        val diff = hi - pred
        pred = hi
        val s = magCat(diff)
        bw.put(dcL._1(s), dcL._2(s))
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
    }
    // scan 2: DC refinement, Ah=1 Al=0 — the raw low bit per block
    sos(Array[Byte](1, 0x00), 0, 0, 1, 0) { bw =>
      qblocks.foreach(q => bw.put(q(0) & 1, 1))
    }
    // scan 3: AC first, band 1..63, Al=0 — baseline run/size coding
    // with plain per-block EOB
    sos(Array[Byte](1, 0x00), 1, 63, 0, 0) { bw =>
      qblocks.foreach { q =>
        var run = 0
        var k = 1
        while (k < 64) {
          if (q(k) == 0) run += 1
          else {
            while (run >= 16) { bw.put(acL._1(0xF0), acL._2(0xF0)); run -= 16 }
            val sz = magCat(q(k))
            bw.put(acL._1((run << 4) | sz), acL._2((run << 4) | sz))
            bw.put(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(acL._1(0x00), acL._2(0x00))
      }
    }
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  /** Canonical Huffman decoding tables (T.81 F.2.2.3). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          maxCode(len) = code + bits(len - 1) - 1
          code += bits(len - 1)
          k += bits(len - 1)
        }
        require(code <= (1 << len),
          s"DHT overfull at length $len: not a valid canonical code set")
        code <<= 1
        len += 1
      }
      require(k == vals.length, s"DHT counts ($k) != values (${vals.length})")
    }
    def decode(br: BitReader): Int = {
      var code = br.nextBit()
      var len = 1
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.nextBit()
        len += 1
      }
      require(maxCode(len) >= 0 && code <= maxCode(len),
        "corrupt entropy stream: no Huffman code matches")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  /** Entropy-stream bit reader: unstuffs FF00, stops at any real
    * marker (RSTn handled by [[expectRestart]] at aligned MCU
    * boundaries).
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def nextBit(): Int = {
      if (n == 0) {
        require(pos < data.length, "truncated entropy stream")
        val b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          require(pos < data.length, "truncated entropy stream")
          val b2 = data(pos) & 0xFF
          pos += 1
          require(b2 == 0x00,
            f"marker FF$b2%02X inside an entropy-coded segment " +
              "(truncated scan?)")
        }
        acc = b
        n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def expectRestart(k: Int): Unit = {
      n = 0
      require(pos + 1 < data.length, "truncated at restart marker")
      val a = data(pos) & 0xFF; val b = data(pos + 1) & 0xFF
      require(a == 0xFF && b == 0xD0 + k,
        f"expected RST$k%d, found $a%02X$b%02X")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Inverse DCT (doubles, separable), +128 level shift, clamp. For a
    * DC-only block the result is the exact integer `dequantDC/8 + 128`
    * (the ~1e-13 cosine-table residue cannot move `Math.round` off an
    * integer), which is what the oracle's closed form replays.
    */
  private def idctBlock(coef: Array[Int], dst: Array[Int], dstW: Int,
      x0: Int, y0: Int): Unit = {
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var i = 0
      while (i < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Cnorm(v) * coef(v * 8 + x) * Cos(i)(v); v += 1 }
        tmp(i * 8 + x) = 0.5 * s
        i += 1
      }
      x += 1
    }
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cnorm(u) * tmp(i * 8 + u) * Cos(j)(u); u += 1 }
        dst((y0 + i) * dstW + x0 + j) =
          clamp255(Math.round(0.5 * s).toInt + 128)
        j += 1
      }
      i += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td: Int = -1
    var ta: Int = -1
  }

  def decode(bytes: Array[Byte]): Jpeg = {
    require(bytes.length > 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "not a JPEG (no SOI)")
    var pos = 2
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = -1
    var height = -1
    var comps: Array[Component] = null
    var restartInterval = 0
    var pixels: Array[Int] = null
    var progressive = false
    // progressive state: per-component RAW (unquantized) coefficient
    // storage over the MCU-padded block grid, accumulated across scans
    // and rendered once at EOI
    var progCoefs: Array[Array[Int]] = null
    var sawProgScan = false

    def u8(): Int = { require(pos < bytes.length, "truncated"); val v = bytes(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { val a = u8(); (a << 8) | u8() }

    var done = false
    while (!done) {
      // markers may be preceded by fill bytes (FF FF ... marker)
      var m = u8()
      require(m == 0xFF, f"expected a marker, found $m%02X at ${pos - 1}")
      do m = u8() while (m == 0xFF)
      m match {
          case 0xD9 => // EOI: progressive renders its accumulated state here
          if (progressive && sawProgScan)
            pixels = renderProgressive(width, height, comps, qtabs, progCoefs)
          done = true
        case 0xDB => // DQT
          // NOTE: `pos + u16()` would read pos BEFORE u16 advances it
          // (Scala evaluates the left operand first) — bind len first
          val lenQ = u16()
          val end = pos + lenQ - 2
          require(end <= bytes.length, "DQT overruns the file")
          while (pos < end) {
            val pqTq = u8()
            require((pqTq >> 4) == 0, "only 8-bit quantization tables")
            require((pqTq & 0xF) <= 3, s"DQT table id ${pqTq & 0xF} > 3")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigZag(k)) = u8(); k += 1 }
            qtabs(pqTq & 0xF) = t
          }
        case 0xC4 => // DHT
          val lenH = u16()
          val end = pos + lenH - 2
          require(end <= bytes.length, "DHT overruns the file")
          while (pos < end) {
            val tcTh = u8()
            require((tcTh >> 4) <= 1 && (tcTh & 0xF) <= 3,
              s"DHT class/id ${tcTh >> 4}/${tcTh & 0xF} outside baseline")
            val bits = Array.fill(16)(u8())
            val nv = bits.sum
            require(pos + nv <= end, "DHT values overrun the segment")
            val vals = Array.fill(nv)(u8())
            val tab = new HuffTable(bits, vals)
            if ((tcTh >> 4) == 0) dcTabs(tcTh & 0xF) = tab
            else acTabs(tcTh & 0xF) = tab
          }
        case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 sequential; SOF2 progressive
          progressive = m == 0xC2
          u16()
          require(u8() == 8, "only 8-bit sample precision")
          height = u16(); width = u16()
          require(width > 0 && height > 0, s"bad dims ${width}x$height")
          require(width.toLong * height <= (64L << 20),
            s"${width}x$height exceeds the 64 MP guard")
          val nf = u8()
          require(nf == 1 || nf == 3,
            s"$nf components: only grayscale and YCbCr supported")
          comps = Array.fill(nf) {
            val id = u8(); val hv = u8(); val tq = u8()
            val c = Component(id, hv >> 4, hv & 0xF, tq)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"sampling ${c.h}x${c.v} outside the {1,2} baseline set")
            require(tq <= 3, s"component $id quant table $tq > 3")
            c
          }
          if (nf == 1) {
            // T.81 A.2: a single-component scan is NON-interleaved —
            // the MCU is one 8x8 data unit and the sampling factors
            // are ignored for the scan walk (they only matter for the
            // interleaved multi-component case). Normalize h=v=1 so a
            // grayscale file that kept 2x2 factors (e.g. jpegtran
            // -grayscale output) walks blocks row-major instead of in
            // 2x2-MCU order; restart counting then also counts data
            // units, as the spec requires for non-interleaved scans.
            val c0 = comps(0)
            if (c0.h != 1 || c0.v != 1) {
              val n = Component(c0.id, 1, 1, c0.tq)
              n.td = c0.td; n.ta = c0.ta
              comps(0) = n
            }
          }
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
             0xCD | 0xCE | 0xCF =>
          throw new IllegalArgumentException(
            f"SOF$m%02X: only baseline/extended sequential (SOF0/SOF1) " +
              "and progressive (SOF2) are supported")
        case 0xDD => // DRI
          require(u16() == 4, "bad DRI length")
          restartInterval = u16()
        case 0xDA => // SOS → entropy-coded scan
          require(comps != null, "SOS before SOF")
          u16()
          val ns = u8()
          if (!progressive) {
            require(ns == comps.length,
              "only single interleaved scans are supported")
            var i = 0
            while (i < ns) {
              val cs = u8(); val tdta = u8()
              val c = comps.find(_.id == cs).getOrElse(
                throw new IllegalArgumentException(s"scan names component $cs"))
              // the MCU loop interleaves in SOF order; T.81 interleaves
              // in SCAN order — refuse loudly on a reordered scan rather
              // than silently swapping planes (they agree in practice)
              require(c eq comps(i),
                s"scan component order differs from SOF order at slot $i " +
                  s"(component $cs) — unsupported")
              c.td = tdta >> 4; c.ta = tdta & 0xF
              require(c.td <= 3 && c.ta <= 3,
                s"scan Huffman table ids ${c.td}/${c.ta} > 3")
              require(dcTabs(c.td) != null && acTabs(c.ta) != null,
                s"scan references undefined Huffman table ${tdta}")
              require(qtabs(c.tq) != null,
                s"component ${c.id} references undefined DQT ${c.tq}")
              i += 1
            }
            require(u8() == 0 && u8() == 63 && u8() == 0,
              "spectral selection outside baseline")
            pixels = decodeScan(bytes, pos, width, height, comps, qtabs,
              dcTabs, acTabs, restartInterval) match {
              case (px, endPos) => pos = endPos; px
            }
          } else {
            // progressive scan: 1 component (non-interleaved) or all
            // components (interleaved, DC only); spectral band +
            // successive-approximation from the scan header
            require(ns == 1 || ns == comps.length,
              s"progressive scan with $ns of ${comps.length} components " +
                "— only single-component and all-component scans supported")
            val scanComps = Array.tabulate(ns) { i =>
              val cs = u8(); val tdta = u8()
              val c = comps.find(_.id == cs).getOrElse(
                throw new IllegalArgumentException(s"scan names component $cs"))
              if (ns > 1)
                require(c eq comps(i),
                  s"scan component order differs from SOF order at slot $i")
              c.td = tdta >> 4; c.ta = tdta & 0xF
              require(c.td <= 3 && c.ta <= 3,
                s"scan Huffman table ids ${c.td}/${c.ta} > 3")
              c
            }
            val ss = u8(); val se = u8(); val ahal = u8()
            val ah = ahal >> 4; val al = ahal & 0xF
            require(ss <= 63 && se <= 63 && ss <= se,
              s"bad spectral band $ss..$se")
            require(ah <= 13 && al <= 13, s"bad approximation $ah/$al")
            if (ss == 0)
              require(se == 0, "progressive DC scan must have Se = 0")
            else
              require(ns == 1,
                "progressive AC scans are non-interleaved (one component)")
            if (ss == 0 && ah == 0)
              scanComps.foreach(c => require(dcTabs(c.td) != null,
                s"DC scan references undefined Huffman table ${c.td}"))
            if (ss > 0)
              scanComps.foreach(c => require(acTabs(c.ta) != null,
                s"AC scan references undefined Huffman table ${c.ta}"))
            scanComps.foreach(c => require(qtabs(c.tq) != null,
              s"component ${c.id} references undefined DQT ${c.tq}"))
            if (progCoefs == null) {
              val hmax = comps.map(_.h).max
              val vmax = comps.map(_.v).max
              val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
              val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
              require(mcusX.toLong * mcusY * hmax * vmax <= (8L << 20),
                "absurd progressive block count")
              progCoefs = comps.map(c =>
                new Array[Int](mcusX * c.h * mcusY * c.v * 64))
            }
            pos = decodeProgressiveScan(bytes, pos, width, height, comps,
              scanComps, ss, se, ah, al, dcTabs, acTabs, restartInterval,
              progCoefs)
            sawProgScan = true
          }
        case x if x >= 0xE0 && x <= 0xEF => // APPn
          val lenA = u16()
          require(lenA >= 2, s"bad APPn length $lenA (< 2)")
          pos += lenA - 2
        case 0xFE => // COM
          val lenC = u16()
          require(lenC >= 2, s"bad COM length $lenC (< 2)")
          pos += lenC - 2
        case 0x01 => () // TEM, no payload
        case other =>
          throw new IllegalArgumentException(
            f"unsupported marker FF$other%02X")
      }
      require(pos <= bytes.length, "segment overruns the file")
      if (pixels != null && !done) {
        // after the scan, accept trailing EOI (possibly with fill)
        ()
      }
    }
    require(pixels != null, "no scan data (missing SOS)")
    Jpeg(width, height, pixels)
  }

  /** Decode the single interleaved scan; returns (pixels, position
    * just past the entropy data).
    */
  private def decodeScan(bytes: Array[Byte], start: Int, width: Int,
      height: Int, comps: Array[Component], qtabs: Array[Array[Int]],
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      restartInterval: Int): (Array[Int], Int) = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component sample planes over the full MCU grid
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * mcusY * comps(ci).v * 8)).toArray
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val br = new BitReader(bytes, start)
    var mcu = 0
    var rstCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.expectRestart(rstCount % 8)
          rstCount += 1
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val qtab = qtabs(c.tq)
          val dcTab = dcTabs(c.td)
          val acTab = acTabs(c.ta)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coef, 0)
              val s = dcTab.decode(br)
              require(s <= 11, s"DC category $s outside baseline")
              preds(ci) += extend(br.receive(s), s)
              coef(0) = preds(ci) * qtab(0)
              var k = 1
              while (k < 64) {
                val rs = acTab.decode(br)
                val r = rs >> 4
                val sz = rs & 0xF
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  require(k < 64, "AC run overruns the block")
                  coef(ZigZag(k)) = extend(br.receive(sz), sz) * qtab(ZigZag(k))
                  k += 1
                }
              }
              idctBlock(coef, planes(ci), planeW(ci),
                (mx.toLong * c.h + bx).toInt * 8, (my * c.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    (assemblePixels(width, height, comps, planes, planeW, hmax, vmax),
      br.pos)
  }

  /** Decode ONE progressive scan (T.81 G.2) into the per-component
    * RAW coefficient store; returns the position just past the
    * entropy data. Four scan kinds: DC first (Huffman diffs, values
    * `<< Al`), DC refinement (one raw bit per block, `+= bit << Al`),
    * AC first (band Ss..Se with EOB-run codes), AC refinement
    * (correction bits for nonzero history, ±1·2^Al insertions).
    * Restart markers reset predictions AND the EOB run.
    */
  private def decodeProgressiveScan(bytes: Array[Byte], start: Int,
      width: Int, height: Int, comps: Array[Component],
      scanComps: Array[Component], ss: Int, se: Int, ah: Int, al: Int,
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      restartInterval: Int, coefs: Array[Array[Int]]): Int = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val br = new BitReader(bytes, start)
    val preds = new Array[Int](comps.length)
    var eobrun = 0
    var rstCount = 0
    var unit = 0 // restart-interval counter: MCUs or blocks

    def maybeRestart(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.expectRestart(rstCount % 8)
        rstCount += 1
        java.util.Arrays.fill(preds, 0)
        eobrun = 0
      }

    def dcBlock(ci: Int, off: Int): Unit =
      if (ah == 0) {
        val s = dcTabs(comps(ci).td).decode(br)
        require(s <= 11, s"DC category $s outside the coded range")
        preds(ci) += extend(br.receive(s), s)
        coefs(ci)(off) = preds(ci) << al
      } else coefs(ci)(off) += br.nextBit() << al

    def firstAcBlock(co: Array[Int], off: Int, acTab: HuffTable): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = acTab.decode(br)
        val r = rs >> 4
        val s = rs & 0xF
        if (s == 0) {
          if (r == 15) k += 16 // ZRL: 16 zero coefficients
          else {
            eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0) - 1
            return // EOBn ends this block; eobrun more blocks follow
          }
        } else {
          k += r
          require(k <= se, s"AC run overruns the $ss..$se band")
          co(off + ZigZag(k)) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }

    /** Correction bit for a nonzero-history coefficient. */
    def refineBit(co: Array[Int], idx: Int): Unit =
      if (br.nextBit() == 1 && (co(idx) & (1 << al)) == 0)
        co(idx) += (if (co(idx) >= 0) (1 << al) else -(1 << al))

    def refineAcBlock(co: Array[Int], off: Int, acTab: HuffTable): Unit = {
      var k = ss
      if (eobrun == 0) {
        var inEob = false
        while (k <= se && !inEob) {
          val rs = acTab.decode(br)
          var r = rs >> 4
          val s = rs & 0xF
          var newVal = 0
          if (s == 0) {
            if (r < 15) {
              // EOB run INCLUDING this block; the rest of this block
              // still takes correction bits below
              eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
              inEob = true
            } // r == 15: ZRL — pass 16 zero-history coefficients
          } else {
            require(s == 1, s"AC refinement magnitude $s != 1")
            newVal = if (br.nextBit() == 1) (1 << al) else -(1 << al)
          }
          if (!inEob) {
            var placed = false
            while (k <= se && !placed) {
              val idx = off + ZigZag(k)
              if (co(idx) != 0) refineBit(co, idx)
              else if (r == 0) {
                if (newVal != 0) co(idx) = newVal
                placed = true
              } else r -= 1
              k += 1
            }
            require(placed || s == 0,
              "AC refinement placement overran the band")
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val idx = off + ZigZag(k)
          if (co(idx) != 0) refineBit(co, idx)
          k += 1
        }
        eobrun -= 1
      }
    }

    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan: MCU walk in SOF order
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          var i = 0
          while (i < scanComps.length) {
            val c = scanComps(i)
            val ci = comps.indexWhere(_ eq c)
            val bw = mcusX * c.h
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                dcBlock(ci,
                  ((my * c.v + by) * bw + mx * c.h + bx) * 64)
                bx += 1
              }
              by += 1
            }
            i += 1
          }
          unit += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: the single component's OWN block grid (no
      // MCU padding), row-major; storage stride stays MCU-padded
      val c = scanComps(0)
      val ci = comps.indexWhere(_ eq c)
      val bw = mcusX * c.h // padded stride
      val cw = (width * c.h + hmax - 1) / hmax
      val chh = (height * c.v + vmax - 1) / vmax
      val nbW = (cw + 7) / 8
      val nbH = (chh + 7) / 8
      val acTab = if (ss > 0) acTabs(c.ta) else null
      var by = 0
      while (by < nbH) {
        var bx = 0
        while (bx < nbW) {
          maybeRestart()
          val off = (by * bw + bx) * 64
          if (ss == 0) dcBlock(ci, off)
          else if (ah == 0) firstAcBlock(coefs(ci), off, acTab)
          else refineAcBlock(coefs(ci), off, acTab)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
    br.pos
  }

  /** Dequantize + IDCT the accumulated progressive coefficients into
    * sample planes and assemble RGB — run once, at EOI.
    */
  private def renderProgressive(width: Int, height: Int,
      comps: Array[Component], qtabs: Array[Array[Int]],
      coefs: Array[Array[Int]]): Array[Int] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val planeW = comps.map(c => mcusX * c.h * 8).toSeq
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * mcusY * comps(ci).v * 8)).toArray
    val block = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      require(qtabs(c.tq) != null,
        s"component ${c.id} references undefined DQT ${c.tq}")
      val qtab = qtabs(c.tq)
      val bw = mcusX * c.h
      val bh = mcusY * c.v
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val off = (by * bw + bx) * 64
          var k = 0
          while (k < 64) { block(k) = coefs(ci)(off + k) * qtab(k); k += 1 }
          idctBlock(block, planes(ci), planeW(ci), bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    assemblePixels(width, height, comps, planes, planeW, hmax, vmax)
  }

  /** Assemble RGB from per-component sample planes: replication
    * upsample for subsampled chroma; shared by the baseline scan and
    * the progressive renderer.
    */
  private def assemblePixels(width: Int, height: Int,
      comps: Array[Component], planes: Array[Array[Int]],
      planeW: Seq[Int], hmax: Int, vmax: Int): Array[Int] = {
    val px = new Array[Int](width * height)
    if (comps.length == 1) {
      val p = planes(0); val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = p(y * pw + x)
          px(y * width + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      val (py, pcb, pcr) = (planes(0), planes(1), planes(2))
      val (wy, wcb, wcr) = (planeW(0), planeW(1), planeW(2))
      val cy = comps(0); val ccb = comps(1); val ccr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = py((y * cy.v / vmax) * wy + x * cy.h / hmax)
          val cb = pcb((y * ccb.v / vmax) * wcb + x * ccb.h / hmax) - 128
          val cr = pcr((y * ccr.v / vmax) * wcr + x * ccr.h / hmax) - 128
          val r = clamp255(yv + ((91881 * cr + 32768) >> 16))
          val g = clamp255(yv - ((22554 * cb + 46802 * cr + 32768) >> 16))
          val b = clamp255(yv + ((116130 * cb + 32768) >> 16))
          px(y * width + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
    }
    px
  }

  /** Nearest-neighbor resample, mirroring the BMP/PNG siblings. */
  def resizeNearest(img: Jpeg, width: Int, height: Int): Jpeg = {
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
    Jpeg(width, height, px)
  }
}
