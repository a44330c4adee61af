package graft.multimodal

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-17 codec surface — random inputs
  * beyond the hand-built fixtures:
  *
  *  - PROGRESSIVE ≡ BASELINE: a fully-refined SOF2 stream must decode
  *    to exactly the pixels of the baseline encoding of the same
  *    content, for ARBITRARY dims and content (the fixtures pin 4
  *    sizes; the property walks the dim × content space, including
  *    the non-MCU-aligned edge-replication path);
  *  - MP4 PACKAGING IS INVISIBLE: plain two-chunk and fragmented
  *    (moof/trun) packings of the same frames must decode to
  *    identical samples for arbitrary frame counts, sizes, and
  *    fragment groupings — the `video_dedup_mp4` mixed-corpus
  *    contract quantified over the layout space.
  *
  * Driver-side JVM properties (no Spark session): the codecs are
  * row-local by design, so the properties run in milliseconds per
  * case.
  */
class CodecPropertySpec extends AnyFunSuite {

  test("progressive == baseline decoded pixels for arbitrary dims and " +
    "content (60 random cases)") {
    val genCase = for {
      w <- Gen.chooseNum(1, 70)
      h <- Gen.chooseNum(1, 70)
      seed <- Gen.chooseNum(0L, Long.MaxValue - 1)
    } yield (w, h, seed)
    val prop = Prop.forAll(genCase) { case (w, h, seed) =>
      def g(x: Int, y: Int): Int =
        (((x * 31 + y * 57 + 11) * (seed % 251 + 1) + (seed >> 8) % 97)
          % 256).toInt & 0xFF
      val base = JpegCodec.decode(JpegCodec.encodeGray(w, h, g))
      val prog = JpegCodec.decode(JpegCodec.encodeGrayProgressive(w, h, g))
      prog.width == w && prog.height == h &&
        java.util.Arrays.equals(prog.pixels, base.pixels)
    }
    assert(check(Parameters.default.withMinSuccessfulTests(60), prop).passed)
  }

  test("plain and fragmented MP4 packings of the same frames decode to " +
    "identical samples for arbitrary counts and fragment sizes") {
    val genCase = for {
      n <- Gen.chooseNum(1, 9)
      per <- Gen.chooseNum(1, 4)
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, per, seed)
    val prop = Prop.forAll(genCase) { case (n, per, seed) =>
      val frames = (0 until n).map(i =>
        JpegCodec.encode420(16, 8, (x, y) =>
          ((x * 7 + i + seed) % 256, (y * 13 + i) % 256, (x + y + seed) % 256)))
      val plain = Mp4Codec.decode(
        Mp4Codec.encodeMjpeg(frames, 16, 8)).mjpegTrack.get.samples
      val frag = Mp4Codec.decode(
        Mp4Codec.encodeMjpegFragmented(frames, 16, 8, framesPerFragment = per))
        .mjpegTrack.get.samples
      plain.length == n && frag.length == n &&
        plain.zip(frag).forall { case (a, b) => java.util.Arrays.equals(a, b) } &&
        plain.zip(frames).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    }
    assert(check(Parameters.default.withMinSuccessfulTests(40), prop).passed)
  }
}
