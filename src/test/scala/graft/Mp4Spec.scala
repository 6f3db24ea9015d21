package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Mp4
import graft.ops.Multimodal

/** MP4 (ISO 14496-12) container metadata tests: the writer generates the
  * corpus forward, the parser must recover every moov field exactly; the
  * sample payloads stay opaque by design (no JVM H.264 codec exists), so
  * frame decode falls back while metadata and the sampling plan are real.
  */
class Mp4Spec extends AnyFunSuite {

  test("writer/parser round-trip recovers dims, timing, codec, counts") {
    for ((w, h, n, ms, codec) <- Seq((320, 240, 25, 40, "avc1"),
      (64, 48, 1, 1000, "hvc1"), (1920, 1080, 300, 33, "avc1"))) {
      val bytes = Mp4.encodeVideo(w, h, n, ms, codec)
      val m = Mp4.parse(bytes).get
      assert(m.majorBrand == "isom")
      assert(m.durationMs == n.toLong * ms, s"movie duration $codec")
      val t = m.tracks.find(_.handler == "vide").get
      assert(t.codec == codec && t.width == w && t.height == h)
      assert(t.nSamples == n && t.durationMs == n.toLong * ms)
      assert(t.sampleDeltasMs.length == n && t.sampleDeltasMs.forall(_ == ms))
    }
  }

  test("hostile boxes: truncation, lying sizes, missing moov fail closed") {
    val ok = Mp4.encodeVideo(100, 80, 5, 40)
    assert(Mp4.parse(ok).nonEmpty)
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4.parse("not a container at all".getBytes("US-ASCII")).isEmpty)
    assert(Mp4.parse(ok.take(40)).isEmpty) // moov truncated away
    // a box size that overruns the file must end the walk, not throw/loop
    val lying = ok.clone()
    lying(0) = 0x7f.toByte // ftyp size becomes enormous
    assert(Mp4.parse(lying).isEmpty)
    // a hostile stts sample count cannot force a giant allocation
    val sttsAt = {
      var i = 0
      while (!(ok(i + 4) == 's' && ok(i + 5) == 't' && ok(i + 6) == 't' && ok(i + 7) == 's')) i += 1
      i
    }
    val hostile = ok.clone()
    hostile(sttsAt + 16) = 0x7f.toByte // sample_count ~2^31
    assert(Mp4.parse(hostile).flatMap(_.tracks.headOption).isEmpty)
  }

  test("multimodal sniff: mp4 metadata is real, frame decode falls back") {
    val blob = Multimodal.syntheticMp4Blob("d1", "vid://mp4", 7)
    // id=7: w=55, h=53, frames=17, frameMs=60
    val info = Multimodal.videoInfo(blob.bytes).get
    assert(info.container == "mp4")
    assert(info.width == 55 && info.height == 53, s"${info.width}x${info.height}")
    assert(info.nFrames == 17 && info.durationMs == 17 * 60)
    assert(info.delaysMs.forall(_ == 60))
    // the samples are opaque: no frame can decode, features fall back to
    // the deterministic stub rather than aliasing as all-zero
    assert(Multimodal.videoFrame(blob.bytes, 0).isEmpty)
    val feats = Multimodal.decodeReal(blob)
    val stub = Multimodal.decodeStub(blob)
    assert(feats.feature.sameElements(stub.feature))
  }
}
