package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Webm
import graft.ops.Multimodal

/** WebM/Matroska (EBML) container metadata tests — writer-forward corpus,
  * parser must recover every element exactly; frame payloads stay opaque
  * (no JVM VP8/VP9 codec) so decode falls back while metadata is real.
  */
class WebmSpec extends AnyFunSuite {

  test("writer/parser round-trip recovers codec, dims, duration, schedule") {
    for ((w, h, n, ms, codec) <- Seq((640, 360, 24, 40, "V_VP9"),
      (128, 96, 1, 500, "V_VP8"), (1920, 1080, 60, 33, "V_VP9"))) {
      val bytes = Webm.encodeVideo(w, h, n, ms, codec)
      val m = Webm.parse(bytes).get
      assert(m.docType == "webm")
      assert(m.durationMs == n.toLong * ms, s"duration $codec")
      val t = m.tracks.find(_.trackType == 1).get
      assert(t.codec == codec && t.width == w && t.height == h)
      assert(t.nFrames == n)
      assert(t.frameTsMs.toSeq == (0 until n).map(_.toLong * ms))
    }
  }

  test("hostile streams fail closed: truncation, lying sizes, non-EBML") {
    val ok = Webm.encodeVideo(100, 80, 5, 40)
    assert(Webm.parse(ok).nonEmpty)
    assert(Webm.parse(Array.emptyByteArray).isEmpty)
    assert(Webm.parse("plain text, not a container".getBytes("US-ASCII")).isEmpty)
    // truncating mid-segment loses elements but must not throw
    Webm.parse(ok.take(ok.length / 2)) // value irrelevant
    // a child size pointing past the parent ends the walk, not the JVM
    val lying = ok.clone()
    lying(5) = 0xFE.toByte
    Webm.parse(lying) // must not throw
  }

  test("multimodal sniff: webm metadata rides videoInfo, frames fall back") {
    val blob = Multimodal.syntheticWebmBlob("d1", "vid://webm", 11)
    // id=11: w=51, h=30+(121%19)=37, frames=21, frameMs=40+(11%5)*10=50
    val info = Multimodal.videoInfo(blob.bytes).get
    assert(info.container == "webm")
    assert(info.width == 51 && info.height == 37, s"${info.width}x${info.height}")
    assert(info.nFrames == 21 && info.durationMs == 21 * 50)
    assert(info.delaysMs.forall(_ == 50), info.delaysMs.toSeq.toString)
    assert(Multimodal.videoFrame(blob.bytes, 0).isEmpty)
    val feats = Multimodal.decodeReal(blob)
    assert(feats.feature.sameElements(Multimodal.decodeStub(blob).feature))
  }
}
