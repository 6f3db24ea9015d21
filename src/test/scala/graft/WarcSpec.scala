package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("parseSegment: strict Content-Length parse survives hostile payloads") {
    // payload 2 contains a fake record header AND a blank line — only a
    // length-driven parser gets this right
    val p1 = "hello <b>world</b>"
    val p2 = "WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a record"
    val p3 = "multiébyte 中文 payload" // é + CJK: octet len > char len
    def rec(uri: String, p: String): String = {
      val n = p.getBytes(UTF_8).length
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: $n\r\n\r\n" + p
    }
    val segment = (Seq(rec("u1", p1), rec("u2", p2), rec("u3", p3))
      .mkString("\r\n\r\n") + "\r\n\r\n").getBytes(UTF_8)
    val got = Warc.parseSegment(segment)
    assert(got.map(_.target_uri) == Seq("u1", "u2", "u3"))
    assert(got.map(_.payload) == Seq(p1, p2, p3))
    assert(got(2).content_length == p3.getBytes(UTF_8).length.toLong)
    assert(got.forall(_.warc_type == "response"))
  }

  test("parseSegment: truncated trailer and inter-record noise are skipped") {
    val ok = "WARC/1.0\r\nWARC-Target-URI: good\r\nContent-Length: 2\r\n\r\nab"
    val noise = "\r\n\r\n\n\n junk between records \r\n"
    val truncated = "WARC/1.0\r\nWARC-Target-URI: bad\r\nContent-Len" // no blank line
    val got = Warc.parseSegment((ok + noise + truncated).getBytes(UTF_8))
    assert(got.map(_.target_uri) == Seq("good"))
    assert(got.head.payload == "ab")
  }

  test("writeWarc → readWarc roundtrip is exact, including multibyte payloads") {
    val rows = Seq(
      ("https://a.example/1", "plain text"),
      ("https://a.example/2", "embedded\r\n\r\nblank line and WARC/1.0 magic"),
      ("https://a.example/3", "café 中文 😀"))
      .toDF("uri", "payload")
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toString
    Warc.writeWarc(rows, "uri", "payload", dir)
    val back = Warc.readWarc(spark, dir)
      .select("target_uri", "payload", "warc_type", "record_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(back.map(t => (t._1, t._2)).toSeq ==
      rows.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq)
    assert(back.forall(_._3 == "response"))
    // deterministic record ids: urn:uuid derived from the uri hash
    assert(back.forall(_._4.startsWith("<urn:uuid:")))
    val dir2 = java.nio.file.Files.createTempDirectory("warcspec2").toString
    Warc.writeWarc(rows, "uri", "payload", dir2)
    val ids2 = Warc.readWarc(spark, dir2).select("record_id")
      .as[String].collect().sorted.toSeq
    assert(ids2 == back.map(_._4).sorted.toSeq)
  }
}
