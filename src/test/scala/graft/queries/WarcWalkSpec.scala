package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** c16's WARC framing walk: invariants the DuckDB hash gate cannot see
  * (it never parses the blob) — exact framing exhaustion, the ASCII
  * precondition that makes character offsets byte offsets, agreement
  * with c11's independently declared markup chain, and the walk's
  * robustness to blank lines INSIDE record bodies (the reason
  * Content-Length arithmetic, not split-on-blank-line, is the framing).
  */
class WarcWalkSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("c16 output shape and evidence trail") {
    val spark = TestSpark.spark
    val out = GroupC.queries("c16_warc_extract")(spark, sf)
    val rows = out.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getAs[String]("rec_types")
      == "warcinfo,request,response"),
      "an offset slip would mis-type a record")
    assert(rows.forall(r => Set(200L, 301L)(r.getAs[Long]("http_status"))))
    assert(rows.forall(_.getAs[String]("target_uri").contains("://")))
  }

  test("walk agrees with c11's declared markup chain on title/clean text") {
    val spark = TestSpark.spark
    val c16 = GroupC.queries("c16_warc_extract")(spark, sf)
      .select("doc_id", "title", "clean_text")
    val c11 = GroupC.queries("c11_markup_extract")(spark, sf)
      .select("doc_id", "title", "clean_text")
    assert(c16.exceptAll(c11).isEmpty && c11.exceptAll(c16).isEmpty,
      "the payload the walk frames must be exactly the c11 page")
  }

  test("framing exhausts the blob exactly and the corpus is ASCII") {
    // re-walk the CONSTRUCTED blob in plain JVM code: skip all three
    // records by their own Content-Length framing and assert the final
    // terminator lands exactly at end-of-string — any construction or
    // framing drift leaves a tail or overruns
    val spark = TestSpark.spark
    val blobs = Tables(spark, sf, "documents")
      .select(col("doc_id"), GroupC.c16Blob.as("w")).collect()
    assert(blobs.nonEmpty)
    val CLen = "Content-Length: ([0-9]+)".r
    blobs.foreach { r =>
      val w = r.getAs[String]("w")
      // ASCII precondition: chars == bytes for the whole container
      assert(w.forall(_ < 0x80), s"non-ASCII in doc ${r.getAs[Long]("doc_id")}")
      var pos = 0
      var types = List.empty[String]
      (1 to 3).foreach { _ =>
        val hEnd = w.indexOf("\r\n\r\n", pos)
        assert(hEnd >= 0, "missing header terminator")
        val hdr = w.substring(pos, hEnd)
        assert(hdr.startsWith("WARC/1.0\r\n"), "record must open with the version line")
        types :+= "WARC-Type: (\\S+)".r.findFirstMatchIn(hdr).get.group(1)
        val n = CLen.findFirstMatchIn(hdr).get.group(1).toInt
        pos = hEnd + 4 + n + 4
      }
      assert(pos == w.length,
        s"framing must exhaust the blob: pos=$pos len=${w.length} " +
          s"doc=${r.getAs[Long]("doc_id")}")
      assert(types == List("warcinfo", "request", "response"))
    }
  }

  test("bodies containing blank lines do not confuse the framing") {
    // the constructed request body ENDS with CRLF CRLF (the HTTP request
    // terminator) and the response body CONTAINS one (header/payload
    // split): a split-on-blank-line walker would mis-frame both; the
    // Content-Length walk must still type record 3 as 'response' and
    // extract a payload whose clean text is non-empty
    val spark = TestSpark.spark
    val out = GroupC.queries("c16_warc_extract")(spark, sf)
      .agg(count(when(col("n_chars_clean") > 0L, 1L)).as("n_ok"),
        count(lit(1)).as("n"))
      .collect()(0)
    assert(out.getAs[Long]("n_ok") == out.getAs[Long]("n"))
  }
}
