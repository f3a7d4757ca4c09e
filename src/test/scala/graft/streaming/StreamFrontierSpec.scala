package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.{GroupC, GroupD, Tables}
import graft.sources.CsvDialect

/** The streaming frontier-discovery gate ([[StreamFrontier]]):
  * single-batch parity with d95's declared batch query, exactly-once
  * discovery across batches, redelivery, and the corpus-seeded base.
  * Pages ride the CSV fixture hex-encoded (they carry `;`/quotes — the
  * StreamImageDedupSpec discipline for delimiter-hostile payloads).
  */
class StreamFrontierSpec extends AnyFunSuite {

  private def hexOf(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).map(b => f"$b%02X").mkString

  private def emptyBase = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq.empty[String].toDF("norm_url")
  }

  test("one-batch stream reproduces d95's per-domain frontier exactly") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val expected = GroupD.queries("d95_frontier_discovery")(spark, sf)
      .select("domain", "n_new_urls").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // the same corpus d95 declares: c15 pages as the arriving batch,
    // the corpus's own canonical URLs (c13's declared output) as base
    val pages = Tables(spark, sf, "documents")
      .select(col("doc_id"), GroupC.frontierHtml.as("html")).collect()
    val base = GroupC.queries("c13_url_normalize")(spark, sf)
      .select("norm_url")
    val dir = tempDir("sfront1")
    csvFile(dir, "b1.csv", "doc_id;html_hex\n" + pages.map(r =>
      s"${r.getLong(0)};${hexOf(r.getString(1))}").mkString("\n") + "\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"),
        expr("decode(unhex(html_hex), 'UTF-8')").as("html"))
    val got = scala.collection.mutable.Map[String, Long]()
    val q = StreamFrontier.start(stream, base, "sfront1",
      (disc, _) => {
        disc.groupBy("domain").agg(count(lit(1)).as("n")).collect()
          .foreach(r => got(r.getString(0)) =
            got.getOrElse(r.getString(0), 0L) + r.getLong(1)); ()
      })
    try q.processAllAvailable() finally q.stop()
    assert(got.toMap == expected,
      s"stream/batch divergence: stream-only ${got.toMap.toSet -- expected.toSet}, " +
        s"batch-only ${expected.toSet -- got.toMap.toSet}")
  }

  test("across batches: a discovered URL never re-emits; redelivered pages discover nothing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("sfront2")
    def page(links: String*): String =
      links.map(u => s"""<a href="$u">x</a>""").mkString("<html>", "", "</html>")
    def csv(rows: (Long, String)*): String =
      "doc_id;html_hex\n" + rows.map { case (i, h) =>
        s"$i;${hexOf(h)}" }.mkString("\n") + "\n"
    // batch 1: one page linking to a base-known URL (drops), a new page
    // in TWO surface forms (collapses to one discovery), and a relative
    // href (refused — not a crawlable target, drops)
    csvFile(dir, "b1.csv", csv(1L -> page(
      "https://known.com/a",
      "HTTPS://WWW.New-1.org:443/p/index.html",
      "https://new-1.org/p/",
      "/relative")))
    val base = Seq("https://known.com/a").toDF("norm_url")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"),
        expr("decode(unhex(html_hex), 'UTF-8')").as("html"))
    val perBatch = scala.collection.mutable.Map[Long, Set[(String, String)]]()
    val q = StreamFrontier.start(stream, base, "sfront2",
      (disc, id) => {
        perBatch(id) = disc.select("norm_url", "domain").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet; ()
      })
    try {
      q.processAllAvailable()
      // batch 2: a DIFFERENT page re-mentions the batch-1 discovery
      // (already known — drops), adds one genuinely new target, and the
      // batch-1 page is REDELIVERED verbatim (every link already known)
      csvFile(dir, "b2.csv", csv(
        2L -> page("https://new-1.org/p/", "http://new-2.net/q"),
        1L -> page(
          "https://known.com/a",
          "HTTPS://WWW.New-1.org:443/p/index.html",
          "https://new-1.org/p/",
          "/relative")))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set(("https://new-1.org/p/", "new-1.org")),
      s"batch 0: ${perBatch.get(0L)}")
    assert(perBatch(1L) == Set(("http://new-2.net/q", "new-2.net")),
      s"batch 1 must re-discover nothing from batch 0 or the base: " +
        s"${perBatch.get(1L)}")
  }

  test("pageUrl: cold start with self-links — arriving pages are known-by-arrival") {
    // the r19 ADVICE case: empty base, pages link to THEMSELVES (the
    // most common outlink in real crawls) — without pageUrl each
    // already-crawled page re-emits as a frontier discovery
    val spark = TestSpark.spark
    val dir = tempDir("sfront3")
    def row(i: Long, self: String, links: String*): String =
      s"$i;$self;" + hexOf(links.map(u => s"""<a href="$u">x</a>""")
        .mkString("<html>", "", "</html>"))
    // page A (surface-form self-link), page B (links to A — same batch,
    // must drop: A is known by arrival), both link one genuinely new URL
    csvFile(dir, "b1.csv", "doc_id;url;html_hex\n" +
      row(1L, "https://a.com/p",
        "HTTPS://WWW.A.com:443/p", "http://new.net/x") + "\n" +
      row(2L, "http://b.org/q", "https://a.com/p") + "\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("url"),
        expr("decode(unhex(html_hex), 'UTF-8')").as("html"))
    val perBatch = scala.collection.mutable.Map[Long, Set[String]]()
    val q = StreamFrontier.start(stream, emptyBase, "sfront3",
      (disc, id) => {
        perBatch(id) = disc.select("norm_url").collect()
          .map(_.getString(0)).toSet; ()
      }, pageUrl = Some("url"))
    try {
      q.processAllAvailable()
      // batch 2: a later page links BACK to batch-1's pages — both are
      // standing-known (own-URL union), so only its fresh target emits
      csvFile(dir, "b2.csv", "doc_id;url;html_hex\n" +
        row(3L, "http://c.io/r", "https://a.com/p", "http://b.org/q",
          "http://new2.net/y") + "\n")
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set("http://new.net/x"),
      s"batch 0 must drop self/intra-batch links: ${perBatch.get(0L)}")
    assert(perBatch(1L) == Set("http://new2.net/y"),
      s"batch 1 must drop links back to arrived pages: ${perBatch.get(1L)}")
  }
}
