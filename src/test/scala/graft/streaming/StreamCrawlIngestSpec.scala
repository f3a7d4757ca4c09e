package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.{GroupC, GroupD, Tables}
import graft.sources.CsvDialect

/** The streaming crawl-ingest gate ([[StreamCrawlIngest]]): single-batch
  * funnel parity with d96's declared batch query, first-arrival-wins
  * across batches on BOTH standing axes (canonical URL and text
  * fingerprint — including the quality-rejected-URL arm), d96's keeper
  * rules within a batch, and the durable store restart with seeded
  * bases. Pages ride the CSV fixture hex-encoded where they carry
  * `;`/quotes (the StreamImageDedupSpec discipline).
  */
class StreamCrawlIngestSpec extends AnyFunSuite {

  private def hexOf(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).map(b => f"$b%02X").mkString

  private def emptyUrls = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq.empty[String].toDF("norm_url")
  }
  private def emptySigs = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq.empty[String].toDF("sig")
  }

  /** A text that passes every Gopher rule (63 words, mean length ~4,
    * all-alpha, stopword-bearing, symbol-free), made distinct per doc by
    * the salt word. */
  private def goodText(salt: String): String =
    (Seq.fill(7)("the data flows and the model trains with care")
      .mkString(" ")) + " " + salt

  private def page(text: String): String =
    s"<html><body><p>$text</p></body></html>"

  private def stream(dir: java.nio.file.Path) = {
    val spark = TestSpark.spark
    CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"),
        expr("decode(unhex(page_hex), 'UTF-8')").as("page"), col("url"))
  }

  private def csv(rows: (Long, String, String)*): String =
    "doc_id;page_hex;url\n" + rows.map { case (i, p, u) =>
      s"$i;${hexOf(p)};$u" }.mkString("\n") + "\n"

  test("one-batch stream reproduces d96's funnel and keepers exactly") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val expected = GroupD.queries("d96_crawl_ingest_e2e")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    // the same corpus d96 declares: c11 pages, d92 collision URLs
    val input = Tables(spark, sf, "documents")
      .select(col("doc_id"), GroupC.c11Html.as("page"),
        GroupC.d92Url.as("url")).collect()
    val dir = tempDir("scrawl1")
    csvFile(dir, "b1.csv", "doc_id;page_hex;url\n" + input.map(r =>
      s"${r.getLong(0)};${hexOf(r.getString(1))};${r.getString(2)}")
      .mkString("\n") + "\n")
    val funnel = scala.collection.mutable.Set[(String, Long, Long, Long)]()
    val kept = scala.collection.mutable.Set[Long]()
    val q = StreamCrawlIngest.start(stream(dir), emptyUrls, emptySigs,
      "scrawl1",
      (surv, _) => { kept ++= surv.select("doc_id").collect()
        .map(_.getLong(0)); () },
      funnelSink = Some((f, _) => { funnel ++= f.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))); () }))
    try q.processAllAvailable() finally q.stop()
    assert(funnel.toSet == expected,
      s"funnel divergence: stream-only ${funnel.toSet -- expected}, " +
        s"batch-only ${expected -- funnel.toSet}")
    assert(kept.size == expected.find(_._1 == "4_exact_dedup").get._3,
      "survivor count must equal the funnel's final stage")
  }

  test("WARC-fed stream: interchange bytes through the gate reproduce d99's funnel") {
    // the live analogue of d99: the arriving frame is raw WARC blobs,
    // walked (the SHARED warcWalk) into (page, url) IN USER SPACE before
    // the gate — proving the whole live ingest path composes from
    // interchange bytes with zero gate changes
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val expected = GroupD.queries("d99_warc_pipeline_e2e")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val input = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        GroupC.c16BlobWith(GroupC.d92Url, GroupC.c11Html).as("warc"))
      .collect()
    val dir = tempDir("scrawlw")
    csvFile(dir, "b1.csv", "doc_id;warc_hex\n" + input.map(r =>
      s"${r.getLong(0)};${hexOf(r.getString(1))}").mkString("\n") + "\n")
    val walked = GroupC.warcWalk(
      CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("decode(unhex(warc_hex), 'UTF-8')").as("warc")))
      .select(col("doc_id"), col("payload").as("page"),
        regexp_extract(col("hdr3"), GroupC.WarcUriP, 1).as("url"))
    val funnel = scala.collection.mutable.Set[(String, Long, Long, Long)]()
    val q = StreamCrawlIngest.start(walked, emptyUrls, emptySigs,
      "scrawlw", (_, _) => (),
      funnelSink = Some((f, _) => { funnel ++= f.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))); () }))
    try q.processAllAvailable() finally q.stop()
    assert(funnel.toSet == expected,
      s"WARC-fed stream/batch divergence: stream-only " +
        s"${funnel.toSet -- expected}, batch-only ${expected -- funnel.toSet}")
  }

  test("across batches: both standing axes drop re-arrivals, including quality-rejected URLs") {
    val spark = TestSpark.spark
    val dir = tempDir("scrawl2")
    // batch 1: doc 1 passes end to end; doc 3's text fails gopher, so
    // its URL is accepted at stage 2 but the doc never emits
    csvFile(dir, "b1.csv", csv(
      (1L, page(goodText("alpha")), "https://site-a.com/p1"),
      (3L, page("hi"), "https://site-b.com/rejected")))
    val perBatch = scala.collection.mutable.Map[Long, Set[Long]]()
    val q = StreamCrawlIngest.start(stream(dir), emptyUrls, emptySigs,
      "scrawl2",
      (surv, id) => { perBatch(id) = surv.select("doc_id").collect()
        .map(_.getLong(0)).toSet; () })
    try {
      q.processAllAvailable()
      // batch 2: (10) a surface variant of doc 1's URL — drops at the
      // URL axis; (11) doc 1's exact text under a new URL — drops at
      // the fingerprint axis; (12) the REJECTED page re-fetched, now
      // with good text — still drops: its URL entered standing at
      // stage-2 acceptance (d96 over the concatenated corpus would
      // drop it at the URL window); (13) a genuinely new doc — passes
      csvFile(dir, "b2.csv", csv(
        (10L, page(goodText("beta")), "HTTPS://WWW.Site-A.com:443/p1"),
        (11L, page(goodText("alpha")), "https://site-c.net/other"),
        (12L, page(goodText("gamma")), "https://site-b.com/rejected"),
        (13L, page(goodText("delta")), "https://site-d.io/new")))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set(1L), s"batch 0: ${perBatch.get(0L)}")
    assert(perBatch(1L) == Set(13L),
      "batch 1 must drop the URL variant, the text re-arrival AND the " +
        s"re-fetched rejected URL: ${perBatch.get(1L)}")
  }

  test("within a batch, d96's keeper rules apply on both axes: smallest doc_id wins") {
    val spark = TestSpark.spark
    val dir = tempDir("scrawl3")
    // docs 7/3: one canonical URL in two surface forms (URL keeper);
    // docs 5/9: one text under two URLs (fingerprint keeper)
    csvFile(dir, "b1.csv", csv(
      (7L, page(goodText("one")), "https://one.com/p/"),
      (3L, page(goodText("two")), "HTTPS://WWW.One.com:443/p/index.html"),
      (5L, page(goodText("twin")), "https://two.org/a"),
      (9L, page(goodText("twin")), "https://two.org/b")))
    val got = scala.collection.mutable.Set[Long]()
    val q = StreamCrawlIngest.start(stream(dir), emptyUrls, emptySigs,
      "scrawl3",
      (surv, _) => { got ++= surv.select("doc_id").collect()
        .map(_.getLong(0)); () })
    try q.processAllAvailable() finally q.stop()
    assert(got.toSet == Set(3L, 5L),
      s"keepers must be the smallest doc_id per axis: $got")
  }

  test("durable store: restart remembers both key sets; bases seed the gate") {
    val spark = TestSpark.spark
    import spark.implicits._
    val store = tempDir("scrawl-store").resolve("store").toString

    // run 1: accept one page, compacting every batch
    val dir1 = tempDir("scrawl4a")
    csvFile(dir1, "b1.csv", csv(
      (1L, page(goodText("keep")), "https://keep.com/a")))
    val q1 = StreamCrawlIngest.start(stream(dir1), emptyUrls, emptySigs,
      "scrawl4a", (_, _) => (), standingStore = Some(store),
      compactEvery = 1)
    try q1.processAllAvailable() finally q1.stop()
    val keys = spark.read.parquet(store).select("key").collect()
      .map(_.getString(0)).toSet
    assert(keys.exists(_.startsWith("u:https://keep.com/a")) &&
      keys.exists(_.startsWith("s:")), s"store must carry both axes: $keys")

    // run 2 (restart): a surface variant of run 1's URL and its exact
    // text under a new URL must both drop (the store carries the
    // history); base-seeded URL and sig must drop too; a new doc passes
    val dir2 = tempDir("scrawl4b")
    val seededText = goodText("seeded")
    csvFile(dir2, "b1.csv", csv(
      (20L, page(goodText("x")), "HTTPS://WWW.Keep.com/a"),
      (21L, page(goodText("keep")), "https://elsewhere.org/t"),
      (22L, page(goodText("y")), "https://base.org/seeded-url"),
      (23L, page(seededText), "https://fresh.net/s"),
      (24L, page(goodText("new")), "https://new.net/q")))
    val baseUrls = Seq("https://base.org/seeded-url").toDF("norm_url")
    // the sig the gate would compute for doc 23's cleaned text — derived
    // through the SAME kernel, so the seed matches by construction
    val baseSigs = spark.range(1)
      .select(GroupC.markupClean(lit(page(seededText))).as("t"))
      .select(md5(col("t")).as("sig"))
    val got = scala.collection.mutable.Set[Long]()
    val q2 = StreamCrawlIngest.start(stream(dir2), baseUrls, baseSigs,
      "scrawl4b",
      (surv, _) => { got ++= surv.select("doc_id").collect()
        .map(_.getLong(0)); () },
      standingStore = Some(store))
    try q2.processAllAvailable() finally q2.stop()
    assert(got.toSet == Set(24L),
      s"restart must drop store-remembered and base-seeded arrivals: $got")
  }

  test("reserved names fail fast") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("scrawl5")
    csvFile(dir, "b1.csv", "doc_id;page_hex;url\n")
    val bad = stream(dir).withColumn("sig", lit("x"))
    val e = intercept[IllegalArgumentException] {
      StreamCrawlIngest.start(bad, emptyUrls, emptySigs, "scrawl5",
        (_, _) => ())
    }
    assert(e.getMessage.contains("sig"))
  }
}
