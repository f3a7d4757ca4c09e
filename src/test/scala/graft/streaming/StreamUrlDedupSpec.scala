package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.{GroupC, GroupD, Tables}
import graft.sources.CsvDialect

/** The streaming canonical-URL gate ([[StreamUrlDedup]]): single-batch
  * parity with d92's declared batch query, first-arrival-wins ACROSS
  * batches (surface variants of an accepted page drop), redelivery, the
  * refusal passthrough contract, and the durable store restart.
  */
class StreamUrlDedupSpec extends AnyFunSuite {

  private def emptyBase = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq.empty[String].toDF("norm_url")
  }

  test("one-batch stream reproduces d92's batch keepers exactly") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val expected = GroupD.queries("d92_url_dedup")(spark, sf)
      .select("norm_url", "keep_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val input = Tables(spark, sf, "documents")
      .select(col("doc_id"), GroupC.d92Url.as("url")).collect()
    val dir = tempDir("surl1")
    csvFile(dir, "b1.csv", "doc_id;url\n" + input.map(r =>
      s"${r.getLong(0)};${r.getString(1)}").mkString("\n") + "\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("url"))
    val got = scala.collection.mutable.Map[String, Long]()
    val q = StreamUrlDedup.start(stream, emptyBase, "surl1",
      (surv, _) => {
        got ++= surv.select("norm_url", "doc_id").collect()
          .map(r => r.getString(0) -> r.getLong(1)); ()
      })
    try q.processAllAvailable() finally q.stop()
    assert(got.toMap == expected,
      s"stream/batch divergence: stream-only ${got.toMap.toSet -- expected.toSet}, " +
        s"batch-only ${expected.toSet -- got.toMap.toSet}")
  }

  test("across batches: surface variants of accepted pages drop, redeliveries drop, refusals pass through") {
    val spark = TestSpark.spark
    val dir = tempDir("surl2")
    def csv(rows: (Long, String)*): String =
      "doc_id;url\n" + rows.map { case (i, u) => s"$i;$u" }.mkString("\n") + "\n"
    // batch 1: one real page (surface form 1) + one refused (relative)
    csvFile(dir, "b1.csv", csv(
      1L -> "HTTP://WWW.Page-A.com:80/read/1/index.html?id=1&utm_source=f#top",
      2L -> "/relative/path"))
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("url"))
    val perBatch = scala.collection.mutable.Map[Long, Set[Long]]()
    val normSeen = scala.collection.mutable.Map[Long, Option[String]]()
    val q = StreamUrlDedup.start(stream, emptyBase, "surl2",
      (surv, id) => {
        perBatch(id) = surv.select("doc_id").collect().map(_.getLong(0)).toSet
        normSeen(id * 100 + 2) = surv.filter(col("doc_id") === 2)
          .select("norm_url").collect().headOption.map(r =>
            Option(r.getString(0)).getOrElse("NULL"))
        ()
      })
    try {
      q.processAllAvailable()
      // batch 2: the SAME page in a different surface form (must drop),
      // a redelivery of doc 1 verbatim (must drop), a NEW page (passes),
      // and the refused row REDELIVERED (passes through again — the
      // monotone-gate contract: refusals are never keyed, never gated)
      csvFile(dir, "b2.csv", csv(
        10L -> "http://page-a.com/read/1/?id=1",
        1L -> "HTTP://WWW.Page-A.com:80/read/1/index.html?id=1&utm_source=f#top",
        11L -> "https://page-b.org/x",
        2L -> "/relative/path"))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set(1L, 2L), s"batch 0: ${perBatch.get(0L)}")
    assert(normSeen(2L) == Some("NULL"),
      "the refused row must pass through with norm_url NULL")
    assert(perBatch(1L) == Set(11L, 2L),
      "batch 1 must drop the surface variant AND the redelivery, keep " +
        s"the new page and the refused passthrough: ${perBatch.get(1L)}")
  }

  test("within a batch, d92's keeper rule applies: smallest doc_id per canonical URL") {
    val spark = TestSpark.spark
    val dir = tempDir("surl3")
    // three surface forms of ONE page in one batch, ids out of order
    csvFile(dir, "b1.csv", "doc_id;url\n" +
      "7;https://one.com/p/\n" +
      "3;HTTPS://WWW.One.com:443/p/index.html\n" +
      "5;https://one.com/p/?utm_campaign=x\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("url"))
    val got = scala.collection.mutable.Set[Long]()
    val q = StreamUrlDedup.start(stream, emptyBase, "surl3",
      (surv, _) => { got ++= surv.select("doc_id").collect().map(_.getLong(0)); () })
    try q.processAllAvailable() finally q.stop()
    assert(got.toSet == Set(3L), s"keeper must be the smallest doc_id: $got")
  }

  test("durable store: restart remembers accepted URLs; base seeds the gate") {
    val spark = TestSpark.spark
    import spark.implicits._
    val store = tempDir("surl-store").resolve("store").toString
    def csv(rows: (Long, String)*): String =
      "doc_id;url\n" + rows.map { case (i, u) => s"$i;$u" }.mkString("\n") + "\n"

    // run 1: accept one page, compacting every batch
    val dir1 = tempDir("surl4a")
    csvFile(dir1, "b1.csv", csv(1L -> "https://keep.com/a"))
    val s1 = CsvStream.readStream(spark, dir1, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("url"))
    val q1 = StreamUrlDedup.start(s1, emptyBase, "surl4a",
      (_, _) => (), Some(store), compactEvery = 1)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(store).select("norm_url").collect()
      .map(_.getString(0)).toSet == Set("https://keep.com/a"))

    // run 2 (restart): a surface variant of run 1's accepted page must
    // drop — the store, not driver memory, carries the history. A page
    // in the BASE frame (d92's output shape) must drop too.
    val dir2 = tempDir("surl4b")
    csvFile(dir2, "b1.csv", csv(
      20L -> "HTTPS://WWW.Keep.com/a",
      21L -> "https://base.org/seeded",
      22L -> "https://new.net/q"))
    val s2 = CsvStream.readStream(spark, dir2, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("url"))
    val base = Seq("https://base.org/seeded").toDF("norm_url")
    val got = scala.collection.mutable.Set[Long]()
    val q2 = StreamUrlDedup.start(s2, base, "surl4b",
      (surv, _) => { got ++= surv.select("doc_id").collect().map(_.getLong(0)); () },
      Some(store))
    try q2.processAllAvailable() finally q2.stop()
    assert(got.toSet == Set(22L),
      s"restart must drop the store-remembered and base-seeded pages: $got")
  }
}
