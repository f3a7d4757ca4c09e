package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.{GroupD, Tables}
import graft.sources.CsvDialect

/** The streaming ingest gate ([[StreamIngestDedup]]): per-micro-batch
  * parity with d34's declared batch query, and first-arrival-wins
  * ACROSS batches against the growing standing corpus.
  */
class StreamIngestDedupSpec extends AnyFunSuite {

  test("one-batch stream reproduces d34's batch survivors exactly") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents")
    val deltaPred = col("source").isin("src17", "src18", "src19")
    val expected = GroupD.queries("d34_dedup_incremental")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val delta = docs.filter(deltaPred).select("doc_id", "text").collect()
    assert(delta.nonEmpty)
    val dir = tempDir("singest1")
    csvFile(dir, "b1.csv", "doc_id;text\n" + delta.map(r =>
      s"${r.getLong(0)};${r.getString(1)}").mkString("\n") + "\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val got = scala.collection.mutable.Set[Long]()
    val q = StreamIngestDedup.start(stream,
      docs.filter(!deltaPred).select("doc_id", "text"), "singest1",
      (surv, _) => { got ++= surv.select("doc_id").collect().map(_.getLong(0)); () })
    try q.processAllAvailable() finally q.stop()
    assert(got.toSet == expected,
      s"stream/batch divergence: stream-only ${got.toSet -- expected}, " +
        s"batch-only ${expected -- got.toSet}")
  }

  test("across batches, a later near-dup of an accepted doc drops; unique docs pass") {
    val spark = TestSpark.spark
    import spark.implicits._
    // disjoint vocabularies make the intent unambiguous: J(D3, D1) = 1.0,
    // J(D2, B1) = 1.0, everything else shares no shingle
    val tBase = "alpha beta gamma delta epsilon zeta eta theta"
    val tUniq = "one two three four five six seven eight"
    val tNew = "red orange yellow green blue indigo violet umber"
    val base = Seq((1L, tBase)).toDF("doc_id", "text")
    val dir = tempDir("singest2")
    def csv(rows: (Long, String)*): String =
      "doc_id;text\n" + rows.map { case (i, t) => s"$i;$t" }.mkString("\n") + "\n"
    csvFile(dir, "b1.csv", csv(10L -> tUniq, 11L -> tBase)) // D1 unique, D2 ≈ B1
    val stream = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val perBatch = scala.collection.mutable.Map[Long, Set[Long]]()
    val q = StreamIngestDedup.start(stream, base, "singest2",
      (surv, id) => {
        perBatch(id) = surv.select("doc_id").collect().map(_.getLong(0)).toSet; ()
      })
    try {
      q.processAllAvailable()
      // D3 duplicates the ACCEPTED D1 (cross-batch drop); D4 is unique;
      // doc 10 is REDELIVERED verbatim (at-least-once source) and must
      // not re-emit or re-enter the standing side
      csvFile(dir, "b2.csv", csv(20L -> tUniq, 21L -> tNew, 10L -> tUniq))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set(10L), s"batch 0: ${perBatch.get(0L)}")
    assert(perBatch(1L) == Set(21L),
      s"batch 1 must drop the cross-batch dup AND the redelivery, keep the unique: ${perBatch.get(1L)}")
  }

  test("durable store: restart remembers survivors, compaction keeps one snapshot, damage fails loudly (r18)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tBase = "alpha beta gamma delta epsilon zeta eta theta"
    val tUniq = "one two three four five six seven eight"
    val tNew = "red orange yellow green blue indigo violet umber"
    val base = Seq((1L, tBase)).toDF("doc_id", "text")
    def csv(rows: (Long, String)*): String =
      "doc_id;text\n" + rows.map { case (i, t) => s"$i;$t" }.mkString("\n") + "\n"
    val store = tempDir("singest-store").resolve("store").toString

    // run 1: two batches with compactEvery=1 — the store compacts to one
    // marker-adjudicated snapshot after every batch
    val dir1 = tempDir("singest3a")
    csvFile(dir1, "b1.csv", csv(10L -> tUniq))
    val s1 = CsvStream.readStream(spark, dir1, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val q1 = StreamIngestDedup.start(s1, base, "singest3a",
      (_, _) => (), Some(store), compactEvery = 1)
    try {
      q1.processAllAvailable()
      csvFile(dir1, "b2.csv", csv(21L -> tNew))
      q1.processAllAvailable()
    } finally q1.stop()
    val snap = spark.read.parquet(store)
    assert(snap.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 21L), "compacted store must hold both accepted survivors")

    // run 2 (the restart): a near-dup of run 1's accepted doc must DROP —
    // the store, not driver memory, carries the history
    val dir2 = tempDir("singest3b")
    csvFile(dir2, "b1.csv", csv(30L -> tUniq, 31L -> "nine ten eleven twelve thirteen fourteen fifteen sixteen"))
    val s2 = CsvStream.readStream(spark, dir2, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val got = scala.collection.mutable.Set[Long]()
    val q2 = StreamIngestDedup.start(s2, base, "singest3b",
      (surv, _) => { got ++= surv.select("doc_id").collect().map(_.getLong(0)); () },
      Some(store))
    try q2.processAllAvailable() finally q2.stop()
    assert(got.toSet == Set(31L),
      s"restart must drop the store-remembered near-dup, keep the unique: $got")

    // damage: a store dir with data-looking content but NO _SUCCESS
    // marker must fail the restart loudly (pre-r18 this gate silently
    // treated ANY restore failure as an empty store)
    val damaged = tempDir("singest-dmg").resolve("store")
    java.nio.file.Files.createDirectories(damaged)
    java.nio.file.Files.writeString(damaged.resolve("part-00000.parquet"), "junk")
    intercept[java.io.IOException] {
      StreamIngestDedup.start(s2, base, "singest3c", (_, _) => (),
        Some(damaged.toString))
    }
  }
}
