package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.Tables
import graft.sources.CsvDialect

/** Streaming decontamination gate: per-micro-batch bloom tagging agrees
  * one-sidedly with the batch d19 exact answer, and the stage stays
  * map-only (no shuffle, no streaming state).
  */
class StreamDeconSpec extends AnyFunSuite {

  test("streamed tags are one-sided vs batch d19 and the plan is stateless") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents")
    val bloom = StreamDecon.benchmarkBloom(docs.filter(col("source") === "src0"))

    // exact per-doc shared counts from the proven batch query
    val exact = graft.queries.GroupD.queries("d19_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

    // stream the train docs in two micro-batches through a csv source
    val train = docs.filter(col("source") =!= "src0")
      .select("doc_id", "text").collect()
    assert(train.nonEmpty)
    val (b1, b2) = train.splitAt(train.length / 2)
    def csv(rows: Array[org.apache.spark.sql.Row]): String =
      "doc_id;text\n" + rows.map(r =>
        s"${r.getLong(0)};${r.getString(1)}").mkString("\n") + "\n"
    val dir = tempDir("sdecon")
    csvFile(dir, "b1.csv", csv(b1))
    val stream = CsvStream.readStream(spark, dir,
        CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val tagged = StreamDecon.tag(stream, bloom)
    val got = scala.collection.mutable.Map[Long, Long]()
    val q = tagged.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= df.select("doc_id", "n_shared_est").collect()
          .map(r => r.getLong(0) -> r.getLong(1)); ()
      }.start()
    try {
      q.processAllAvailable()
      csvFile(dir, "b2.csv", csv(b2))
      q.processAllAvailable()
    } finally q.stop()

    assert(got.keySet == exact.keySet, "every train doc tagged exactly once")
    // one-sided: est >= exact per doc (bloom has no false negatives), so
    // every truly-contaminated doc is flagged
    for ((id, n) <- exact) assert(got(id) >= n,
      s"doc $id: est ${got(id)} < exact $n — bloom false negative?!")
    val flagged = got.count(_._2 > 0)
    val truly = exact.count(_._2 > 0)
    info(s"flagged $flagged of ${got.size} (truly contaminated: $truly)")
    // and the estimate is not degenerate (all-flagged would also be
    // "one-sided"): clean docs overwhelmingly stay clean at the bloom's FP
    // rate; require at least half the truly-clean docs stay unflagged
    assert(flagged - truly <= (got.size - truly) / 2,
      s"bloom FP rate degenerate: $flagged flagged vs $truly truly contaminated")

    // the gate is a pure projection: no shuffle exchange, no state store
    val plan = tagged.queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate") && !plan.contains("Join"),
      "tag() must stay map-only (no shuffle, no stream state)")
  }

  test("NULL text tags as clean (0 shared), not as a silent third state") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val bloom = StreamDecon.benchmarkBloom(docs.filter(col("source") === "src0"))
    val tagged = StreamDecon.tag(
      Seq((1L, Option.empty[String]), (2L, Some("")), (3L, Some("xy")))
        .toDF("doc_id", "text"), bloom)
      .orderBy("doc_id").collect()
    // filter(contaminated) and filter(!contaminated) must partition the
    // stream: every row carries a non-NULL tag
    assert(tagged.forall(r => !r.isNullAt(2) && !r.isNullAt(3)))
    assert(tagged.forall(_.getLong(2) == 0L), "no text -> no shared shingles")
    assert(tagged.forall(!_.getBoolean(3)))
  }
}
