package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.Tables
import graft.sources.CsvDialect

/** The streaming funnel twin: per-micro-batch observed (docs_in,
  * docs_out) metrics sum to the batch gate's counts, and the emitted
  * survivor set is exactly the batch gate's — the per-document rule makes
  * the decomposition exact, which is what lets a live dashboard's funnel
  * agree with the nightly batch audit (d56's gate row).
  */
class StreamFunnelSpec extends AnyFunSuite {

  test("observed per-batch funnel metrics sum to the batch gate exactly") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents")

    // the batch truth: d18's rule (≥3 tokens, dup_fp < 1000)
    val batchKept = graft.queries.GroupD.d18Repetition(spark, sf)
      .filter(!col("repetitive")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val total = docs.count()

    val rows = docs.select("doc_id", "text").collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    def csv(rs: Array[org.apache.spark.sql.Row]): String =
      "doc_id;text\n" + rs.map(r =>
        s"${r.getLong(0)};${r.getString(1)}").mkString("\n") + "\n"
    val dir = tempDir("sfunnel")
    csvFile(dir, "b1.csv", csv(b1))

    val stream = CsvStream.readStream(spark, dir,
        CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val gated = StreamFunnel.gateWithMetrics(stream)
    val emitted = scala.collection.mutable.Set[Long]()
    val q = gated.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        emitted ++= df.select("doc_id").collect().map(_.getLong(0)); ()
      }.start()
    try {
      q.processAllAvailable()
      csvFile(dir, "b2.csv", csv(b2))
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(StreamFunnel.MetricName)))
      val in = metrics.map(_.getLong(0)).sum
      val out = metrics.map(_.getLong(1)).sum
      assert(in == total, s"docs_in $in != $total streamed")
      assert(out == batchKept.size.toLong,
        s"docs_out $out != batch gate ${batchKept.size}")
      assert(emitted == batchKept, "survivor set diverged from the batch gate")
    } finally q.stop()
  }
}
