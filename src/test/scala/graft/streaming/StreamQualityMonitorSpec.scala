package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.Tables
import graft.sources.CsvDialect

/** The cumulative per-source monitor: snapshots after each micro-batch
  * equal the batch-computed prefix totals, and the final state equals the
  * whole-corpus gate statistics — cross-batch state accumulation under
  * mapGroupsWithState, pinned against the proven batch rule (d18's).
  */
class StreamQualityMonitorSpec extends AnyFunSuite {

  test("per-source snapshots accumulate exactly across micro-batches") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents")

    // batch truth per source over the FULL corpus: doc count, gate drops
    // (d18's rule: <3 tokens or repetitive), token count
    val kept = graft.queries.GroupD.d18Repetition(spark, sf)
      .filter(!col("repetitive")).select("doc_id")
    val truth = docs
      .join(kept.withColumn("k", lit(1)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("drops"),
        sum(size(split(trim(lower(regexp_replace(col("text"),
          "[^a-zA-Z0-9]+", " "))), " ")).cast("long")).as("toks"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val rows = docs.select("doc_id", "source", "text").collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    def csv(rs: Array[org.apache.spark.sql.Row]): String =
      "doc_id;source;text\n" + rs.map(r =>
        s"${r.getLong(0)};${r.getString(1)};${r.getString(2)}").mkString("\n") + "\n"
    val dir = tempDir("smon")
    csvFile(dir, "b1.csv", csv(b1))
    val stream = CsvStream.readStream(spark, dir,
        CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("text"))
    // latest snapshot per source wins (Update-mode semantics)
    val latest = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    var batchDocsTotal = 0L
    val q = StreamQualityMonitor.monitor(spark, stream)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SourceSnapshot], _: Long) =>
        df.collect().foreach { s =>
          batchDocsTotal += s.batch_docs
          latest(s.source) = (s.n_docs, s.n_dropped, s.n_tokens)
          assert(s.drop_rate_fp == s.n_dropped * 10000L / math.max(s.n_docs, 1L))
        }; ()
      }.start()
    try {
      q.processAllAvailable()
      // mid-stream: cumulative counts must equal the prefix truth
      val prefix = b1.groupBy(_.getString(1)).view.mapValues(_.length.toLong)
      prefix.foreach { case (src, n) =>
        assert(latest(src)._1 == n, s"$src mid-stream doc count")
      }
      csvFile(dir, "b2.csv", csv(b2))
      q.processAllAvailable()
      assert(batchDocsTotal == rows.length.toLong, "every doc counted once")
      assert(latest.keySet == truth.keySet)
      truth.foreach { case (src, (n, drops, toks)) =>
        assert(latest(src) == ((n, drops, toks)),
          s"$src final ${latest(src)} != batch ($n, $drops, $toks)")
      }
    } finally q.stop()
  }
}
