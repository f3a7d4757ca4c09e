package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.Tables
import graft.sources.CsvDialect

/** The streaming snapshot-diff CDC gate ([[StreamSnapshotDiff]]):
  * union(per-batch emissions, terminal removals) must equal the batch
  * diff of the same two snapshots (d55's semantics), across multiple
  * micro-batches and under redelivery.
  */
class StreamSnapshotDiffSpec extends AnyFunSuite {

  test("multi-batch stream + removals reproduce the batch diff exactly") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents")
      .filter(col("text").isNotNull) // CSV transport for the spec fixture
    // d55's snapshot derivations on the same corpus
    val snapA = docs.filter(!col("source").isin("src17", "src18", "src19"))
      .select(col("doc_id"), col("text"))
    val snapB = docs.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).as("text"))
    // expected: the batch full-outer diff of the SAME frames
    val a = snapA.select(col("doc_id"), md5(col("text")).as("fp_old"),
      lit(true).as("in_a"))
    val b = snapB.select(col("doc_id"), md5(col("text")).as("fp_new"),
      lit(true).as("in_b"))
    val expected = a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("in_a").isNull, "added")
          .when(col("in_b").isNull, "removed").otherwise("changed"))
      .filter(col("in_a").isNull || col("in_b").isNull ||
        col("fp_old") =!= col("fp_new"))
      .select("doc_id", "status").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    val rows = snapB.collect()
    val (half1, half2) = rows.splitAt(rows.length / 2)
    def csv(rs: Array[org.apache.spark.sql.Row]): String =
      "doc_id;text\n" + rs.map(r => s"${r.getLong(0)};${r.getString(1)}")
        .mkString("\n") + "\n"
    val dir = tempDir("snapdiff1")
    csvFile(dir, "b1.csv", csv(half1))
    val stream = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val got = scala.collection.mutable.Set[(Long, String)]()
    val h = StreamSnapshotDiff.start(stream, snapA, "snapdiff1",
      (diff, _) => {
        got ++= diff.select("doc_id", "status").collect()
          .map(r => (r.getLong(0), r.getString(1))); ()
      })
    try {
      h.query.processAllAvailable()
      // second batch includes a REDELIVERY of a first-batch doc — it must
      // not re-emit (first-arrival-wins) nor disturb removals
      csvFile(dir, "b2.csv", csv(half2 ++ half1.take(1)))
      h.query.processAllAvailable()
      got ++= h.removals().select("doc_id", "status").collect()
        .map(r => (r.getLong(0), r.getString(1)))
    } finally h.query.stop()
    assert(got.toSet == expected,
      s"stream/batch divergence: stream-only ${got.toSet -- expected}, " +
        s"batch-only ${expected -- got.toSet}")
  }
}
