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

  test("event-time eviction fires when the watermark passes, no clock involved") {
    val spark = TestSpark.spark
    val dir = tempDir("smon-evt")
    def doc(id: Long, src: String, ts: String) =
      s"$id;$src;$ts;alpha beta gamma delta epsilon $id\n"
    val hdr = "doc_id;source;ts;text\n"
    csvFile(dir, "b1.csv", hdr +
      doc(1, "feedA", "2026-01-01 10:00:00") +
      doc(2, "feedA", "2026-01-01 10:00:05"))
    val stream = CsvStream.readStream(spark, dir,
        CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("ts").cast("timestamp").as("ts"), col("text"))
    val seen = scala.collection.mutable.ArrayBuffer[SourceSnapshot]()
    // idle timeout 60 s of EVENT time, watermark delay 10 s
    val q = StreamQualityMonitor.monitorEventTime(spark, stream, "ts",
        watermarkDelay = "10 seconds", idleTimeoutMs = 60000L)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SourceSnapshot], _: Long) =>
        seen.synchronized { seen ++= df.collect() }; ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.exists(s =>
        s.source == "feedA" && s.n_docs == 2L && !s.evicted)))
      assert(seen.synchronized(!seen.exists(_.evicted)))
      // a feedB batch 30 min later drives the watermark past feedA's
      // 10:00:05 + 60 s timeout — eviction is DATA-driven, so this test
      // needs no sleeps and replays identically every run
      csvFile(dir, "b2.csv", hdr + doc(3, "feedB", "2026-01-01 10:30:00"))
      q.processAllAvailable()
      val ev = seen.synchronized(
        seen.filter(s => s.source == "feedA" && s.evicted))
      assert(ev.nonEmpty, s"no event-time eviction: ${seen.toSeq}")
      assert(ev.head.n_docs == 2L && ev.head.batch_docs == 0L)
      // feedB is fresh relative to the watermark: still resident
      assert(seen.synchronized(!seen.exists(s =>
        s.source == "feedB" && s.evicted)))
      // the feed returns within the NEW watermark: fresh accumulation
      csvFile(dir, "b3.csv", hdr + doc(4, "feedA", "2026-01-01 10:31:00"))
      q.processAllAvailable()
      assert(seen.synchronized(seen.exists(s =>
        s.source == "feedA" && !s.evicted && s.n_docs == 1L)),
        seen.synchronized(seen.toSeq).toString)
    } finally q.stop()
  }

  test("idle sources are emitted-and-evicted; re-arrival re-accumulates") {
    val spark = TestSpark.spark
    val dir = tempDir("smon-evict")
    def doc(id: Long, src: String) =
      s"$id;$src;alpha beta gamma delta epsilon $id\n"
    csvFile(dir, "b1.csv", "doc_id;source;text\n" + doc(1, "feedA") + doc(2, "feedA"))
    val stream = CsvStream.readStream(spark, dir,
        CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("text"))
    val seen = scala.collection.mutable.ArrayBuffer[SourceSnapshot]()
    val q = StreamQualityMonitor.monitor(spark, stream,
        idleTimeout = Some("2 seconds"))
      .writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("250 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SourceSnapshot], _: Long) =>
        seen.synchronized { seen ++= df.collect() }; ()
      }.start()
    // ProcessingTimeTimeout keeps scheduling no-data batches (that is HOW
    // idle timeouts fire), so the stream never reports quiescence and
    // processAllAvailable would block forever — poll with a deadline.
    def await(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime + 90L * 1000 * 1000 * 1000
      while (!seen.synchronized(cond)) {
        assert(System.nanoTime < deadline,
          s"timed out waiting for $what: ${seen.synchronized(seen.toSeq)}")
        Thread.sleep(100)
      }
    }
    try {
      await("first feedA snapshot")(seen.exists(s =>
        s.source == "feedA" && s.n_docs == 2L && !s.evicted))
      // feedA goes quiet; the idle timeout fires on a later empty trigger
      await("eviction row")(seen.exists(s => s.source == "feedA" && s.evicted))
      val ev = seen.synchronized(
        seen.filter(s => s.source == "feedA" && s.evicted).head)
      assert(ev.n_docs == 2L && ev.batch_docs == 0L,
        s"terminal totals wrong: $ev")
      // the feed comes back: a FRESH accumulation, not the old totals
      csvFile(dir, "b3.csv", "doc_id;source;text\n" + doc(4, "feedA"))
      await("re-arrival snapshot")(seen.exists(s =>
        s.source == "feedA" && !s.evicted && s.n_docs == 1L &&
          s.batch_docs == 1L))
    } finally q.stop()
  }
}
