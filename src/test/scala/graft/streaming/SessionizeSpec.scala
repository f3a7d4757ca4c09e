package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.sources.CsvDialect

/** Stateful sessionization over a stream: gap-split within a batch,
  * trailing sessions flushed by the event-time timeout as the watermark
  * advances with later batches.
  */
class SessionizeSpec extends AnyFunSuite {

  test("sessions split on the gap and flush via event-time timeout") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("sess")
    // user 1: two events 10 min apart, then an 80-min gap, then one more
    csvFile(dir, "b1.csv",
      """ts;user;kind
        |2024-01-01 10:00:00;1;a
        |2024-01-01 10:10:00;1;b
        |2024-01-01 11:30:00;1;a
        |""".stripMargin)
    val raw = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
    val events = raw.selectExpr(
      "cast(user as bigint) as user_id",
      "to_timestamp(ts) as ts",
      "kind as event_type").as[SessionEvent]
    val out = Sessionize.sessions(spark, events, gapMinutes = 30,
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory")
      .queryName("sessions").outputMode("append").start()
    try {
      q.processAllAvailable()
      // the 80-min gap closes the first session within the batch
      val first = spark.table("sessions").collect()
      assert(first.length == 1)
      assert(first.head.getLong(0) == 1L)
      assert(first.head.getTimestamp(1) == Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(first.head.getTimestamp(2) == Timestamp.valueOf("2024-01-01 10:10:00"))
      assert(first.head.getLong(3) == 2L)

      // a much later event advances the watermark past the open session's
      // horizon -> the timeout flushes it (may take an extra trigger for
      // the watermark to propagate)
      csvFile(dir, "b2.csv", "ts;user;kind\n2024-01-01 15:00:00;2;a\n")
      q.processAllAvailable()
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-01 16:00:00;2;a\n")
      q.processAllAvailable()
      val all = spark.table("sessions").orderBy("session_start").collect()
      assert(all.exists(r => r.getLong(0) == 1L &&
        r.getTimestamp(1) == Timestamp.valueOf("2024-01-01 11:30:00") &&
        r.getLong(3) == 1L))
    } finally q.stop()
  }
}
