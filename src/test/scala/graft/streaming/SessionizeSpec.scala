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

  test("open-session custom state survives a checkpoint stop/restart") {
    // The dedup recovery test covers built-in state; this covers the
    // flatMapGroupsWithState state store path: an OPEN session written in
    // run 1 must continue absorbing events after a restart — a lost state
    // row would surface as a split session (start 10:20, n=1) instead of
    // the joined one (start 10:00, n=3).
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("sessckpt")
    val out = tempDir("sessout").resolve("data").toString
    val cp = tempDir("sesscp").resolve("cp").toString
    def start() = {
      val raw = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      val events = raw.selectExpr(
        "cast(user as bigint) as user_id",
        "to_timestamp(ts) as ts",
        "kind as event_type").as[SessionEvent]
      Sessionize.sessions(spark, events, gapMinutes = 30,
        watermarkDelay = "0 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
    }
    csvFile(dir, "b1.csv",
      "ts;user;kind\n2024-01-01 10:00:00;1;a\n2024-01-01 10:10:00;1;b\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 0) // session still OPEN, in state
    // while stopped: an in-gap event that must JOIN the recovered session
    // (staged alone so no later file can advance the watermark past it in
    // the same restart backlog — the file source orders by mod time, not
    // event time); then later events push the watermark past the horizon
    csvFile(dir, "b2.csv", "ts;user;kind\n2024-01-01 10:20:00;1;c\n")
    val q2 = start()
    try {
      q2.processAllAvailable()
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-01 12:00:00;2;a\n")
      q2.processAllAvailable()
      csvFile(dir, "b4.csv", "ts;user;kind\n2024-01-01 13:00:00;2;a\n")
      q2.processAllAvailable()
    } finally q2.stop()
    val user1 = spark.read.parquet(out).as[UserSession].collect()
      .filter(_.user_id == 1L)
    assert(user1.length == 1, s"expected ONE joined session, got: ${user1.toSeq}")
    assert(user1.head.session_start == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(user1.head.session_end == Timestamp.valueOf("2024-01-01 10:20:00"))
    assert(user1.head.n_events == 3L,
      s"state lost across restart: ${user1.head}")
  }

  test("streaming sessions equal the batch window formulation (b32 core) on the same events") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two users, gaps straddling the 30-min rule: user 1 gets two sessions
    // (40-min gap), user 2 one session (5 + 29-min gaps both inside)
    val data = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-01 10:25:00", 2L),
      (1L, "2024-01-01 11:05:00", 3L), // 40 min after -> new session
      (2L, "2024-01-01 09:00:00", 4L), (2L, "2024-01-01 09:05:00", 5L),
      (2L, "2024-01-01 09:34:00", 6L))
    val dir = tempDir("sessparity")
    csvFile(dir, "b1.csv", "ts;user;kind\n" +
      data.map { case (u, t, _) => s"$t;$u;x" }.mkString("", "\n", "\n"))
    val raw = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
    val events = raw.selectExpr(
      "cast(user as bigint) as user_id",
      "to_timestamp(ts) as ts",
      "kind as event_type").as[SessionEvent]
    val out = Sessionize.sessions(spark, events, gapMinutes = 30,
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory")
      .queryName("sessions_parity").outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance the watermark far enough (twice) to flush the open tails
      csvFile(dir, "b2.csv", "ts;user;kind\n2024-01-01 18:00:00;99;x\n")
      q.processAllAvailable()
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-01 19:00:00;99;x\n")
      q.processAllAvailable()
      val streamed = spark.table("sessions_parity")
        .filter(col("user_id") =!= 99L)
        .select("user_id", "session_start", "session_end", "n_events")
      val batch = graft.queries.GroupB.sessionize(
        data.toDF("user_id", "ts_s", "event_id")
          .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
            col("event_id"), lit(1.0).as("value")))
        .select("user_id", "session_start", "session_end", "n_events")
      assert(streamed.count() == 3)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream and batch sessionization must agree event-for-event")
    } finally q.stop()
  }

  test("allowed-late event with an expired horizon flushes instead of killing the query (r18)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("sess-late")
    // b1: user 1 @12:00 → the eviction watermark after b1 is 11:50
    // (10-minute delay). b2: user 2 @11:00 — ADMITTED (Spark's
    // late-event filter lags one batch behind the eviction watermark),
    // but 11:00 + 30min gap = 11:30 < 11:50, so an unclamped
    // setTimeoutTimestamp would throw and terminate the query. b2 also
    // carries a null-ts row (unparseable timestamp), which the late
    // filter does NOT remove — pre-fix it NPE'd the state function.
    csvFile(dir, "b1.csv", "ts;user;kind\n2024-01-01 12:00:00;1;a\n")
    val raw = CsvStream.readStream(spark, dir, CsvDialect(),
      maxFilesPerTrigger = 1)
    val events = raw.selectExpr(
      "cast(user as bigint) as user_id",
      // try_cast, not to_timestamp: ANSI mode throws on the malformed
      // row, and the point is to DELIVER a null ts to the state function
      "try_cast(ts as timestamp) as ts",
      "kind as event_type").as[SessionEvent]
    val out = Sessionize.sessions(spark, events, gapMinutes = 30,
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("sessions_late").outputMode("append").start()
    try {
      q.processAllAvailable()
      csvFile(dir, "b2.csv",
        "ts;user;kind\n2024-01-01 11:00:00;2;a\nnot-a-time;3;x\n")
      q.processAllAvailable() // pre-fix: StreamingQueryException here
      // advance the watermark; the clamped timeout fires and user 2's
      // late singleton session flushes
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-01 13:00:00;9;a\n")
      q.processAllAvailable()
      csvFile(dir, "b4.csv", "ts;user;kind\n2024-01-01 14:00:00;9;a\n")
      q.processAllAvailable()
      assert(q.isActive, "query must survive the late/garbage batch")
      val rows = spark.table("sessions_late").collect()
      // whether the 11:00 event is ADMITTED depends on the late-events
      // watermark's batch lag (Spark may filter it); the contract pinned
      // here is that neither outcome kills the query — if admitted, the
      // clamp defers the flush instead of throwing (cf. the r13
      // StreamQualityMonitor crash this mirrors); if filtered, it's
      // simply absent
      assert(rows.exists(r => r.getLong(0) == 1L),
        s"on-time session must flush: ${rows.mkString(", ")}")
      assert(!rows.exists(_.getLong(0) == 3L), "null-ts rows never session")
    } finally q.stop()
  }
}
