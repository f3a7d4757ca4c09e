package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.sources.CsvDialect
import graft.queries.GroupB

/** The rolling streaming funnel ([[StreamEventFunnel]]): per-window
  * strict-after stage semantics equal to the batch funnel (shared rule),
  * out-of-order retroactivity across micro-batches, gap-split windows,
  * and flatMapGroupsWithState checkpoint recovery.
  */
class StreamEventFunnelSpec extends AnyFunSuite {
  /** readEvents with try_cast: ANSI to_timestamp throws on the malformed
    * row, and the r18 late test needs to DELIVER a null ts. */
  private def readLateEvents(dir: java.nio.file.Path) = {
    val spark = TestSpark.spark
    import spark.implicits._
    CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .selectExpr("cast(user as bigint) as user_id",
        "try_cast(ts as timestamp) as ts", "kind as event_type")
      .as[FunnelEvent]
  }

  private def readEvents(dir: java.nio.file.Path) = {
    val spark = TestSpark.spark
    import spark.implicits._
    CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .selectExpr("cast(user as bigint) as user_id",
        "to_timestamp(ts) as ts", "kind as event_type")
      .as[FunnelEvent]
  }

  test("per-window funnels equal the batch rule on the same events") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("funnel-eq")
    // user 1 completes all 4 stages with decoys; user 2 views BEFORE
    // signing up (strict-after: view must not count); user 3 never signs
    // up. All inside one 30-min-gap window per user.
    csvFile(dir, "b1.csv",
      """ts;user;kind
        |2024-01-01 10:00:00;1;signup
        |2024-01-01 10:01:00;1;view
        |2024-01-01 10:01:30;1;other
        |2024-01-01 10:02:00;1;click
        |2024-01-01 10:03:00;1;purchase
        |2024-01-01 10:00:00;2;view
        |2024-01-01 10:05:00;2;signup
        |2024-01-01 10:06:00;2;click
        |2024-01-01 10:00:00;3;view
        |2024-01-01 10:01:00;3;click
        |""".stripMargin)
    val out = StreamEventFunnel.funnels(spark, readEvents(dir),
      gapMinutes = 30, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory")
      .queryName("funnels_eq").outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance the watermark far past every open window
      csvFile(dir, "b2.csv", "ts;user;kind\n2024-01-02 10:00:00;9;other\n")
      q.processAllAvailable()
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-03 10:00:00;9;other\n")
      q.processAllAvailable()
      val got = spark.table("funnels_eq").as[UserFunnel].collect()
        .filter(_.user_id <= 3L).sortBy(_.user_id)
      assert(got.length === 3)
      // batch twin on the identical events
      val batchEv = spark.read.option("sep", ";").option("header", "true")
        .csv(dir.resolve("b1.csv").toString)
        .selectExpr("cast(user as bigint) as user_id",
          "to_timestamp(ts) as ts", "kind as event_type")
      val want = GroupB.eventFunnelOf(batchEv).collect()
        .map(r => r.getLong(0) -> r).toMap
      got.foreach { g =>
        val w = want(g.user_id)
        assert(g.stage_reached === w.getAs[Long]("stage_reached"),
          s"user ${g.user_id}")
        assert(g.t_signup === Option(w.getAs[Timestamp]("t_signup")),
          s"user ${g.user_id} t_signup")
        assert(g.t_view === Option(w.getAs[Timestamp]("t_view")),
          s"user ${g.user_id} t_view")
        assert(g.t_click === Option(w.getAs[Timestamp]("t_click")),
          s"user ${g.user_id} t_click")
        assert(g.t_purchase === Option(w.getAs[Timestamp]("t_purchase")),
          s"user ${g.user_id} t_purchase")
      }
      // spot values: user 1 full funnel; user 2's view PRECEDES its
      // signup so strict-after stops the chain at signup; user 3 never
      // signs up so nothing counts
      assert(got(0).stage_reached === 4L)
      assert(got(1).stage_reached === 1L)
      assert(got(2).stage_reached === 0L)
    } finally q.stop()
  }

  test("late signup retroactively admits an earlier view (buffered state)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("funnel-retro")
    // batch 1: the view arrives FIRST in wall-clock order
    csvFile(dir, "b1.csv", "ts;user;kind\n2024-01-01 10:05:00;1;view\n")
    val out = StreamEventFunnel.funnels(spark, readEvents(dir),
      gapMinutes = 30, watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory")
      .queryName("funnels_retro").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: an EARLIER signup — with unbuffered min-only state the
      // view would be lost (it preceded the signup's arrival)
      csvFile(dir, "b2.csv", "ts;user;kind\n2024-01-01 10:00:00;1;signup\n")
      q.processAllAvailable()
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-02 10:00:00;9;other\n")
      q.processAllAvailable()
      csvFile(dir, "b4.csv", "ts;user;kind\n2024-01-03 10:00:00;9;other\n")
      q.processAllAvailable()
      val u1 = spark.table("funnels_retro").as[UserFunnel].collect()
        .filter(_.user_id == 1L)
      assert(u1.length === 1)
      assert(u1.head.stage_reached === 2L, s"got ${u1.head}")
      assert(u1.head.t_view ===
        Some(Timestamp.valueOf("2024-01-01 10:05:00")))
    } finally q.stop()
  }

  test("open funnel state survives a checkpoint stop/restart") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("funnel-ckpt")
    val out = tempDir("funnel-out").resolve("data").toString
    val cp = tempDir("funnel-cp").resolve("cp").toString
    def start() =
      StreamEventFunnel.funnels(spark, readEvents(dir),
        gapMinutes = 30, watermarkDelay = "0 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
    csvFile(dir, "b1.csv",
      "ts;user;kind\n2024-01-01 10:00:00;1;signup\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 0) // window still open
    // while stopped: the view that must join the RECOVERED window —
    // a lost state row would emit stage_reached 0 (view without signup)
    csvFile(dir, "b2.csv", "ts;user;kind\n2024-01-01 10:10:00;1;view\n")
    val q2 = start()
    try {
      q2.processAllAvailable()
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-02 10:00:00;9;other\n")
      q2.processAllAvailable()
      csvFile(dir, "b4.csv", "ts;user;kind\n2024-01-03 10:00:00;9;other\n")
      q2.processAllAvailable()
    } finally q2.stop()
    val u1 = spark.read.parquet(out).as[UserFunnel].collect()
      .filter(_.user_id == 1L)
    assert(u1.length === 1, s"expected ONE joined window, got ${u1.toSeq}")
    assert(u1.head.stage_reached === 2L,
      s"state lost across restart: ${u1.head}")
    assert(u1.head.n_events === 2L)
  }

  test("a gap splits windows; each window funnels independently") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("funnel-gap")
    csvFile(dir, "b1.csv",
      """ts;user;kind
        |2024-01-01 10:00:00;1;signup
        |2024-01-01 10:01:00;1;view
        |2024-01-01 12:00:00;1;view
        |2024-01-01 12:01:00;1;click
        |""".stripMargin)
    val out = StreamEventFunnel.funnels(spark, readEvents(dir),
      gapMinutes = 30, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory")
      .queryName("funnels_gap").outputMode("append").start()
    try {
      q.processAllAvailable()
      csvFile(dir, "b2.csv", "ts;user;kind\n2024-01-02 10:00:00;9;other\n")
      q.processAllAvailable()
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-03 10:00:00;9;other\n")
      q.processAllAvailable()
      val u1 = spark.table("funnels_gap").as[UserFunnel].collect()
        .filter(_.user_id == 1L).sortBy(_.window_start.getTime)
      assert(u1.length === 2)
      assert(u1(0).stage_reached === 2L)   // signup -> view
      // second window has NO signup: strict-after yields nothing even
      // though a view and click are present
      assert(u1(1).stage_reached === 0L)
    } finally q.stop()
  }

  test("allowed-late event with an expired horizon flushes instead of killing the query (r18)") {
    val spark = TestSpark.spark
    // Sessionize's r18 clamp scenario at the funnel operator: b1 user 1
    // @12:00 puts the eviction watermark at 11:50; b2's user 2 @11:00 is
    // admitted by the lagging late filter but its unclamped horizon
    // (11:30) is below the watermark — pre-fix setTimeoutTimestamp threw
    // and terminated the query; a null-ts row rides along (pre-fix NPE).
    val dir = tempDir("funnel-late")
    csvFile(dir, "b1.csv", "ts;user;kind\n2024-01-01 12:00:00;1;signup\n")
    val out = StreamEventFunnel.funnels(spark, readLateEvents(dir),
      gapMinutes = 30, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("funnels_late").outputMode("append").start()
    try {
      q.processAllAvailable()
      csvFile(dir, "b2.csv",
        "ts;user;kind\n2024-01-01 11:00:00;2;signup\nnot-a-time;3;view\n")
      q.processAllAvailable() // pre-fix: StreamingQueryException here
      csvFile(dir, "b3.csv", "ts;user;kind\n2024-01-01 13:00:00;9;other\n")
      q.processAllAvailable()
      csvFile(dir, "b4.csv", "ts;user;kind\n2024-01-01 14:00:00;9;other\n")
      q.processAllAvailable()
      assert(q.isActive, "query must survive the late/garbage batch")
      import spark.implicits._
      val rows = spark.table("funnels_late").as[UserFunnel].collect()
      // admission of the 11:00 event depends on the late watermark's
      // batch lag; the pinned contract is that neither outcome kills the
      // query (clamped flush if admitted, absence if filtered)
      assert(rows.exists(w => w.user_id == 1L),
        s"on-time window must flush: ${rows.mkString(", ")}")
      assert(!rows.exists(_.user_id == 3L), "null-ts rows never window")
    } finally q.stop()
  }
}
