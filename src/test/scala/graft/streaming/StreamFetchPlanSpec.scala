package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.GroupD
import graft.sources.CsvDialect

/** The streaming fetch-plan gate ([[StreamFetchPlan]]): single-batch
  * parity with d97's declared batch schedule, cross-batch rank/clock
  * continuation under the per-host cap, robots gating (disallow drops,
  * no-robots default-allow), and the durable ledger restart.
  */
class StreamFetchPlanSpec extends AnyFunSuite {

  private def stream(dir: java.nio.file.Path) = {
    val spark = TestSpark.spark
    CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("domain"), col("norm_url"))
  }

  private def csv(rows: (String, String)*): String =
    "domain;norm_url\n" + rows.map { case (d, u) => s"$d;$u" }
      .mkString("\n") + "\n"

  /** A robots frame with one host: Disallow /no, Crawl-delay 2. */
  private def oneHostRobots = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(("a.com",
      "User-agent: *\nDisallow: /no\nCrawl-delay: 2\n")).toDF(
      "domain", "robots")
  }

  test("one-batch stream reproduces d97's fetch plan exactly") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val expected = GroupD.queries("d97_fetch_plan")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    // the same operands d97 declares: the frontier discoveries as the
    // arriving batch, the constructed per-host robots as the static frame
    val frontier = GroupD.d95Frontier(spark, sf)
      .filter(col("domain").isNotNull)
    val robots = frontier.select("domain").distinct()
      .withColumn("k", graft.queries.GroupC.hostKey(col("domain")))
      .select(col("domain"), GroupD.d97RobotsText(col("k")).as("robots"))
    val dir = tempDir("sfetch1")
    csvFile(dir, "b1.csv", csv(frontier.collect().map(r =>
      r.getString(1) -> r.getString(0)): _*))
    val got = scala.collection.mutable
      .Set[(String, String, Long, Long, Long)]()
    val q = StreamFetchPlan.start(stream(dir), robots, "sfetch1",
      (sched, _) => { got ++= sched.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))); () })
    try q.processAllAvailable() finally q.stop()
    assert(got.toSet == expected,
      s"stream/batch divergence: stream-only ${got.toSet -- expected}, " +
        s"batch-only ${expected -- got.toSet}")
  }

  test("across batches: ranks and clocks continue, the cap is TOTAL, robots gate applies") {
    val spark = TestSpark.spark
    val dir = tempDir("sfetch2")
    // batch 1: three allowed a.com URLs (ranks 1-3, starts 0/2/4), one
    // disallowed (drops), one no-robots domain (default-allow, delay 0)
    csvFile(dir, "b1.csv", csv(
      "a.com" -> "https://a.com/p1",
      "a.com" -> "https://a.com/p2",
      "a.com" -> "https://a.com/p3",
      "a.com" -> "https://a.com/no/x",
      "unknown.org" -> "https://unknown.org/u1"))
    val perBatch = scala.collection.mutable
      .Map[Long, Set[(String, Long, Long, Long)]]()
    val q = StreamFetchPlan.start(stream(dir), oneHostRobots, "sfetch2",
      (sched, id) => { perBatch(id) = sched.collect().map(r =>
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet; () },
      maxPerHost = 4)
    try {
      q.processAllAvailable()
      // batch 2: rank continues at 4 and start at the booked 6s; the
      // fifth URL exceeds the TOTAL cap and drops; a REDELIVERED
      // already-scheduled URL never re-schedules (exactly-once per URL)
      csvFile(dir, "b2.csv", csv(
        "a.com" -> "https://a.com/p4",
        "a.com" -> "https://a.com/p5",
        "a.com" -> "https://a.com/p1"))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set(
      ("https://a.com/p1", 1L, 2L, 0L),
      ("https://a.com/p2", 2L, 2L, 2L),
      ("https://a.com/p3", 3L, 2L, 4L),
      ("https://unknown.org/u1", 1L, 0L, 0L)),
      s"batch 0: ${perBatch.get(0L)}")
    assert(perBatch(1L) == Set(("https://a.com/p4", 4L, 2L, 6L)),
      s"batch 1 must continue rank/clock and enforce the total cap: " +
        s"${perBatch.get(1L)}")
  }

  test("durable ledger: restart continues the schedule; base seeds it") {
    val spark = TestSpark.spark
    import spark.implicits._
    val store = tempDir("sfetch-store").resolve("store").toString

    // run 1: two a.com URLs booked (delay 2 each), compacting every batch
    val dir1 = tempDir("sfetch3a")
    csvFile(dir1, "b1.csv", csv(
      "a.com" -> "https://a.com/p1", "a.com" -> "https://a.com/p2"))
    val q1 = StreamFetchPlan.start(stream(dir1), oneHostRobots, "sfetch3a",
      (_, _) => (), standingStore = Some(store), compactEvery = 1)
    try q1.processAllAvailable() finally q1.stop()

    // run 2 (restart): the standing set, not driver memory, carries the
    // booking — next URL ranks 3 at 4s; a base-seeded domain continues
    // from its seeded rows' count/clock (d97's output shape)
    val dir2 = tempDir("sfetch3b")
    csvFile(dir2, "b1.csv", csv(
      "a.com" -> "https://a.com/p9",
      "seeded.net" -> "https://seeded.net/s1"))
    val base = Seq(
      ("seeded.net", "https://seeded.net/old1", 5L),
      ("seeded.net", "https://seeded.net/old2", 6L)).toDF(
      "domain", "norm_url", "crawl_delay_s")
    val got = scala.collection.mutable
      .Set[(String, Long, Long, Long)]()
    val q2 = StreamFetchPlan.start(stream(dir2), oneHostRobots, "sfetch3b",
      (sched, _) => { got ++= sched.collect().map(r =>
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet; () },
      base = Some(base), standingStore = Some(store))
    try q2.processAllAvailable() finally q2.stop()
    assert(got.toSet == Set(
      ("https://a.com/p9", 3L, 2L, 4L),
      ("https://seeded.net/s1", 3L, 0L, 11L)),
      s"restart must continue from the standing set + base: $got")
  }

  test("duplicate robots domains fail fast") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("sfetch5")
    csvFile(dir, "b1.csv", "domain;norm_url\n")
    val dup = Seq(("a.com", "User-agent: *\n"), ("a.com", "User-agent: *\n"))
      .toDF("domain", "robots")
    val e = intercept[IllegalArgumentException] {
      StreamFetchPlan.start(stream(dir), dup, "sfetch5", (_, _) => ())
    }
    assert(e.getMessage.contains("ONE row per domain"))
  }

  test("reserved names fail fast") {
    val spark = TestSpark.spark
    val dir = tempDir("sfetch4")
    csvFile(dir, "b1.csv", "domain;norm_url\n")
    val bad = stream(dir).withColumn("fetch_rank", lit(1L))
    val e = intercept[IllegalArgumentException] {
      StreamFetchPlan.start(bad, oneHostRobots, "sfetch4", (_, _) => ())
    }
    assert(e.getMessage.contains("fetch_rank"))
  }
}
