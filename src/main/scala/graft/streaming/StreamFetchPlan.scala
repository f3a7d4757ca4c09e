package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.{GroupC, GroupD}

/** Streaming twin of d97's fetch-plan compose — the live SCHEDULER
  * closing the crawl loop's streaming side (r20): [[StreamFrontier]]
  * discovers, this gate schedules. Each micro-batch of discovered
  * (domain, norm_url) rows is gated by the per-HOST robots decision
  * (c15's kernel over a STATIC robots frame, parsed ONCE at gate start
  * on the domains-sized frame — d97's host-grouped discipline live) and
  * scheduled under the domain's politeness budget: fetch_rank continues
  * ACROSS batches from the domain's standing scheduled count, capped at
  * `maxPerHost` total, and start_at_s continues from the domain's
  * accumulated busy time (the crawl-delay cumsum d97 computes within
  * one corpus, extended across arrivals).
  *
  * STANDING STATE is an append-only LEDGER, not a key set: one row per
  * (batch, domain) — `(ledger_key, domain, n_urls, busy_s)` with
  * ledger_key = "<batchId>:<domain>" — aggregated per batch into each
  * domain's (scheduled count, clock). The ledger shape is what makes
  * the skeleton's dedup-on-compact SAFE here: increments are never
  * collapsed (keys are unique by construction), while a crash-replayed
  * batch re-appends the SAME keys and compaction drops the duplicates —
  * the replay double-count window the plain-append design would have
  * had closes itself.
  *
  * Robots semantics: a domain absent from the robots frame has no
  * rules — RFC 9309 default-allow, crawl delay 0 (the no-robots host).
  * Disallowed URLs DROP (counted work a crawler never queues);
  * NULL-domain rows drop too (no host to schedule under — d91's NULL
  * discipline; StreamFrontier never emits them).
  *
  * Scale shape: the robots parse is a one-time domains-sized projection
  * broadcast into every batch; the batch side is trigger-bounded with
  * the cap window's row_number a map-side WindowGroupLimit; the ledger
  * streams once per batch through one aggregate the size of the DOMAIN
  * set. At 100 TB the ledger is the scheduler's persisted bookkeeping
  * table — domains-sized, not URL-sized.
  */
object StreamFetchPlan {

  /** Start the gate: `delta` is a streaming frame with (domain,
    * norm_url) — [[StreamFrontier]]'s discovery shape; its exactly-once
    * contract upstream is what keeps re-discoveries out of the
    * schedule. `robots` a STATIC frame with (domain, robots) raw text —
    * parsed once here, host-grouped. `sink` receives each batch's
    * scheduled rows (domain, norm_url, fetch_rank, crawl_delay_s,
    * start_at_s). `base` optionally seeds per-domain (n_urls, busy_s)
    * from a prior batch run (d97's output aggregated — pass None for a
    * cold start).
    *
    * `standingStore`: optional parquet directory making the ledger
    * durable via [[StandingStore]]'s protocol; the unique ledger keys
    * make compaction a pure replay-dedup (see scaladoc above).
    */
  def start(delta: DataFrame, robots: DataFrame, queryName: String,
            sink: (DataFrame, Long) => Unit,
            base: Option[DataFrame] = None,
            maxPerHost: Int = 10,
            standingStore: Option[String] = None,
            compactEvery: Int = 8): StreamingQuery = {
    require(maxPerHost > 0, s"maxPerHost must be positive: $maxPerHost")
    for (c <- Seq("domain", "norm_url"))
      require(delta.columns.contains(c),
        s"delta must carry (domain, norm_url); has " +
          delta.columns.mkString(", "))
    for (reserved <- Seq("fetch_rank", "crawl_delay_s", "start_at_s",
        "ledger_key", "n_urls", "busy_s", "__rn"))
      require(!delta.columns.contains(reserved),
        s"delta already carries $reserved — rename it first (the gate " +
          "computes this column)")
    require(robots.columns.contains("domain") &&
      robots.columns.contains("robots"),
      s"robots must carry (domain, robots); has " +
        robots.columns.mkString(", "))
    val spark = robots.sparkSession
    // the one-time host-grouped parse (d97's discipline live): rule
    // arrays + delay per domain, materialized once for every batch
    val hosts = robots.select(col("domain"),
        regexp_extract_all(col("robots"),
          lit(GroupC.RobotsDisP), lit(1)).as("dis"),
        regexp_extract_all(col("robots"),
          lit(GroupC.RobotsAlwP), lit(1)).as("alw"),
        coalesce(regexp_extract(col("robots"), GroupC.RobotsDelayP, 1)
          .cast("long"), lit(0L)).as("crawl_delay_s"))
      .localCheckpoint(true)
    val initial = base.map(_.select(
        concat(lit("base:"), col("domain")).as("ledger_key"),
        col("domain"), col("n_urls").cast("long"),
        col("busy_s").cast("long")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(String, String, Long, Long)]
          .toDF("ledger_key", "domain", "n_urls", "busy_s")
      }
    StandingGate.start(delta, initial, queryName, sink, standingStore,
        compactEvery, storeCols = Seq("ledger_key", "domain", "n_urls",
          "busy_s"), dedupKey = "ledger_key") {
      (batch, standing, batchId) =>
        // per-domain bookkeeping from the ledger: scheduled count + clock
        val booked = standing.groupBy("domain").agg(
          sum(col("n_urls")).as("booked_n"),
          sum(col("busy_s")).as("booked_s"))
        // within-batch redelivery tiebreak, then the robots gate: a
        // domain with no robots row default-allows with delay 0
        val gated = DeterministicSurvivor
          .keepFirstBy(batch, "norm_url", "domain")
          .filter(col("domain").isNotNull)
          .join(broadcast(hosts), Seq("domain"), "left")
          .withColumn("path",
            regexp_replace(col("norm_url"), GroupD.CanonPathP, ""))
          .withColumn("crawl_delay_s", coalesce(col("crawl_delay_s"),
            lit(0L)))
          .filter(coalesce(GroupC.c15BestLen(col("alw"), col("path")) >=
            GroupC.c15BestLen(col("dis"), col("path")), lit(true)))
          .drop("dis", "alw", "path")
        // the schedule: rank continues from the domain's booked count
        // (cap at maxPerHost TOTAL), start time from its booked clock +
        // the in-batch cumsum of previously-ranked peers' delays
        val w = Window.partitionBy("domain").orderBy("norm_url")
        val kept = gated
          .join(broadcast(booked), Seq("domain"), "left")
          .withColumn("booked_n", coalesce(col("booked_n"), lit(0L)))
          .withColumn("booked_s", coalesce(col("booked_s"), lit(0L)))
          .withColumn("__rn", row_number().over(w).cast("long"))
          .filter(col("booked_n") + col("__rn") <= maxPerHost)
          .withColumn("fetch_rank", col("booked_n") + col("__rn"))
          .withColumn("start_at_s", col("booked_s") +
            coalesce(sum(col("crawl_delay_s")).over(
              w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("domain"), col("norm_url"), col("fetch_rank"),
            col("crawl_delay_s"), col("start_at_s"))
          .localCheckpoint(true)
        // ledger delta: ONE row per scheduled domain this batch, keyed
        // by batchId so a crash-replay re-appends identical keys that
        // compaction drops (see scaladoc)
        (kept, kept.groupBy("domain").agg(
            count(lit(1)).as("n_urls"),
            sum(col("crawl_delay_s")).as("busy_s"))
          .select(concat(lit(s"$batchId:"), col("domain"))
            .as("ledger_key"), col("domain"), col("n_urls"),
            col("busy_s")))
    }
  }
}
