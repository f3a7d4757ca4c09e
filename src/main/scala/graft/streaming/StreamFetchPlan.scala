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
  * ACROSS batches from the domain's already-scheduled count, capped at
  * `maxPerHost` total, and start_at_s continues from the domain's
  * accumulated crawl-delay clock (the cumsum d97 computes within one
  * corpus, extended across arrivals).
  *
  * STANDING STATE is the SCHEDULED-URL TABLE itself — (domain,
  * norm_url, crawl_delay_s), the work list a crawler persists anyway —
  * and every cross-batch read derives from it by anti-join or
  * key-distinct aggregation, which is what makes the crash windows
  * self-healing (the r20 review killed a first design that stored
  * per-batch COUNT increments: a sum-based ledger double-counts on
  * crash-replay and collides batchIds across un-checkpointed restarts;
  * a key set cannot — the same rows re-append and [[StandingStore]]'s
  * dedup-on-compact plus the read-side key-distinct make replay
  * idempotent). A URL schedules AT MOST ONCE, ever: arrivals already in
  * the standing set drop (a crash between sink and append re-emits the
  * batch's schedule VERBATIM on replay — at-least-once with identical
  * rows, because its own URLs are not yet standing; a crash after the
  * append replays to an empty emission — the sink already saw the
  * rows).
  *
  * Robots semantics: a domain absent from the robots frame has no
  * rules — RFC 9309 default-allow, crawl delay 0 (the no-robots host).
  * Disallowed URLs DROP (work a crawler never queues); NULL-domain rows
  * drop too (no host to schedule under — d91's NULL discipline;
  * StreamFrontier never emits them). An over-cap URL drops WITHOUT
  * entering the standing set, so it may retry while slots remain.
  *
  * Scale shape: the robots parse is a one-time domains-sized projection
  * broadcast into every batch; the batch side is trigger-bounded with
  * the cap window's row_number a map-side WindowGroupLimit; the
  * standing side streams once per batch through one anti-join on the
  * canonical-URL key plus one domains-sized key-distinct aggregate. At
  * 100 TB the standing table is the persisted fetch log the sink
  * appends to.
  */
object StreamFetchPlan {

  /** Start the gate: `delta` is a streaming frame with (domain,
    * norm_url) — [[StreamFrontier]]'s discovery shape. `robots` a
    * STATIC frame with (domain, robots) raw text, one row per domain
    * (fail-fast otherwise: a duplicate domain row would silently
    * double-schedule every URL of that host — r20 review) — parsed once
    * here, host-grouped. `sink` receives each batch's scheduled rows
    * (domain, norm_url, fetch_rank, crawl_delay_s, start_at_s). `base`
    * optionally seeds the already-scheduled set with prior work in the
    * same (domain, norm_url, crawl_delay_s) shape — d97's output
    * columns; pass None for a cold start.
    *
    * `standingStore`: optional parquet directory making the scheduled
    * set durable via [[StandingStore]]'s protocol (dedupKey norm_url —
    * replayed appends collapse).
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
        "booked_n", "booked_s", "path", "dis", "alw", "__rn"))
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
        // nullif BEFORE the cast: with no Crawl-delay line the extract
        // returns '' and an ANSI cast THROWS rather than NULLing — the
        // no-delay host must default to 0, not kill the gate
        coalesce(nullif(regexp_extract(col("robots"),
            GroupC.RobotsDelayP, 1), lit("")).cast("long"), lit(0L))
          .as("crawl_delay_s"))
      .localCheckpoint(true)
    require(hosts.count() ==
      hosts.select("domain").distinct().count(),
      "robots must carry ONE row per domain — duplicates would " +
        "double-schedule every URL of that host")
    val initial = base.map(_.select(col("domain"), col("norm_url"),
        col("crawl_delay_s").cast("long")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(String, String, Long)]
          .toDF("domain", "norm_url", "crawl_delay_s")
      }
    StandingGate.start(delta, initial, queryName, sink, standingStore,
        compactEvery, storeCols = Seq("domain", "norm_url",
          "crawl_delay_s"), dedupKey = "norm_url") {
      (batch, standing, _) =>
        // per-domain bookkeeping from the scheduled set: count + clock.
        // Key-distinct FIRST — a crash-replayed append leaves duplicate
        // rows in the in-memory union until the next re-checkpoint, and
        // a sum over them would double-book (r20 review). The key
        // distinct is a DETERMINISTIC aggregate (r20 ADVICE): a
        // dropDuplicates would pick an arbitrary row per URL, so a
        // standing set that ever carried the same norm_url with two
        // delays (robots change between restarts, a seed disagreeing
        // with stored rows) would make booked_s nondeterministic across
        // runs — min() resolves such duplicates the same way every time.
        // domain is functionally determined by norm_url, so grouping by
        // both keeps one row per URL.
        val booked = standing.groupBy("domain", "norm_url")
          .agg(min(col("crawl_delay_s")).as("crawl_delay_s"))
          .groupBy("domain").agg(
            count(lit(1)).as("booked_n"),
            sum(col("crawl_delay_s")).as("booked_s"))
        // within-batch redelivery tiebreak; exactly-once-per-URL across
        // batches (and across crash replays) by anti-join; then the
        // robots gate — a domain with no robots row default-allows with
        // delay 0
        // NULL norm_url drops WITH the NULL domain (r20 ADVICE): the
        // left_anti join never matches a NULL key, so such a row would
        // bypass the exactly-once guarantee and re-schedule every batch
        // (StreamFrontier never emits one; the gate's contract covers
        // any caller)
        val gated = DeterministicSurvivor
          .keepFirstBy(batch, "norm_url", "domain")
          .filter(col("domain").isNotNull && col("norm_url").isNotNull)
          .join(standing.select("norm_url"), Seq("norm_url"), "left_anti")
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
        (kept, kept.select("domain", "norm_url", "crawl_delay_s"))
    }
  }
}
