package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.{GroupC, GroupD}

/** Streaming twin of d96's full stage-0 crawl-ingest compose — the fifth
  * [[StandingGate]] consumer (r20): each micro-batch of arriving fetch
  * results (doc_id, page, url) runs the WHOLE ingest funnel —
  * markup→text (c11's kernel), canonical-URL dedup (c13's kernel, d92's
  * keeper rule), the Gopher quality gate over the survivors' cleaned
  * text (the ONE shared [[GroupD.gopherOver]] body), exact text dedup
  * (md5 keep-min, c1's kernel) — and only docs surviving every stage
  * pass to the sink. First-arrival-wins extends across batches on BOTH
  * standing axes: a later arrival of an already-accepted canonical URL
  * drops at stage 2, a later arrival of already-accepted text drops at
  * stage 4, exactly as d96 keeps the smallest doc_id within one corpus.
  *
  * STANDING STATE is two key sets riding ONE standing frame (the
  * skeleton carries a single frame): canonical URLs as `u:<norm_url>`
  * and text fingerprints as `s:<sig>`, disjoint by prefix — a URL
  * string can never collide with a fingerprint row. URLs enter standing
  * at stage-2 acceptance even when a LATER stage drops the doc (a
  * re-fetch of a quality-rejected page is still a duplicate fetch —
  * and d96 over the concatenated corpus would drop the re-arrival at
  * its URL window, so admitting it here would break batch parity);
  * fingerprints enter at stage-4 acceptance only.
  *
  * DROPS, NOT PASSTHROUGHS: unlike [[StreamUrlDedup]] (a pure keying
  * gate, whose un-keyable rows pass through NULL-keyed), this is d96's
  * FUNNEL — a row with an un-canonicalizable URL or empty extraction is
  * a counted stage drop in the batch twin, so the streaming twin drops
  * it identically (the per-batch funnel makes the drop visible rather
  * than silent).
  *
  * Scale shape: the batch side is trigger-bounded and every kernel
  * (markup chain, URL chain, gopher arrays, md5) is a scan-side
  * projection over it; the standing side is a single-column key frame
  * that streams once per batch through two LEFT ANTI joins (prefix
  * split first — never self-joined); the enriched batch and both
  * survivor frames localCheckpoint so each materializes once across its
  * consumers (count arms + joins + standing union). At 100 TB the
  * standing side is the persisted canonical-URL + fingerprint tables
  * the sink appends to — the same frames d92/c1 would bootstrap.
  */
object StreamCrawlIngest {

  private val UrlPrefix = "u:"
  private val SigPrefix = "s:"

  private def keyed(df: DataFrame, prefix: String, c: String): DataFrame =
    df.select(concat(lit(prefix), col(c)).as("key"))

  private def unkeyed(standing: DataFrame, prefix: String,
                      as: String): DataFrame =
    standing.filter(col("key").startsWith(prefix))
      .select(col("key").substr(lit(prefix.length + 1),
        length(col("key"))).as(as))

  /** Start the gate: `delta` is a streaming frame with (doc_id, page,
    * url) plus any passthrough columns (hashable types — the
    * [[DeterministicSurvivor]] constraint); `baseUrls` a static frame
    * with a `norm_url` column of ALREADY-canonical accepted URLs (d92's
    * output shape), `baseSigs` a static frame with a `sig` column of
    * accepted md5 text fingerprints (c1's key) — pass empty frames for
    * a cold start. `sink` receives each batch's end-to-end survivors
    * with `clean_text`, `norm_url` and `sig` attached.
    *
    * `funnelSink`: optional per-batch observer receiving d96's 4-row
    * funnel (stage, docs_in, docs_out, dropped) for THIS batch — stage
    * counts include the cross-batch anti-join drops, so on a single
    * cold-start batch over d96's corpus the funnel equals the declared
    * query's output exactly (spec-pinned). Computing it costs four
    * counts over already-checkpointed frames; leave it None on hot
    * paths that only need survivors.
    *
    * `standingStore`: optional parquet directory making BOTH accepted
    * key sets durable via [[StandingStore]]'s marker-adjudicated
    * protocol (one store — the keys are prefix-disjoint).
    */
  def start(delta: DataFrame, baseUrls: DataFrame, baseSigs: DataFrame,
            queryName: String, sink: (DataFrame, Long) => Unit,
            funnelSink: Option[(DataFrame, Long) => Unit] = None,
            standingStore: Option[String] = None,
            compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery > 0, s"compactEvery must be positive: $compactEvery")
    for (c <- Seq("doc_id", "page", "url"))
      require(delta.columns.contains(c),
        s"delta must carry (doc_id, page, url); has " +
          delta.columns.mkString(", "))
    // fail fast on the names this gate computes (Salting's reserved-name
    // rule): a passthrough named like a computed column would be
    // silently clobbered mid-funnel
    for (reserved <- Seq("clean_text", "norm_url", "sig", "__rn", "key"))
      require(!delta.columns.contains(reserved),
        s"delta already carries $reserved — rename it first (the gate " +
          "computes this column)")
    require(baseUrls.columns.contains("norm_url"),
      s"baseUrls must carry norm_url (d92's output shape); has " +
        baseUrls.columns.mkString(", "))
    require(baseSigs.columns.contains("sig"),
      s"baseSigs must carry sig (c1's md5 key); has " +
        baseSigs.columns.mkString(", "))
    val initial = keyed(baseUrls, UrlPrefix, "norm_url")
      .unionByName(keyed(baseSigs, SigPrefix, "sig"))
    // the order-sensitive store protocol (restore adjudication, union
    // re-checkpoint cadence, sink-before-append, compaction) lives in
    // the shared skeleton — this gate supplies only its funnel
    StandingGate.start(delta, initial, queryName, sink, standingStore,
        compactEvery, storeCols = Seq("key"), dedupKey = "key") {
      (batch, standing, batchId) =>
        val knownUrls = unkeyed(standing, UrlPrefix, "norm_url")
        val knownSigs = unkeyed(standing, SigPrefix, "sig")
        // the heavy kernels evaluate once: redelivery tiebreak, then
        // one checkpointed projection feeds every stage and count arm
        val enriched = DeterministicSurvivor
          .keepFirstBy(batch, "doc_id", "page")
          .withColumn("clean_text", GroupC.markupClean(col("page")))
          .withColumn("norm_url", GroupC.urlNormalize(col("url")))
          .localCheckpoint(true)
        // stage 1: markup extract — d96's survivors are the non-empty
        // extractions
        val clean = enriched.filter(length(col("clean_text")) > 0L)
        // stage 2: canonical-URL dedup — d92's keeper rule within the
        // batch (row_number ≤ 1 ⇒ WindowGroupLimit), first-arrival-wins
        // across batches (anti join vs the standing URL set)
        val w = Window.partitionBy(col("norm_url")).orderBy(col("doc_id"))
        val urlFresh = clean.filter(col("norm_url").isNotNull)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .join(knownUrls, Seq("norm_url"), "left_anti")
          .localCheckpoint(true)
        // stage 3: the Gopher gate over the survivors' cleaned text —
        // the ONE shared body, so the live gate cannot drift from d69.
        // With a funnelSink the stage checkpoints (r20 ADVICE): the
        // count arm would otherwise re-run the gopher join (tokenize +
        // rule evaluation over urlFresh) a second time beyond the kept
        // materialization — making the scaladoc's "counts over
        // already-checkpointed frames" true for all four stages. Hot
        // paths (no funnelSink) skip the extra materialization.
        val gopherJoined = urlFresh.join(
          GroupD.gopherOver(urlFresh.select(col("doc_id"),
              col("clean_text").as("text")))
            .filter(col("keep")).select("doc_id"),
          "doc_id")
        val gopherSurv =
          if (funnelSink.isDefined) gopherJoined.localCheckpoint(true)
          else gopherJoined
        // stage 4: exact text dedup — c1's md5 keep-min within the
        // batch, first-arrival-wins across batches
        val ws = Window.partitionBy(col("sig")).orderBy(col("doc_id"))
        val kept = gopherSurv
          .withColumn("sig", md5(col("clean_text")))
          .withColumn("__rn", row_number().over(ws))
          .filter(col("__rn") === 1).drop("__rn")
          .join(knownSigs, Seq("sig"), "left_anti")
          .localCheckpoint(true)
        funnelSink.foreach { fs =>
          val spark = batch.sparkSession
          import spark.implicits._
          val nDocs = enriched.count()
          val nClean = clean.count()
          val nUrls = urlFresh.count()
          val nGopher = gopherSurv.count()
          val nUnique = kept.count()
          fs(Seq(
            ("1_markup_extract", nDocs, nClean),
            ("2_url_dedup", nClean, nUrls),
            ("3_gopher_gate", nUrls, nGopher),
            ("4_exact_dedup", nGopher, nUnique))
            .toDF("stage", "docs_in", "docs_out")
            .withColumn("dropped", col("docs_in") - col("docs_out")),
            batchId)
        }
        // URLs enter standing at stage-2 acceptance (even when gopher
        // later drops the doc — batch parity, see scaladoc);
        // fingerprints at stage-4 acceptance
        (kept, keyed(urlFresh, UrlPrefix, "norm_url")
          .unionByName(keyed(kept, SigPrefix, "sig")))
    }
  }
}
