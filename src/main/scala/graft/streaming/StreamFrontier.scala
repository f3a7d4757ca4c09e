package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.GroupC

/** Streaming twin of d95's crawl-frontier discovery — the live half of
  * the crawl loop (r19): each micro-batch of arriving PAGES has its
  * outlinks extracted and canonicalized through c13's kernel, and every
  * canonical target NOT yet known (neither a corpus page nor a
  * previously discovered frontier URL) emits to the sink exactly once —
  * the per-batch feed a crawl scheduler consumes, with the registered
  * domain attached for d91-style per-host budgeting.
  *
  * The fourth gate on the shared [[StandingGate]] skeleton: the
  * standing side is the same single-column canonical-URL frame
  * [[StreamUrlDedup]] maintains — SEQUENTIAL runs may share one
  * store dir/base so the two gates share one notion of "known", but
  * two CONCURRENTLY running gates on one store dir race (append vs
  * marker-swap compaction), and each gate restores the store only
  * once at start so neither sees the other's later appends:
  * concurrent gates need separate dirs (r19 ADVICE). The standing set
  * grows by each batch's discoveries, and — when `pageUrl` names the
  * arriving pages' own raw-URL column — by the pages themselves.
  * Unlike the dedup gates there is NO refusal passthrough:
  * a refused outlink (relative href, junk) is not a crawlable target —
  * it simply drops, and a page's own redelivery re-extracts the same
  * links, which all anti-join away against the standing set.
  *
  * Scale shape: the explode ships canonical STRINGS only (page bytes
  * never leave the batch scan); the within-batch distinct and the anti
  * join shuffle on the canonical-URL key — d92's exchange — with the
  * standing side streamed once per batch and never self-joined; the
  * domain column is a scan-side projection over the survivors.
  */
object StreamFrontier {

  /** Start the discovery gate: `delta` is a streaming frame with
    * (doc_id, html) plus passthrough columns (ignored — emissions are
    * URL-keyed, not page-keyed); `base` a static frame with a
    * `norm_url` column of ALREADY-canonical known URLs (the corpus's
    * own pages — d92's output shape). `sink` receives each batch's
    * newly discovered (norm_url, domain) rows.
    *
    * `base` must cover every ALREADY-CRAWLED page at gate start — a
    * stale or empty base makes crawled pages re-emit as discoveries
    * the moment anything links to them (pages linking to THEMSELVES
    * make this the common case on a cold start — r19 ADVICE). When the
    * arriving frame carries the page's own raw URL, pass its column
    * name as `pageUrl`: each batch then unions the arriving pages'
    * canonical URLs into the known set BEFORE the anti-join, so a page
    * is known from the moment it arrives (self-links and intra-batch
    * cross-links drop; a truly cold start needs only an empty base).
    *
    * `standingStore`: optional parquet directory making the known-URL
    * set DURABLE via [[StandingStore]]'s marker-adjudicated protocol
    * (append after the sink call — a crash between them re-emits the
    * discoveries on replay, at-least-once, rather than losing them).
    */
  def start(delta: DataFrame, base: DataFrame, queryName: String,
            sink: (DataFrame, Long) => Unit,
            standingStore: Option[String] = None,
            compactEvery: Int = 8,
            pageUrl: Option[String] = None): StreamingQuery = {
    require(delta.columns.contains("html"),
      s"delta must carry html; has ${delta.columns.mkString(", ")}")
    require(base.columns.contains("norm_url"),
      s"base must carry norm_url (d92's output shape); has " +
        base.columns.mkString(", "))
    pageUrl.foreach(cu => require(delta.columns.contains(cu),
      s"pageUrl column $cu not in delta: ${delta.columns.mkString(", ")}"))
    StandingGate.start(delta, base.select(col("norm_url")), queryName,
        sink, standingStore, compactEvery,
        storeCols = Seq("norm_url"), dedupKey = "norm_url") {
      (batch, standing, _) =>
        val links = batch
          .select(explode(regexp_extract_all(col("html"),
            lit(GroupC.HrefP), lit(1))).as("url"))
          .select(GroupC.urlNormalize(col("url")).as("norm_url"))
          .filter(col("norm_url").isNotNull)
          .distinct()
        // the arriving pages' own canonical URLs: known-by-arrival
        val own = pageUrl.map(cu => batch
          .select(GroupC.urlNormalize(col(cu)).as("norm_url"))
          .filter(col("norm_url").isNotNull)
          .distinct())
        val known = own.foldLeft(standing)(_ unionByName _)
        val kept = links
          .join(known, Seq("norm_url"), "left_anti")
          .withColumn("domain", GroupC.urlDomain(col("norm_url")))
          .localCheckpoint(true)
        // own URLs enter the standing set too (dupes across batches are
        // harmless: the set is anti-join-only; compaction dedups the
        // store). The pageUrl union is CHECKPOINTED because `own` is a
        // lazy projection of the foreachBatch dataset — without it the
        // standing union's lineage would reach every prior batch's
        // source plan until the next compactEvery re-checkpoint (a
        // non-re-readable source — cleanSource=delete — would kill the
        // query; a re-readable one re-reads all prior batches per
        // batch; r20 review). Without pageUrl, kept is already a
        // checkpoint leaf — no second materialization on the hot path.
        (kept, own.map(o => kept.select("norm_url").unionByName(o)
            .localCheckpoint(true))
          .getOrElse(kept.select("norm_url")))
    }
  }
}
