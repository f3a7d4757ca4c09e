package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The long-lived-cluster SHARED-FRAME policy next to [[ModelCache]]'s
  * trained-artifact layer: pipeline stage frames that several declared
  * queries re-derive from scratch (d22's gate/kept/capped consumed again
  * by d56's funnel, d58's scored frame consumed again by d61's assembly)
  * are persisted ONCE per (corpus, stage) and served from the block store
  * for the rest of the process — exactly what a production pipeline on a
  * long-lived cluster does with its intermediate datasets, where the
  * curation run and its audit queries share materializations instead of
  * recomputing the dedup graph per report.
  *
  * OPT-IN by the same gate as [[ModelCache]] (`graft.model.cache` set —
  * Bench/Verify enable it, specs don't), so unit suites keep exercising
  * the raw declarative plans and the AQE exchange-reuse pins; a spec that
  * wants the policy under test sets the property and calls [[clear]]
  * around itself. The cache is an optimization, never a correctness
  * dependency: every cached frame is deterministic (no-RNG discipline
  * corpus-wide), so serving the materialization is value-identical to
  * re-deriving it.
  *
  * Scale shape: entries are stage OUTPUTS (per-doc narrow rows or
  * model-bounded frames), not scans — MEMORY_AND_DISK spills rather than
  * evicts under pressure, and the registry is per-JVM with a handful of
  * keys per corpus. A stopped session's entries are rebuilt, not served.
  */
object StageCache {
  /** Per-key lazy holder (the bpeMemo/AnnTuning putIfAbsent discipline,
    * review finding round 13): a miss on key A must not block a
    * concurrent build of key B behind one global monitor — each entry
    * synchronizes only on itself, and `lazy val` gives exactly-once
    * build-and-persist per holder.
    */
  private final class Entry(build: () => DataFrame) {
    // the frame this entry persisted, visible to release()/clear()
    // without forcing a never-requested build; null until the lazy
    // build completes (an in-flight build during clear() leaks at most
    // a cache MARK, never computed blocks — documented single-threaded-
    // driver assumption for the toggle paths)
    @volatile private[StageCache] var persistedDf: DataFrame = null
    lazy val df: DataFrame = {
      val d = build().persist(StorageLevel.MEMORY_AND_DISK)
      persistedDf = d
      d
    }
    private[StageCache] def drop(): Unit = {
      val d = persistedDf
      if (d != null)
        try d.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
    }
  }
  private val frames = new ConcurrentHashMap[String, Entry]()

  def enabled: Boolean = ModelCache.root.nonEmpty

  /** Serve the persisted frame for `key` (callers namespace by corpus
    * dir: `s"$sfDir#stage"`), building + persisting on first touch.
    * Assumes the drivers' one-live-session-per-JVM model (Bench/Verify):
    * a frame from a STOPPED session is rebuilt, but two concurrently
    * live sessions in one JVM would share entries — callers with that
    * shape must namespace the key by session.
    */
  def persisted(key: String)(build: => DataFrame): DataFrame = {
    if (!enabled) build
    else {
      val fresh = new Entry(() => build)
      var entry = frames.putIfAbsent(key, fresh)
      if (entry == null) entry = fresh
      val df = entry.df
      // a concurrent release()/clear() may have removed the entry while
      // the build was in flight (its drop() saw persistedDf == null and
      // was a no-op) — the frame would stay pinned with no owner. Detect
      // the orphan and unpin it; the returned DataFrame stays usable,
      // just uncached (review finding r14).
      if (frames.get(key) ne entry) entry.drop()
      if (!df.sparkSession.sparkContext.isStopped) df
      else {
        // stale session: replace THIS entry and rebuild (rare path)
        val rebuilt = new Entry(() => build)
        val winner =
          if (frames.replace(key, entry, rebuilt)) rebuilt
          else {
            // lost the race: serve whoever won — or, if a concurrent
            // clear()/release() removed the key entirely, build locally
            // (review finding r13: the bare get(key).df NPE'd here)
            val cur = frames.get(key)
            if (cur != null) cur else rebuilt
          }
        val out = winner.df
        // same orphan check as the first-build path (review finding
        // r15): a concurrent clear()/release() that raced the rebuild's
        // in-flight build saw persistedDf == null and no-op'd — if the
        // map no longer holds `winner`, nobody owns its pin; unpin and
        // keep serving the (now uncached) frame
        if (frames.get(key) ne winner) winner.drop()
        out
      }
    }
  }

  /** Release every entry of ONE corpus (keys are `s"$corpus#stage"`):
    * the eviction story a long-lived production session needs — a
    * session that cycles through corpora calls `release(dir)` when a
    * corpus's pipeline run ends, unpinning its stage frames while other
    * corpora keep serving theirs. Removal happens before unpersist so a
    * concurrent `persisted` rebuilds rather than serving a dropped
    * frame.
    */
  def release(corpus: String): Unit = {
    val prefix = corpus + "#"
    val it = frames.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) {
        it.remove()
        e.getValue.drop()
      }
    }
  }

  /** Unpersist and drop every entry — for specs that toggle the policy. */
  def clear(): Unit = {
    frames.values.forEach(_.drop())
    frames.clear()
  }
}
