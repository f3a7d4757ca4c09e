package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The durable standing-store protocol shared by the streaming ingest
  * gates ([[StreamImageDedup]] — hashes; [[StreamIngestDedup]] — text),
  * extracted in r18 so both gates carry the SAME crash-window safety:
  * per-batch parquet appends, periodic compaction into one deduped
  * snapshot via a tmp-write → unmark → delete → rename swap, and
  * restore-time adjudication of every crash window by the `_SUCCESS`
  * commit marker. Only "directory absent / no data ever committed" maps
  * to an empty store; IO failures and marker-less damage PROPAGATE —
  * a loud restart failure is recoverable, a silently emptied gate
  * re-admits every previously rejected near-dup (review findings
  * r15–r18; the protocol history lives in [[StreamImageDedup]]'s
  * scaladoc, which delegates here).
  */
private[streaming] object StandingStore {

  def tmpPath(dir: String): String = dir.stripSuffix("/") + ".tmp"

  /** `_SUCCESS` commit marker Spark's file committer drops in every
    * completed parquet write — the completeness witness the swap logic
    * keys on (both the per-batch appends and the compaction snapshot
    * re-emit it).
    */
  private def hasMarker(fs: org.apache.hadoop.fs.FileSystem, p: Path) =
    fs.exists(new Path(p, "_SUCCESS"))

  /** The swap protocol HARD-DEPENDS on the committer emitting `_SUCCESS`
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs`, default true).
    * With markers disabled — common with cloud/object-store committers —
    * [[readStore]] would treat every healthy store as damage and
    * [[compactStore]] would refuse every swap, so the dependency is
    * ASSERTED up front with a pointed message instead of surfacing as a
    * spurious "partial history" failure at the first restart (advice
    * r17). Not forced: the Hadoop conf is session-shared, and silently
    * re-enabling markers could break a user's other writes.
    */
  def requireMarkers(conf: org.apache.hadoop.conf.Configuration): Unit =
    require(
      conf.getBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
      "the standing-store swap protocol adjudicates crash windows by " +
        "the _SUCCESS commit marker, but " +
        "mapreduce.fileoutputcommitter.marksuccessfuljobs=false disables " +
        "it — re-enable markers (or run without standingStore)")

  /** True iff `dir` holds NO committed data file — only committer
    * scratch (`_temporary`) and other `_`/`.`-prefixed bookkeeping. A
    * crash during the very first append leaves exactly this shape (no
    * marker, no data, no tmp): an EMPTY store, not damage (advice r17).
    */
  private def hasNoDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                             p: Path): Boolean =
    !fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }

  /** Read the store, restoring a half-finished compaction swap first:
    * None = empty store; damage and IO failures throw. `cols` projects
    * the store's payload columns.
    */
  def readStore(spark: SparkSession, dir: String,
                cols: Seq[String]): Option[DataFrame] = {
    val live = new Path(dir)
    val tmp = new Path(tmpPath(dir))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireMarkers(spark.sparkContext.hadoopConfiguration)
    val liveOk = fs.exists(live) && hasMarker(fs, live)
    if (!liveOk) {
      val tmpOk = fs.exists(tmp) && hasMarker(fs, tmp)
      if (!tmpOk) {
        // crash during the very FIRST append: committer scratch only —
        // an empty store, not damage
        if (fs.exists(live) && !fs.exists(tmp) && hasNoDataFiles(fs, live))
          return None
        if (fs.exists(live) || fs.exists(tmp))
          throw new java.io.IOException(
            s"standing store $dir has no committed snapshot (live " +
              s"marker=${fs.exists(live) && hasMarker(fs, live)}, tmp " +
              s"marker=${fs.exists(tmp) && hasMarker(fs, tmp)}) — " +
              "refusing to restart the gate with a partial history")
        return None // legitimately empty store
      }
      // heal the delete→rename crash window — and fail loudly if we
      // cannot, rather than restarting the gate with an empty memory
      if (fs.exists(live) && !fs.delete(live, true))
        throw new java.io.IOException(
          s"cannot clear partially-deleted store $dir before restore")
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(
          s"cannot restore compaction snapshot ${tmpPath(dir)} -> $dir")
    } else if (fs.exists(tmp)) {
      // live is committed: the tmp snapshot is a leftover from a crash
      // BEFORE the swap began — live superset-or-equals it, drop it (a
      // failure to drop only costs a retry next restart, so best-effort)
      fs.delete(tmp, true)
    }
    Some(spark.read.parquet(dir).select(cols.map(col): _*))
  }

  /** Rewrite the store as one snapshot deduped on `dedupKey` (tmp-write
    * → unmark → delete → rename; [[readStore]] adjudicates every crash
    * window by the `_SUCCESS` marker).
    *
    * The live MARKER is deleted first, as its own single-file (atomic)
    * delete, before the non-atomic recursive dir delete: that ordering
    * is what makes "live has a marker" equivalent to "the delete never
    * started, live is complete" in [[readStore]] — without it a crash
    * mid-recursive-delete could leave a gutted live dir still wearing
    * its marker (review finding r16). Every step's boolean result is
    * CHECKED (advice r17): a false from the recursive delete with the
    * rename still attempted would nest tmp INSIDE the surviving live
    * dir (Hadoop rename-onto-existing-dir semantics) — no committed
    * side at either path while the running query keeps appending;
    * throwing with the committed tmp intact keeps every failure inside
    * [[readStore]]'s restore protocol.
    */
  def compactStore(spark: SparkSession, dir: String,
                   cols: Seq[String], dedupKey: String): Unit = {
    requireMarkers(spark.sparkContext.hadoopConfiguration)
    val snapshot = spark.read.parquet(dir)
      .select(cols.map(col): _*)
      .dropDuplicates(dedupKey)
    snapshot.write.mode("overwrite").parquet(tmpPath(dir))
    val live = new Path(dir)
    val tmp = new Path(tmpPath(dir))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hasMarker(fs, tmp))
      throw new java.io.IOException(
        s"compaction snapshot ${tmpPath(dir)} committed without a " +
          "_SUCCESS marker — refusing to swap (the marker is the swap " +
          "protocol's completeness witness)")
    val liveMarker = new Path(live, "_SUCCESS")
    if (fs.exists(liveMarker) && !fs.delete(liveMarker, false))
      throw new java.io.IOException(
        s"cannot unmark live store $dir before swap (committed snapshot " +
          s"left at ${tmpPath(dir)})") // atomic single-file delete
    if (fs.exists(live) && !fs.delete(live, true))
      throw new java.io.IOException(
        s"cannot delete live store $dir before swap (committed snapshot " +
          s"left at ${tmpPath(dir)} — readStore restores it)")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(
        s"cannot rename ${tmpPath(dir)} -> $dir (committed snapshot left " +
          "in place — readStore restores it)")
  }
}
