package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of d78's image near-dup dedup — the ingest gate for a
  * crawled-image feed: each micro-batch of arriving assets is
  * PERCEPTUALLY deduped (dHash-64 via the native pixel decode, Hamming ≤
  * `maxDist`, banded candidate generation) against the standing accepted
  * set plus smaller-id batch peers, and only survivors pass to the sink.
  * Banding stays EXACT (pigeonhole: `maxDist` < 4 bands ⇒ every
  * qualifying pair shares an intact 16-bit band), so the gate's recall
  * is 1 by construction — same contract as the batch query.
  *
  * Like [[StreamIngestDedup]], the per-batch relational body is not an
  * append-mode streaming plan, so it runs per micro-batch via
  * `foreachBatch`; the only streaming state is the standing hash set.
  * Intra-batch semantics mirror d34's rule verbatim: an asset drops if
  * it near-duplicates the standing set OR a batch peer with a SMALLER
  * id, whether or not that peer itself survives.
  *
  * UNPARSEABLE assets (NULL dHash — truncated files, non-BMP bytes) pass
  * the gate (a dup cannot be proven) but never enter the standing side;
  * the caller's downstream quality gate owns them. That choice keeps the
  * gate monotone: accepting junk never suppresses a future real image.
  *
  * Scale shape: the standing side carries (asset_id, 8-byte dhash) —
  * never pixels — so the standing band index is tiny relative to the
  * corpus; the probe side is trigger-bounded; survivors checkpoint
  * before the standing union so lineage stays shallow, and every
  * `compactEvery` batches the accumulated union re-checkpoints back to
  * a SINGLE leaf (each batch's union adds one plan leaf; on a
  * long-running gate analysis cost would otherwise grow linearly with
  * batch count). Survivor hashes come from the batch's already-decoded
  * frame by a semi-join — the perceptual decode runs exactly once per
  * arriving asset.
  *
  * `standingStore` makes the accepted hash set durable: parquet append
  * AFTER the sink call (a crash between them re-emits on replay,
  * at-least-once, rather than silently swallowing a batch), compacted
  * every `compactEvery` batches — the per-batch appends are many tiny
  * files a restart would otherwise re-list and re-read forever. The
  * compaction swap is crash-safe: the compacted store lands in
  * `<dir>.tmp` first, the live dir is only deleted once the tmp write
  * committed, and every crash window is adjudicated by the `_SUCCESS`
  * commit marker at restore time — a committed tmp outranks a
  * mid-delete live dir, a committed live outranks a stale tmp, and a
  * store with NO committed side fails loudly instead of restarting the
  * gate with a partial hash history (see [[readStore]]).
  */
object StreamImageDedup {

  private def tmpPath(dir: String) = dir.stripSuffix("/") + ".tmp"

  /** `_SUCCESS` commit marker Spark's file committer drops in every
    * completed parquet write — the completeness witness the swap logic
    * below keys on (both the per-batch appends and the compaction
    * snapshot write re-emit it).
    */
  private def hasMarker(fs: org.apache.hadoop.fs.FileSystem, p: Path) =
    fs.exists(new Path(p, "_SUCCESS"))

  /** The swap protocol HARD-DEPENDS on the committer emitting `_SUCCESS`
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs`, default true).
    * With markers disabled — common with cloud/object-store committers —
    * [[readStore]] would treat every healthy store as damage and
    * [[compactStore]] would refuse every swap, so the dependency is
    * ASSERTED up front with a pointed message instead of surfacing as a
    * spurious "partial hash history" failure at the first restart
    * (advice r17). Not forced: the Hadoop conf is session-shared, and
    * silently re-enabling markers could break a user's other writes.
    */
  private[streaming] def requireMarkers(
      conf: org.apache.hadoop.conf.Configuration): Unit =
    require(
      conf.getBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
      "StreamImageDedup's standing-store swap protocol adjudicates crash " +
        "windows by the _SUCCESS commit marker, but " +
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

  /** Read the durable store, restoring a half-finished compaction swap
    * first: None = empty store.
    *
    * Only "directory absent" maps to None. IO/rename failures PROPAGATE:
    * compaction deletes the live dir, so a transient FS error here can
    * no longer be told apart from a never-written store — swallowing it
    * would silently discard the entire accepted-hash history and
    * re-admit every previously rejected near-dup (review finding r15).
    * A loud restart failure is recoverable; a silently emptied gate is
    * not.
    *
    * Crash-window adjudication is by the `_SUCCESS` commit marker
    * (review finding r16 — `fs.delete(live)` is not atomic, so "live
    * exists" alone does not mean "live is complete"):
    *   - live present WITH marker → authoritative; a stale tmp (crash
    *     between tmp write and delete) is discarded, not preferred —
    *     live still holds every appended batch the snapshot holds.
    *   - live present WITHOUT marker → a partial delete. The committed
    *     tmp snapshot, if present, replaces it; with no committed tmp
    *     the history is genuinely damaged and the gate fails loudly
    *     rather than silently re-admitting past rejects.
    *   - live absent → a committed tmp is renamed into place; an
    *     UNcommitted tmp with no live dir is likewise damage, not an
    *     empty store.
    */
  private[streaming] def readStore(spark: SparkSession,
                                   dir: String): Option[DataFrame] = {
    val live = new Path(dir)
    val tmp = new Path(tmpPath(dir))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireMarkers(spark.sparkContext.hadoopConfiguration)
    val liveOk = fs.exists(live) && hasMarker(fs, live)
    if (!liveOk) {
      val tmpOk = fs.exists(tmp) && hasMarker(fs, tmp)
      if (!tmpOk) {
        // a crash during the very FIRST append leaves a live dir holding
        // only committer scratch (_temporary), no marker, no tmp, no data
        // — an empty store, not damage (advice r17)
        if (fs.exists(live) && !fs.exists(tmp) && hasNoDataFiles(fs, live))
          return None
        if (fs.exists(live) || fs.exists(tmp))
          throw new java.io.IOException(
            s"standing store $dir has no committed snapshot (live " +
              s"marker=${fs.exists(live) && hasMarker(fs, live)}, tmp " +
              s"marker=${fs.exists(tmp) && hasMarker(fs, tmp)}) — " +
              "refusing to restart the gate with a partial hash history")
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
    Some(spark.read.parquet(dir).select(col("asset_id"), col("dhash")))
  }

  /** Rewrite the store as one deduped snapshot (tmp-write → unmark →
    * delete → rename; [[readStore]] adjudicates every crash window by
    * the `_SUCCESS` marker).
    *
    * The live MARKER is deleted first, as its own single-file (atomic)
    * delete, before the non-atomic recursive dir delete: that ordering
    * is what makes "live has a marker" equivalent to "the delete never
    * started, live is complete" in [[readStore]] — without it a crash
    * mid-recursive-delete could leave a gutted live dir still wearing
    * its marker (review finding r16).
    */
  private[streaming] def compactStore(spark: SparkSession,
                                      dir: String): Unit = {
    requireMarkers(spark.sparkContext.hadoopConfiguration)
    val snapshot = spark.read.parquet(dir)
      .select(col("asset_id"), col("dhash"))
      .dropDuplicates("asset_id")
    snapshot.write.mode("overwrite").parquet(tmpPath(dir))
    val live = new Path(dir)
    val tmp = new Path(tmpPath(dir))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hasMarker(fs, tmp))
      throw new java.io.IOException(
        s"compaction snapshot ${tmpPath(dir)} committed without a " +
          "_SUCCESS marker — refusing to swap (the marker is the swap " +
          "protocol's completeness witness)")
    // every step's boolean result is CHECKED (advice r17): a false from
    // the recursive delete with the rename still attempted would nest tmp
    // INSIDE the surviving live dir (Hadoop rename-onto-existing-dir
    // semantics) — no committed side at either path while the running
    // query keeps appending. Throwing with the committed tmp intact keeps
    // every failure inside readStore's restore protocol.
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

  /** `hashName` selects the perceptual 64-bit hash — the image decode by
    * default; pass [[graft.functions.GraftFunctions.WavEnergyHashName]]
    * and the SAME gate (same rule, same state shape, same durability)
    * serves an audio-ingest feed, because everything past the decode
    * operates on (id, 64-bit hash) only.
    */
  def start(delta: DataFrame, base: DataFrame, queryName: String,
            sink: (DataFrame, Long) => Unit,
            maxDist: Int = 3,
            standingStore: Option[String] = None,
            compactEvery: Int = 8,
            hashName: String =
              graft.functions.GraftFunctions.BmpDhashName): StreamingQuery = {
    require(maxDist >= 0 && maxDist < 4,
      s"banded exactness needs maxDist < 4 (bands), got $maxDist")
    require(compactEvery > 0, s"compactEvery must be positive: $compactEvery")
    val spark = base.sparkSession
    graft.functions.GraftFunctions.register(spark)

    def hashed(df: DataFrame): DataFrame =
      df.select(col("asset_id"), expr(s"$hashName(content)").as("dhash"))
        .filter(col("dhash").isNotNull)

    val persisted = standingStore.flatMap(dir => readStore(spark, dir))
    var standing = persisted.foldLeft(hashed(base))(_ unionByName _)
      .localCheckpoint(true)
    var batches = 0L

    delta.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // deterministic within-batch survivor per asset_id (at-least-once
        // redelivery may vary passthrough columns; content-first tiebreak
        // via the shared definition so the gates cannot drift), then drop
        // ids the standing side already accepted — a redelivery, not a
        // new asset
        val b0 = DeterministicSurvivor
          .keepFirstBy(batch.toDF(), "asset_id", "content")
          .join(standing.select("asset_id"), Seq("asset_id"), "left_anti")
          .localCheckpoint(true)
        val bh = hashed(b0).localCheckpoint(true)
        // the SHARED dup rule (graft.operators.PerceptualDedup — one
        // definition with the declared d83 batch query, so gate and
        // query cannot drift): dup vs standing, or vs a smaller-id peer
        val dups = graft.operators.PerceptualDedup.dupIds(
            bh.toDF("id", "hash"), standing.toDF("id", "hash"), maxDist)
          .withColumnRenamed("id", "asset_id")
        val kept = b0.join(dups, Seq("asset_id"), "left_anti")
          .localCheckpoint(true)
        // survivors' hashes come from bh by a semi-join — kept ⊆ b0 and
        // bh = hashed(b0), so re-hashing kept.content would run the
        // perceptual decode a second time per accepted asset (review
        // finding r15); junk survivors (NULL hash) are already absent
        // from bh, preserving the never-enter-standing contract
        val keptHashes = bh
          .join(kept.select("asset_id"), Seq("asset_id"), "left_semi")
          .localCheckpoint(true)
        standing = standing.unionByName(keptHashes)
        batches += 1
        // collapse the ever-wider union back to one leaf periodically
        // (review finding r15: one new leaf per batch means linearly
        // growing analysis/band-explode cost on a long-running gate)
        if (batches % compactEvery == 0)
          standing = standing.localCheckpoint(true)
        sink(kept, batchId)
        standingStore.foreach { dir =>
          keptHashes.write.mode("append").parquet(dir)
          if (batches % compactEvery == 0) compactStore(spark, dir)
        }
      }
      .start()
  }
}
