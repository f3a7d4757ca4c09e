package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
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
  * before the standing union so lineage stays one plan deep per batch.
  * `standingStore` makes the accepted hash set durable (parquet append
  * AFTER the sink call — a crash between them re-emits on replay,
  * at-least-once, rather than silently swallowing a batch).
  */
object StreamImageDedup {

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
            hashName: String =
              graft.functions.GraftFunctions.BmpDhashName): StreamingQuery = {
    require(maxDist >= 0 && maxDist < 4,
      s"banded exactness needs maxDist < 4 (bands), got $maxDist")
    val spark = base.sparkSession
    graft.functions.GraftFunctions.register(spark)

    def hashed(df: DataFrame): DataFrame =
      df.select(col("asset_id"), expr(s"$hashName(content)").as("dhash"))
        .filter(col("dhash").isNotNull)

    val persisted = standingStore.flatMap { dir =>
      try Some(spark.read.parquet(dir).select(col("asset_id"), col("dhash")))
      catch { case scala.util.control.NonFatal(_) => None } // empty store
    }
    var standing = persisted.foldLeft(hashed(base))(_ unionByName _)
      .localCheckpoint(true)

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
        val keptHashes = hashed(kept).localCheckpoint(true)
        standing = standing.unionByName(keptHashes)
        sink(kept, batchId)
        standingStore.foreach { dir =>
          keptHashes.write.mode("append").parquet(dir)
        }
      }
      .start()
  }
}
