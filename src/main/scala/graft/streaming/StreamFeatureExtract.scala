package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.multimodal.Multimodal

/** Streaming twin of the multimodal FEATURE-EXTRACT stage (the r16/r17
  * review's stretch item): micro-batches of arriving assets routed
  * through the one shared decode kernel,
  * [[graft.multimodal.Multimodal.extractFeatures]] — native
  * signature-dispatched decodes (BMP/PNG/GIF grid-luma, WAV/Y4M
  * envelope), stub fallback for codec-library bytes — closing the live
  * ingest path: gate ([[StreamImageDedup]]) → dedup survivors →
  * features, all on the stream.
  *
  * Extraction is STATELESS (a pure per-row projection running as a
  * batched per-partition transform), so unlike the gate there is no
  * standing state, no watermark, and nothing to compact. Two entry
  * points:
  *
  *  - [[transform]]: the projection applied DIRECTLY to the streaming
  *    frame — `mapPartitions` is an append-safe streaming operator, so
  *    the extraction composes into any downstream streaming plan
  *    (windowed aggs over feature stats, the drift monitor) without
  *    leaving incremental execution.
  *  - [[start]]: the `foreachBatch` form for callers whose sink wants
  *    the per-batch relational escape hatch (parquet appends, upserts)
  *    — same kernel, same output schema.
  *
  * Constant-plan discipline (NearestCentroid's): the extraction plan is
  * built once from the input schema — nothing about it varies per
  * micro-batch, so incremental planning re-executes the identical
  * projection every trigger.
  *
  * Scale shape: embarrassingly parallel — decode runs scan-side on the
  * executors, one pass per asset, batch-bounded memory; the features
  * column (dim × 4 B) is the only thing a downstream shuffle would
  * carry, never pixels. The `normalize` flag is the advice-r17 scale
  * contract: pass true when a Euclidean consumer (kNN/k-means) reads a
  * mixed-modality stream.
  */
object StreamFeatureExtract {

  /** The streaming projection: appends `features: array<float>` to an
    * unbounded frame carrying a `content` binary column. Append-mode
    * safe; composes into downstream streaming plans.
    */
  def transform(assets: DataFrame, dim: Int = 8,
      normalize: Boolean = false): DataFrame =
    Multimodal.extractFeatures(assets, dim, normalize)

  /** `foreachBatch` form: each micro-batch's extracted frame is handed
    * to `sink` (batchId alongside, for idempotent sinks).
    */
  def start(assets: DataFrame, queryName: String,
      sink: (DataFrame, Long) => Unit, dim: Int = 8,
      normalize: Boolean = false): StreamingQuery =
    assets.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // through transform, not the kernel directly: the two entry
        // points must stay the same extraction by construction
        sink(transform(batch.toDF(), dim, normalize), batchId)
      }
      .start()
}
