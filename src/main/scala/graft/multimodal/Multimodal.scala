package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media assets are opaque `binary` columns travelling next to a
  * typed metadata struct, and decode/feature-extract runs as a batched
  * per-partition transform — the JVM twin of a batched pandas UDF
  * (`mapInPandas`): one iterator in, one iterator out, executed once per
  * partition on the executors, never on the driver.
  *
  * The DECODE KERNEL IS A STUB: real image/audio decoding libraries are
  * intentionally absent from this environment, so [[FakeDecoder]] derives
  * deterministic pseudo-features from the raw bytes. Everything around the
  * kernel — schema, null handling, batch shape, partition parallelism,
  * column pruning — is real and tested; swapping in a real decoder means
  * replacing one pure function.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque bytes. */
  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),           // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate_hz", IntegerType),
    StructField("duration_ms", LongType),
  ))

  /** Canonical asset schema: id + bytes + metadata struct. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", metaSchema),
  ))

  /** STUB decode kernel — stands in for image/audio decoding. Pure and
    * deterministic: folds the bytes through a 31-bit rolling hash per
    * feature lane, normalized to [0, 1). A real decoder (JPEG → pixels →
    * embedding, PCM → mel spectrogram, …) replaces exactly this function.
    */
  object FakeDecoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (bytes == null) return Array.fill(dim)(0f)
      val acc = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        val lane = i % dim
        acc(lane) = (acc(lane) * 65599 + (bytes(i) & 0xff)) % 2147483647L
        i += 1
      }
      acc.map(a => (a.toDouble / 2147483647.0).toFloat)
    }
  }

  /** Feature extraction over a DataFrame with [[assetSchema]] columns:
    * appends `features: array<float>`. Runs via `mapPartitions` — batched,
    * executor-side, schema declared up front so downstream plans stay
    * columnar. Input column order is resolved by name, so the input may
    * carry extra columns in any order.
    */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val contentIdx = df.schema.fieldIndex("content")
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ FakeDecoder.features(bytes, dim).toSeq)
      }
    }
  }

  /** Video frame sampling plan: for each asset, the timestamps (ms) at
    * which frames would be decoded, one row per frame — pure declarative
    * `sequence` + `explode`, so Catalyst prunes and parallelizes it like
    * any other plan. The actual frame decode would run through
    * [[extractFeatures]] on the per-frame byte slices.
    */
  def frameSamplePlan(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("meta.kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("asset_id"),
        explode(expr(s"sequence(0L, meta.duration_ms - 1, ${everyMs}L)"))
          .as("frame_ts_ms"))

  /** Resize planning as metadata arithmetic (the byte-level resize lives
    * behind the decode stub): scales width/height preserving aspect so the
    * longer side equals `target`, never upscaling.
    */
  def resizeMetaPlan(df: DataFrame, target: Int): DataFrame = {
    // greatest(..., 1) guards dimensionless (audio) rows — ANSI mode turns
    // a divide-by-zero into a job abort, not a null.
    val longSide = greatest(col("meta.width"), col("meta.height"), lit(1))
    val scale = least(lit(1.0), lit(target).cast("double") / longSide.cast("double"))
    df.withColumn("resized_width",
        floor(col("meta.width").cast("double") * scale).cast("int"))
      .withColumn("resized_height",
        floor(col("meta.height").cast("double") * scale).cast("int"))
  }
}
