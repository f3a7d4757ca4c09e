package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared within-batch redelivery tiebreak for the foreachBatch
  * gates ([[StreamIngestDedup]], [[StreamSnapshotDiff]]): one row per
  * doc_id, picked DETERMINISTICALLY as the smallest
  * (text, xxhash64-of-all-columns) — a `dropDuplicates` survivor is
  * partition-order dependent, so an at-least-once source redelivering a
  * doc_id with different passthrough values would emit a different row
  * run to run. One definition so the two gates cannot drift.
  *
  * Constraint inherited from `xxhash64`: every column must be a hashable
  * type (no MapType — Spark's hash family rejects maps); that is the
  * price of the deterministic pick.
  */
private[streaming] object DeterministicSurvivor {
  def keepFirst(df: DataFrame): DataFrame = keepFirstBy(df, "doc_id", "text")

  /** Generalized pick for gates with other key/content columns
    * ([[StreamImageDedup]]: asset_id + binary content, which sorts
    * lexicographically) — the content-first tiebreak stays primary so a
    * 64-bit hash collision between DIFFERENT contents cannot make the
    * survivor partition-order dependent; the hash only breaks ties among
    * rows whose content already matches (review finding r14).
    */
  def keepFirstBy(df: DataFrame, key: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col(contentCol).asc_nulls_first,
        xxhash64(df.columns.map(col).toIndexedSeq: _*))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
