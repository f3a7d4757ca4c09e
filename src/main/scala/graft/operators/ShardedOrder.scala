package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dominant-key escape for per-key window ranks and running totals — the
  * scale hazard d15/d17/d20 document: `Window.partitionBy(lang)` puts a
  * whole language in ONE window partition, so a corpus where one language
  * dominates (English at web scale) serializes its rank/cumsum into a
  * single task no matter how many executors exist.
  *
  * The escape is the classic two-level prefix sum (b32's running-total
  * plan family): range-partition each key group by the LEADING NIBBLE of
  * the md5 order key (16 shards), rank/cumsum within (key, shard) — 16×
  * smaller window partitions, embarrassingly parallel — then add per-shard
  * offsets computed from a tiny (keys × 16)-row aggregate that broadcasts.
  * Because shard order equals the order key's lexicographic order (single
  * hex digits sort '0'<…<'9'<'a'<…<'f' both numerically and as text), the
  * shard ranges PARTITION the total order, and ranks/sums over a total
  * order decompose exactly across ordered ranges — the sharded result is
  * bit-identical to the single-window formulation (pinned in
  * PipelineOpsSpec against d15/d20), not an approximation.
  *
  * At 100 TB: one nibble (16 shards) multiplies per-key parallelism by 16;
  * deeper sharding is the same plan with more leading nibbles. The offset
  * aggregate stays keys × shards rows — always broadcastable.
  *
  * Reference seam: the reference has no ordering surface at all (pull loop,
  * /root/reference/src/CSVProvider.cs:563-577); this operator serves the
  * beyond-reference layout/split queries (SURVEY §2.3 d15/d20/d37).
  */
object ShardedOrder {

  /** Adds to `df`:
    *   - `rn`:     1-based rank over (h asc, tie asc) within each key group
    *   - `n`:      the key group's row count
    *   - `prefix`: exclusive running sum of `weight` in the same order
    *     (0 for the first row; only when `weight` is set)
    * computed per (key, leading-nibble-of-h shard) with shard-offset
    * prefix sums. `h` must be a lowercase hex string (e.g. `md5(...)`).
    *
    * CONTRACT — small key cardinality: the offsets frame is
    * |distinct keys| × 16 rows and is force-broadcast, so `keys` must be a
    * LOW-cardinality grouping (languages, splits, source buckets — the
    * dominant-key scenario this operator exists for). Sharding by a
    * high-cardinality key (doc prefix, user id) would push the broadcast
    * past the threshold / driver memory; such keys don't have the
    * dominant-key problem in the first place — use a plain window.
    */
  def rankAndPrefixSum(df: DataFrame, keys: Seq[String], h: Column,
      tie: Column, weight: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "sharded order needs at least one key column")
    // fail fast on name clashes: silently overwriting a caller's column
    // (and dropping the internal ones at the end) would destroy user data
    val reserved = Seq("__h", "__shard", "__w", "__srn", "__spre",
      "__coff", "__soff", "rn", "n") ++ (if (weight.isDefined) Seq("prefix") else Nil)
    val clashes = df.columns.toSet intersect reserved.toSet
    require(clashes.isEmpty,
      s"input columns collide with sharded-order outputs/internals: " +
        s"${clashes.mkString(", ")} — rename them first")
    val kCols = keys.map(col)
    val keyed = df.withColumn("__h", h)
      .withColumn("__shard", conv(substring(col("__h"), 1, 1), 16, 10).cast("int"))
      .withColumn("__w", weight.getOrElse(lit(1L)).cast("long"))
    val wShard = Window.partitionBy(kCols :+ col("__shard"): _*)
      .orderBy(col("__h"), tie)
    val ranked = keyed
      .withColumn("__srn", row_number().over(wShard))
      .withColumn("__spre", coalesce(sum(col("__w")).over(
        wShard.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // keys × 16 rows: counts and weight sums per shard → exclusive offsets
    val wOff = Window.partitionBy(kCols: _*).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(kCols :+ col("__shard"): _*)
      .agg(count(lit(1)).as("__c"), sum(col("__w")).as("__s"))
      .withColumn("__coff", coalesce(sum("__c").over(wOff), lit(0L)))
      .withColumn("__soff", coalesce(sum("__s").over(wOff), lit(0L)))
      .withColumn("n", sum("__c").over(Window.partitionBy(kCols: _*)))
      .select(kCols ++ Seq(col("__shard"), col("__coff"), col("__soff"), col("n")): _*)
    // NULL-SAFE offset attach (r18 review): a using-columns inner join
    // would silently DROP every row whose key is NULL — but the window
    // formulation this operator must be bit-identical to treats NULL as
    // an ordinary partition value, so the join matches with <=> instead
    val r = ranked.alias("__so_r")
    val o = broadcast(offs).alias("__so_o")
    val cond = (keys :+ "__shard")
      .map(k => col(s"__so_r.$k") <=> col(s"__so_o.$k")).reduce(_ && _)
    val out = r.join(o, cond)
      .select(col("__so_r.*"), col("__so_o.__coff"),
        col("__so_o.__soff"), col("__so_o.n"))
      .withColumn("rn", col("__srn") + col("__coff"))
    (if (weight.isDefined) out.withColumn("prefix", col("__spre") + col("__soff"))
     else out)
      .drop("__h", "__shard", "__w", "__srn", "__spre", "__coff", "__soff")
  }
}
