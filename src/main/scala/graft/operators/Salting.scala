package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key salting for skewed shuffles. AQE's skew-join split handles most
  * sort-merge-join skew at runtime; explicit salting is the remaining tool
  * when the skew must be split BEFORE the shuffle — a hot key whose rows
  * all hash to one task (map-side no help), or a skewed key feeding an
  * aggregation whose partial rows are still too hot per key. Both forms
  * are deterministic (hash-derived salt, no randomness), so results are
  * reproducible and plans cacheable.
  */
object Salting {

  private val SaltCol = "__graft_salt"

  /** Salt value: whole-row hash MIXED with the row's ordinal within its
    * partition (r18 review — a hot key made of byte-IDENTICAL duplicate
    * rows, precisely a dedup-corpus shape, hashed to ONE salt value and
    * the "salted" join degenerated to the unsalted plan; the
    * per-partition ordinal separates identical rows).
    *
    * Determinism contract (r19 ADVICE): salt VALUES are only
    * LAYOUT-stable — `monotonically_increasing_id()` depends on the
    * physical partition layout, so AQE coalescing or an upstream shuffle
    * change can re-deal which salt bucket a row lands in between runs.
    * JOIN/AGGREGATION RESULTS are salt-invariant regardless (every salt
    * value meets the full replicated small side / merges in the final
    * pass), so callers get reproducible RESULTS, not reproducible
    * bucket assignments. The expression is also flagged nondeterministic
    * by Catalyst, which fences predicate pushdown through the salted
    * projection — apply filters BEFORE salting (the alternative, a
    * custom ordinal expression falsely declared deterministic, would
    * license Catalyst to re-evaluate/reorder it and silently break the
    * identical-rows-spread property this exists for). Fails fast on a
    * pre-existing salt column instead of silently overwriting it
    * (ShardedOrder's reserved-name rule).
    */
  private def saltOf(df: DataFrame, salt: Int) = {
    require(!df.columns.contains(SaltCol),
      s"input already carries $SaltCol — rename it first")
    pmod(xxhash64(struct(df.columns.map(col) :+
      monotonically_increasing_id(): _*)), lit(salt)).cast("int")
  }

  /** Equi-join a skewed `big` side to a `small` side on `key`, splitting
    * every big-side key into `salt` sub-keys: big rows get a deterministic
    * salt from a hash of the whole row mixed with its partition ordinal
    * (identical duplicate rows must still spread), the small side is replicated once
    * per salt value, and the join runs on (key, salt) — a hot key's rows
    * spread over `salt` tasks instead of one. Small-side cost: ×`salt`
    * rows shuffled (pick `salt` ≈ a few × executor count, only worth it
    * when `small` is genuinely small).
    */
  /** Join types safe under small-side replication: each small-side row
    * appears once per salt value, so any join type that can emit an
    * UNMATCHED small-side row (right/full outer) would emit it `salt`
    * times (round-3 ADVICE). */
  private val SafeJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi",
      "leftanti", "left_anti")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched small-side " +
        s"rows $salt times; safe types: inner, left, left_semi, left_anti")
    val saltedBig = big.withColumn(SaltCol, saltOf(big, salt))
    val saltedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, Seq(key, SaltCol), joinType).drop(SaltCol)
  }

  /** Two-phase salted aggregation for algebraic aggregates (sum/count/
    * min/max): partial aggregate on (key, salt) spreads a hot key across
    * `salt` reducers, the final pass merges the `salt` partials per key.
    * Spark's own partial aggregation usually makes this unnecessary — use
    * it when the per-key PARTIAL rows are still hot (e.g. huge maps of
    * distinct combiner state per key).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn(SaltCol, saltOf(df, salt))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col(key))
      .agg(sum(col("partial_sum")).as(s"sum_$valueCol"),
        sum(col("partial_n")).as("n"))
  }
}
