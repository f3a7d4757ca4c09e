package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the transitive-closure step a dedup pipeline runs over its verified
  * near-dup pair graph (pairs say "these two collide"; dedup needs
  * duplicate GROUPS with one canonical survivor each).
  *
  * Each round every vertex takes the minimum of its own label and its
  * neighbors' labels: one equi-join edges⋈labels on the source vertex plus
  * a partial-aggregated `min` per destination vertex — both map-side
  * combinable, shuffling one fixed-size row per (vertex, partition).
  * Convergence after `diameter` rounds; near-dup components are tight
  * clusters (diameter ≤ a few hops), so 2–3 rounds in practice. A corpus
  * with adversarially long chains would switch to the large-star/small-star
  * formulation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14 — O(log n) rounds) on the same join skeleton.
  *
  * Scale mechanics: every round ends in `localCheckpoint` — an iterative
  * plan would otherwise deepen each round until analysis itself became the
  * bottleneck; on a cluster this is `checkpoint` into the reliable store.
  * Superseded rounds' blocks are freed eagerly ([[freeBlocks]]) so storage
  * holds at most two vertex labelings at any time, instead of one per
  * round until driver GC happens to run. The only driver-side values are
  * the per-round convergence bit and the round counter — scalar job
  * results (the AQE-statistics contract), never row data.
  */
object ConnectedComponents {

  /** One propagation round: every vertex's new label is the min of its own
    * and its neighbors'; `__changed` rides along so the caller's
    * convergence probe is a scan, not a re-join. Exposed package-private
    * so the plan shape (equi-join + partial-agg min, no nested loop) is
    * testable — the loop's eager checkpoints erase it from the final
    * query's plan.
    */
  private[graft] def propagate(both: DataFrame, labels: DataFrame): DataFrame = {
    val prop = both.join(labels, both("src") === labels("id"))
      .select(col("dst").as("id"), col("component"))
      .groupBy("id").agg(min("component").as("nbr_min"))
    labels.as("l")
      .join(prop.as("p"), col("l.id") === col("p.id"), "left")
      .select(col("l.id").as("id"),
        least(col("l.component"), coalesce(col("p.nbr_min"), col("l.component")))
          .as("component"),
        (coalesce(col("p.nbr_min"), col("l.component")) < col("l.component"))
          .as("__changed"))
  }

  /** Free the materialized blocks behind a superseded localCheckpoint
    * frame. Only safe once every consumer of the frame is itself
    * materialized — the checkpoint truncated lineage, so the data cannot
    * be recomputed.
    */
  private def freeBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Label every vertex of the undirected graph `edges` (two columns,
    * either orientation per pair; vertices are the union of endpoints)
    * with the MINIMUM vertex id reachable from it — a deterministic
    * component id. Returns (id, component).
    */
  def label(edges: DataFrame, src: String = "src", dst: String = "dst",
            maxRounds: Int = 64): DataFrame = {
    val both = edges.select(col(src).as("src"), col(dst).as("dst"))
      .union(edges.select(col(dst).as("src"), col(src).as("dst")))
      .localCheckpoint()
    var labels = both.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = propagate(both, labels).localCheckpoint()
      converged = next.filter(col("__changed")).isEmpty
      freeBlocks(labels) // superseded: next is materialized, labels unused
      labels = next.drop("__changed")
      rounds += 1
    }
    freeBlocks(both)
    require(converged, s"component labels not stable after $rounds rounds")
    labels
  }
}
