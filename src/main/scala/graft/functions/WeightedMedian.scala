package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` exemplar — the Spark-side UDAF surface
  * SURVEY §2.2 maps onto the reference's row-hook extension seam
  * (`/root/reference/src/CSVProvider.cs:570`, `ProcessInputRow`): custom
  * per-group logic the builtin aggregates can't express.
  *
  * Computes the exact LOWER WEIGHTED MEDIAN of an integer-valued measure
  * with integer weights: the smallest value v such that the cumulative
  * weight of all inputs ≤ v reaches ⌈totalWeight / 2⌉ (reduces to the lower
  * median when every weight is 1).
  *
  * Scale design: the buffer is a value→totalWeight histogram, so its size
  * is bounded by the measure's distinct-value count, not the row count
  * (l_quantity has ≤ 50 distinct values at any SF). `reduce`/`merge` are
  * commutative and associative over Longs — exact, order-independent
  * arithmetic — so the aggregator rides Spark's partial aggregation:
  * map-side combine, one fixed-size shuffle row per (group, partition),
  * bit-stable results under any partitioning. A double-weight variant
  * would be ulp-sensitive to merge order; integer weights are the
  * deterministic contract.
  */
object WeightedMedian extends Aggregator[(Long, Long), Map[Long, Long], java.lang.Long] {
  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], a: (Long, Long)): Map[Long, Long] =
    b.updated(a._1, b.getOrElse(a._1, 0L) + a._2)

  override def merge(b1: Map[Long, Long], b2: Map[Long, Long]): Map[Long, Long] =
    b2.foldLeft(b1) { case (acc, (v, w)) => acc.updated(v, acc.getOrElse(v, 0L) + w) }

  /** NULL on zero rows, like the builtin aggregates: an ungrouped
    * aggregation over an empty relation calls `finish(zero)` — throwing
    * there would fail the whole query (round-4 ADVICE). The boxed OUT
    * type is what lets the encoder admit the null.
    */
  override def finish(hist: Map[Long, Long]): java.lang.Long = {
    if (hist.isEmpty) return null
    val half = (hist.valuesIterator.sum + 1) / 2
    // total weight ≤ 0 (all-zero or net-negative weights): the median is
    // UNDEFINED — NULL, not the Long.MinValue loop sentinel (r18 review)
    if (half <= 0) return null
    var cum = 0L
    var res = Long.MinValue
    val it = hist.toSeq.sortBy(_._1).iterator
    while (cum < half && it.hasNext) {
      val (v, w) = it.next()
      cum += w
      res = v
    }
    java.lang.Long.valueOf(res)
  }

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
}
