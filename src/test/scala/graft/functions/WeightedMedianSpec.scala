package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit tests for the typed-Aggregator UDAF exemplar (round-4 verdict #3).
  * Covers the algebraic contract (zero/reduce/merge/finish) directly and
  * the `functions.udaf` registration end-to-end through a grouped query.
  */
class WeightedMedianSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("finish picks the lower weighted median") {
    // values 1,2,3 with weights 1,1,2: total 4, half 2 → cum(1)=1 < 2,
    // cum(2)=2 ≥ 2 → median 2 (NOT 3 despite its larger single weight).
    val hist = Map(1L -> 1L, 2L -> 1L, 3L -> 2L)
    assert(WeightedMedian.finish(hist) === 2L)
    // all weight on one value
    assert(WeightedMedian.finish(Map(7L -> 100L)) === 7L)
    // unit weights reduce to the lower median: 4 values → 2nd smallest
    assert(WeightedMedian.finish(Map(10L -> 1L, 20L -> 1L, 30L -> 1L, 40L -> 1L)) === 20L)
    // a dominant weight pulls the median to it
    assert(WeightedMedian.finish(Map(1L -> 1L, 2L -> 1L, 9L -> 10L)) === 9L)
  }

  test("reduce/merge are order-independent and merge-with-zero is identity") {
    val inputs = Seq((3L, 2L), (1L, 5L), (3L, 1L), (2L, 4L))
    val sequential = inputs.foldLeft(WeightedMedian.zero)(WeightedMedian.reduce)
    val reversed = inputs.reverse.foldLeft(WeightedMedian.zero)(WeightedMedian.reduce)
    assert(sequential === reversed)
    val (left, right) = inputs.splitAt(2)
    val merged = WeightedMedian.merge(
      left.foldLeft(WeightedMedian.zero)(WeightedMedian.reduce),
      right.foldLeft(WeightedMedian.zero)(WeightedMedian.reduce))
    assert(merged === sequential)
    assert(WeightedMedian.merge(sequential, WeightedMedian.zero) === sequential)
    assert(WeightedMedian.finish(sequential) === 2L)
  }

  test("udaf registration aggregates per group with partial aggregation") {
    val s = spark
    import s.implicits._
    val wm = udaf(WeightedMedian)
    // group a: values 1..3 unit weights → lower median 2
    // group b: value 5 dominated by weight → 5
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),
      ("b", 1L, 1L), ("b", 5L, 9L))
      .toDF("g", "v", "w")
      .repartition(2) // force partial buffers to actually merge
      .groupBy("g").agg(wm($"v", $"w").as("m"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 5L))
  }

  test("all-zero weights yield NULL, not the Long.MinValue sentinel (r18)") {
    val hist = WeightedMedian.merge(
      WeightedMedian.reduce(WeightedMedian.zero, (5L, 0L)),
      WeightedMedian.reduce(WeightedMedian.zero, (7L, 0L)))
    assert(WeightedMedian.finish(hist) == null)
  }

  test("zero rows yield NULL like builtin aggregates, not an error") {
    assert(WeightedMedian.finish(WeightedMedian.zero) == null)
    val s = spark
    import s.implicits._
    val wm = udaf(WeightedMedian)
    // ungrouped aggregation over an empty relation: one row, NULL result
    // (round-4 ADVICE: this previously threw from finish(zero))
    val rows = Seq.empty[(Long, Long)].toDF("v", "w")
      .agg(wm($"v", $"w").as("m")).collect()
    assert(rows.length === 1 && rows(0).isNullAt(0))
  }
}
