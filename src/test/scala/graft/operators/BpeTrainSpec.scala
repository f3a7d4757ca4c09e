package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the iterative BPE merge training (d63's engine): the
  * hand-computable textbook corpus, agreement with d38's one-round
  * statistics, and determinism — the properties the missing SQL oracle
  * (iterative fixpoint, d27's contract) would otherwise have checked.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("the Sennrich textbook corpus learns the classic merge sequence") {
    // low×5 lower×2 newest×6 widest×3 — the worked example from the
    // public subword-BPE paper. Hand-derived rounds:
    //   1: (e,s)  9   (ties (s,t) on count; left-symbol tiebreak)
    //   2: (es,t) 9
    //   3: (l,o)  7   (ties (o,w); same rule)
    //   4: (lo,w) 7
    val words = spark.createDataFrame(Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
    )).toDF("w", "wc")
    val got = BpeTrain.train(words, merges = 4)
      .map(m => (m.rank, m.left, m.right, m.count))
    assert(got == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)), got.mkString(", "))
  }

  test("training stops when every word is a single symbol") {
    val words = spark.createDataFrame(Seq(("ab", 3L), ("cd", 1L)))
      .toDF("w", "wc")
    val got = BpeTrain.train(words, merges = 10)
    // round 1 merges (a,b); round 2 merges (c,d); then no pairs remain
    assert(got.map(m => (m.left, m.right)) == Seq(("a", "b"), ("c", "d")),
      got.mkString(", "))
  }

  test("d63 round 1 equals d38's rank-1 pair, and reruns are identical") {
    val d38Top = graft.queries.GroupD.d38BpePairs(spark, sf)
      .filter(col("rnk") === 1).collect().head
    val d63 = graft.queries.GroupD.d63BpeTrain(spark, sf).collect()
    assert(d63.length == 8, s"expected 8 merges, got ${d63.length}")
    val first = d63.head
    assert(first.getString(1) == d38Top.getString(0) &&
      first.getString(2) == d38Top.getString(1) &&
      first.getLong(4) == d38Top.getLong(2),
      s"round 1 ${first} != d38 rank-1 ${d38Top}")
    // merged symbols compose their pair
    assert(d63.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
    // determinism through a genuine retrain (memo cleared)
    graft.queries.GroupD.clearBpeMemo()
    val again = graft.queries.GroupD.d63BpeTrain(spark, sf).collect()
    assert(again.map(_.toString).sameElements(d63.map(_.toString)))
  }
}
