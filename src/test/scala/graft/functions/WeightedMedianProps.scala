package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Properties of the WeightedMedian Aggregator against a naive reference
  * implementation (expand every (value, weight) to `weight` unit copies,
  * take the lower median of the sorted expansion) — the definitional form
  * the histogram fold must agree with, on any input, under any split.
  */
object WeightedMedianProps extends Properties("weightedMedian") {

  private val inputs: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      v <- Gen.chooseNum(-50L, 50L)
      w <- Gen.chooseNum(1L, 9L)
    } yield (v, w))

  private def naive(xs: List[(Long, Long)]): Long = {
    val expanded = xs.flatMap { case (v, w) => List.fill(w.toInt)(v) }.sorted
    expanded((expanded.size - 1) / 2) // lower median of the expansion
  }

  private def fold(xs: List[(Long, Long)]): Map[Long, Long] =
    xs.foldLeft(WeightedMedian.zero)(WeightedMedian.reduce)

  property("equals the unit-expansion lower median") = Prop.forAll(inputs) { xs =>
    WeightedMedian.finish(fold(xs)) == naive(xs)
  }

  property("any 2-way split merges to the same result") =
    Prop.forAll(inputs, Gen.chooseNum(0, 100)) { (xs, cut) =>
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val merged = WeightedMedian.merge(fold(l), fold(r))
      WeightedMedian.finish(merged) == WeightedMedian.finish(fold(xs))
    }

  property("unit weights reduce to the plain lower median") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L))) { vs =>
      val sorted = vs.sorted
      WeightedMedian.finish(fold(vs.map(_ -> 1L))) == sorted((vs.size - 1) / 2)
    }
}
