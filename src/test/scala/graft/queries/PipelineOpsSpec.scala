package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant checks for the Group C/D pipeline operators against the
  * sf0.001 testdata (the oracle-differential check at sf0.01 is the
  * correctness gate; these pin structural invariants cheaply).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("c1 exact dedup keeps one row per distinct text, smallest doc_id") {
    val docs = Tables(spark, sf, "documents")
    val out = GroupC.c1DedupExact(spark, sf)
    assert(out.count() == docs.select("text").distinct().count())
    assert(out.select("doc_id").distinct().count() == out.count())
  }

  test("c2 near-dup pairs are ordered, above threshold, and within [0,1]") {
    val rows = GroupC.c2DedupNear(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall { r =>
      val j = r.getDouble(2); j >= 0.6 && j <= 1.0
    })
  }

  test("d1 MinHash+LSH verified pairs equal c2's exact pairs") {
    val exact = GroupC.c2DedupNear(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = GroupD.d1DedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("d2 simhash pairs respect the Hamming threshold and ordering") {
    val rows = GroupD.d2DedupSimhash(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 3))
  }

  test("c3 top-k: the query vector ranks itself first with sim 1.0") {
    val rows = GroupC.c3SimilarityTopk(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.head.getLong(0) == 0L)
    assert(rows.head.getDouble(2) == 1.0)
    val sims = rows.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse) // non-increasing
  }

  test("d3 knn join returns 5 ranked neighbors per query, none itself") {
    val rows = GroupD.d3KnnJoin(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 50L).toSet)
    assert(byQ.values.forall(_.length == 5))
    assert(rows.forall(r => r.getLong(1) != r.getLong(0)))
  }

  test("d4 ANN: every reported neighbor's sim matches the exact cosine rank direction") {
    val rows = GroupD.d4AnnLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("d5 language id emits a prediction for every document") {
    val docs = Tables(spark, sf, "documents")
    val out = GroupD.d5LangId(spark, sf)
    assert(out.count() == docs.count())
    val langs = out.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "fr", "de", "und")))
  }

  test("d6 quality ratios stay inside fixed-point bounds") {
    val rows = GroupD.d6QualityScore(spark, sf).collect()
    assert(rows.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 10000)) // punct
    assert(rows.forall(r => r.getLong(4) >= 0 && r.getLong(4) <= 10000)) // stopword
  }

  test("d8 fingerprints are stable 32-hex md5 plus bounded rolling hash") {
    val rows = GroupD.d8Fingerprint(spark, sf).collect()
    assert(rows.forall(_.getString(1).matches("[0-9a-f]{32}")))
    assert(rows.forall { r =>
      val h = r.getLong(2); h >= 0 && h < 2147483647L
    })
  }
}
