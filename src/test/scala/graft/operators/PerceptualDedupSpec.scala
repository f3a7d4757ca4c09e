package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit pins for the shared banded dup rule ([[PerceptualDedup]]):
  * standing drops, the smaller-id peer rule, threshold boundaries, NULL
  * hash behavior, and the pigeonhole precondition.
  */
class PerceptualDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  private def flip(p: Long, ks: Int*): Long = ks.foldLeft(p)((x, k) => x ^ (1L << k))

  test("dup vs standing at any id order; smaller-peer rule inside the probe") {
    val standing = Seq((1L, 100L)).toDF("id", "hash")
    val probe = Seq(
      (10L, flip(100L, 5)),        // hamming 1 vs standing → dup
      (11L, 7777L),                // far from everything smaller → clean
      (12L, flip(7777L, 3, 40)),   // hamming 2 vs SMALLER peer 11 → dup
      (9L, 0x00FF00FF00FF00FFL)    // far from everything → clean
    ).toDF("id", "hash")
    assert(ids(PerceptualDedup.dupIds(probe, standing, 3)) == Set(10L, 12L))
    // the asymmetry spelled out: near-dup pair (9', 11') with 9' smaller
    // — only the LARGER member drops
    val pair = Seq((9L, 7777L), (11L, flip(7777L, 2))).toDF("id", "hash")
    assert(ids(PerceptualDedup.dupIds(pair,
      Seq.empty[(Long, Long)].toDF("id", "hash"), 3)) == Set(11L))
  }

  test("threshold boundary: hamming == maxDist is a dup, maxDist+1 is not") {
    val standing = Seq((1L, 0L)).toDF("id", "hash")
    val at3 = Seq((20L, flip(0L, 1, 2, 3))).toDF("id", "hash")
    val at4 = Seq((21L, flip(0L, 1, 2, 3, 4))).toDF("id", "hash")
    assert(ids(PerceptualDedup.dupIds(at3, standing, 3)) == Set(20L))
    assert(ids(PerceptualDedup.dupIds(at4, standing, 3)) == Set.empty[Long])
    // ...but 4 one-per-band flips never even reach the verify (no intact
    // band), exactly the pigeonhole argument's boundary
    val perBand = Seq((22L, flip(0L, 2, 19, 37, 55))).toDF("id", "hash")
    assert(ids(PerceptualDedup.dupIds(perBand, standing, 3)) == Set.empty[Long])
  }

  test("NULL hashes never match anything — either side") {
    val standing = Seq((1L, Some(0L)), (2L, None)).toDF("id", "hash")
    val probe = Seq((30L, None: Option[Long]), (31L, Some(0L)))
      .toDF("id", "hash")
    // 31 dups standing 0L; 30 (null) matches nothing, not even standing's
    // own null row
    assert(ids(PerceptualDedup.dupIds(probe, standing, 3)) == Set(31L))
  }

  test("the pigeonhole precondition is enforced") {
    val f = Seq((1L, 0L)).toDF("id", "hash")
    intercept[IllegalArgumentException] {
      PerceptualDedup.dupIds(f, f, 4)
    }
  }
}
