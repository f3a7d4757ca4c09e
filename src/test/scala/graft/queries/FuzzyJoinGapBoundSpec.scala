package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins d57's FastSS gap-bound verification (GroupD.scala) against the
  * brute-force all-pairs levenshtein it replaced: for every corpus, the
  * (ida, idb, dist) set must equal the quadratic ground truth. The bound
  * `da + db − |gap multiset ∩|` is only an upper bound per instance; the
  * claim under test is that MIN over a pair's join instances is EXACTLY
  * the edit distance (the optimal script's witness instance achieves it),
  * and that the corpus-affix stripping preserves distances. The {a,b}
  * alphabet at short lengths is the adversarial regime: deletion variants
  * collide constantly, so same-string different-gap witnesses (the case
  * array_distinct would destroy) occur in bulk.
  */
class FuzzyJoinGapBoundSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def check(names: Seq[String]): Unit = {
    val dir = TestSpark.tempDir("fuzzy-gap")
    val cust = names.zipWithIndex
      .map { case (n, i) => (i.toLong + 1, n) }
      .toDF("c_custkey", "c_name")
    cust.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = GroupD.d57FuzzyJoin2(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = cust.toDF("ida", "name_a")
    val b = cust.toDF("idb", "name_b")
    val want = a.crossJoin(b).filter($"ida" < $"idb")
      .withColumn("dist", levenshtein($"name_a", $"name_b").cast("long"))
      .filter($"dist" <= 2)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"),
        r.getAs[Long]("dist"))).toSet
    assert(got === want)
  }

  test("random {a,b} corpus: dense variant collisions, exact distances") {
    val rnd = new scala.util.Random(13)
    val names = Seq.fill(60)(
      Seq.fill(rnd.nextInt(6))(if (rnd.nextBoolean()) "a" else "b").mkString)
    check(names)
  }

  test("templated corpus with shared affixes (the TPC-H shape)") {
    val rnd = new scala.util.Random(57)
    val names = (1 to 50).map(_ => f"Cust#${rnd.nextInt(300)}%05dZ")
    check(names)
  }

  test("duplicates, empty tails, and an all-identical corpus") {
    check(Seq("same", "same", "same"))          // plen eats everything
    check(Seq("x", "x", "xy", "", "y", "xyz"))  // empties + dist 0/1/2
  }

  test("wider alphabet with transposition-heavy pairs") {
    // transpositions cost 2 in Levenshtein; gaps align only via the
    // two-substitution witness — the subtlest branch of the bound
    check(Seq("abcdef", "abcfed", "bacdef", "abdcef", "fedcba",
      "abcde", "abcdeff", "aabcdef", "abcdf", "acbdef", "abcefd"))
  }
}
