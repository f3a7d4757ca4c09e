package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Salting correctness: a salted join/aggregation must be row-identical
  * to its plain formulation, and the salted shuffle must actually key on
  * (key, salt) so a hot key's rows spread over `salt` tasks.
  */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows on one hot key, the rest spread across 10 keys
  private def skewed() = (1 to 1000).map { i =>
    val k = if (i % 10 != 0) 1L else (i % 100 / 10).toLong + 1
    (k, i.toLong)
  }.toDF("k", "v")

  private def dim() = (1L to 11L).map(k => (k, s"name$k")).toDF("k", "name")

  test("salted join equals the plain join on skewed data") {
    val plain = skewed().join(dim(), Seq("k"))
      .orderBy("k", "v").collect().toSeq
    val salted = Salting.saltedJoin(skewed(), dim(), "k", salt = 8)
      .select("k", "v", "name").orderBy("k", "v").collect().toSeq
    assert(salted == plain)
  }

  test("salted left join keeps unmatched big-side rows") {
    val big = skewed().withColumn("k", col("k") + 100) // no dim matches
    val out = Salting.saltedJoin(big, dim(), "k", salt = 4, joinType = "left")
    assert(out.count() == 1000)
    assert(out.filter(col("name").isNotNull).count() == 0)
  }

  test("the salted shuffle partitions on (key, salt)") {
    val plan = Salting.saltedJoin(skewed(), dim(), "k", salt = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"), plan.linesIterator.take(12).mkString("\n"))
  }

  test("byte-identical duplicate rows spread across salts (r18)") {
    // a hot key made of IDENTICAL rows — a dedup-corpus shape — hashed
    // to ONE salt value before the ordinal was mixed in, degenerating
    // the salted join to the unsalted plan
    val dup = spark.range(1000).select(lit(1L).as("k"), lit(7L).as("v"))
    val plain = dup.join(dim(), Seq("k")).count()
    assert(Salting.saltedJoin(dup, dim(), "k", salt = 8).count() == plain)
    val nSalts = dup.withColumn("s",
        pmod(xxhash64(struct(col("k"), col("v"),
          monotonically_increasing_id())), lit(8)))
      .select("s").distinct().count()
    assert(nSalts > 1, "identical rows must not collapse to one salt")
  }

  test("a pre-existing salt column is rejected, not silently overwritten (r18)") {
    val bad = skewed().withColumn("__graft_salt", lit(0))
    val e = intercept[IllegalArgumentException] {
      Salting.saltedJoin(bad, dim(), "k", salt = 4)
    }
    assert(e.getMessage.contains("__graft_salt"))
  }

  test("outer join types that would duplicate small-side rows are rejected") {
    for (jt <- Seq("right", "full", "full_outer", "rightouter", "cross"))
      assertThrows[IllegalArgumentException] {
        Salting.saltedJoin(skewed(), dim(), "k", salt = 4, joinType = jt)
      }
    // the safe spellings still pass validation
    for (jt <- Seq("inner", "left", "left_outer", "left_semi", "leftanti"))
      Salting.saltedJoin(skewed(), dim(), "k", salt = 4, joinType = jt)
  }

  test("salted two-phase sum equals the plain aggregate") {
    val plain = skewed().groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = Salting.saltedSum(skewed(), "k", "v", salt = 8)
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }
}
