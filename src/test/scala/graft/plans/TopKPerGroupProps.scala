package graft.plans

import org.apache.spark.sql.graft.TopKPerGroup
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters

import graft.TestSpark

/** Property: the custom heap operator equals the definitional top-k on
  * ANY input — random groups, heavy value ties (the order tie-breaks on
  * the unique id), k spanning sub- and super-group sizes, rows arriving
  * in any order. The reference is plain Scala sort-and-take per group.
  */
object TopKPerGroupProps extends Properties("topKPerGroup") {

  // Spark round trip per case: keep the case count moderate
  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(40)

  private val rows: Gen[List[(Long, Long, Long)]] =
    Gen.chooseNum(1, 50).flatMap { n =>
      Gen.listOfN(n, for {
        g <- Gen.chooseNum(0L, 4L) // few groups -> guaranteed collisions
        v <- Gen.chooseNum(0L, 6L) // tiny domain -> heavy ties
      } yield (g, v))
    }.map(_.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) })

  property("equals sort-and-take per group for any rows and k") =
    Prop.forAll(rows, Gen.chooseNum(1, 7)) { (data, k) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val got = TopKPerGroup(
        data.toDF("g", "id", "v"), Seq("g"),
        Seq(("v", true), ("id", false)), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = data.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy { case (_, id, v) => (-v, id) }.take(k)
      }.toSet
      got == want
    }
}
