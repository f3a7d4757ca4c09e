package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters

import graft.TestSpark

/** Property: the sharded rank / prefix sum equals the single-window
  * formulation on ANY input — random key skew (incl. one dominant key,
  * the case the operator exists for), arbitrary weights, ids in any
  * order. The reference is a plain per-key window over (md5(id), id).
  */
object ShardedOrderProps extends Properties("shardedOrder") {

  // Spark round trip per case: keep the case count moderate
  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(30)

  private val rows: Gen[List[(Long, String, Long)]] =
    Gen.chooseNum(1, 60).flatMap { n =>
      Gen.listOfN(n, for {
        // null keys included (r18 review: the offset join silently
        // dropped NULL-keyed rows until it went null-safe)
        k <- Gen.frequency((6, Gen.const("hot")), (1, Gen.oneOf("a", "b")),
          (1, Gen.const(null: String)))
        w <- Gen.chooseNum(0L, 9L)
      } yield (k, w))
    }.map(_.zipWithIndex.map { case ((k, w), i) => (i.toLong, k, w) })

  property("rank, n, and prefix equal the single-window answer for any rows") =
    Prop.forAll(rows) { data =>
      val spark = TestSpark.spark
      import spark.implicits._
      val df = data.toDF("id", "k", "w")
      val got = ShardedOrder.rankAndPrefixSum(df, Seq("k"),
          md5(col("id").cast("string")), col("id"),
          weight = Some(col("w")))
        .select("id", "rn", "n", "prefix").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      def md5Hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .map("%02x".format(_)).mkString
      val want = data.groupBy(_._2).flatMap { case (_, rs) =>
        val ordered = rs.sortBy { case (id, _, _) => (md5Hex(id.toString), id) }
        val n = ordered.length.toLong
        ordered.zipWithIndex.map { case ((id, _, _), i) =>
          val prefix = ordered.take(i).map(_._3).sum
          id -> ((i + 1).toLong, n, prefix)
        }
      }
      got == want
    }
}
