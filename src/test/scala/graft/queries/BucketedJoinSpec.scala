package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Co-located (bucketed) joins — the pre-shuffle answer for joins that
  * repeat on the same key at 100 TB: both fact tables are written
  * `bucketBy(N, key).sortBy(key)`, so an equi-join or aggregation on that
  * key reads bucket i against bucket i directly and the plan contains NO
  * Exchange on either side. This spec pins that plan property (and the
  * counter-example: the plain-parquet join DOES shuffle), since there is
  * no bucketed table in the driver-generated testdata to declare a query
  * against.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("equal-bucket tables join with zero Exchange; plain parquet shuffles") {
    val customer = Tables(spark, sf, "customer")
    val orders = Tables(spark, sf, "orders")
    customer.write.mode("overwrite").format("parquet")
      .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("cust_b")
    orders.write.mode("overwrite").format("parquet")
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("ord_b")

    // merge hint: at this toy SF the dim would auto-broadcast, which hides
    // the property under test — at real scale both sides are facts and
    // SortMergeJoin is what Catalyst picks anyway
    val colocated = spark.table("ord_b").hint("merge")
      .join(spark.table("cust_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    val planB = colocated.queryExecution.executedPlan.toString
    // join side reads are bucket-aligned: no shuffle before the join; the
    // only exchange is the final small aggregation on c_mktsegment
    val joinSection = planB.substring(0, planB.length)
    assert(joinSection.contains("SortMergeJoin"))
    assert(planB.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      s"bucketed join still shuffles:\n$planB")

    // counter-example: same join over plain parquet shuffles both sides
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
    val planP = plain.queryExecution.executedPlan.toString
    assert(planP.contains("Exchange") || planP.contains("BroadcastExchange"))

    // and the result is identical either way
    val a = colocated.orderBy("c_mktsegment").collect().toSeq
    val b = plain.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(a == b)
  }
}
