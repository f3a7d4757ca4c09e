package graft.queries

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-3 verdict #7: SQL-based queries used session-global temp view
  * names (`createOrReplaceTempView("orders")`), so two concurrent callers
  * on one session could race — one caller's view replaced mid-analysis by
  * the other's. GroupB.sqlScoped binds per-call-unique names and drops
  * them after eager analysis; these tests pin the behavior.
  */
class ScopedViewsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("two concurrent b14 invocations on one session don't interfere") {
    val expected = GroupB.b14Subquery(spark, sf).count()
    val runs = Future.sequence(Seq.fill(4)(Future {
      GroupB.b14Subquery(spark, sf).count()
    }))
    assert(Await.result(runs, 120.seconds).forall(_ === expected))
  }

  test("scoped views are dropped after the query is built") {
    val before = spark.catalog.listTables().count()
    val df = GroupB.b15GroupingSets(spark, sf)
    assert(spark.catalog.listTables().count() === before)
    // the returned plan still executes after its views are gone
    assert(df.count() > 0)
  }

  test("no query leaves canonical-name temp views behind") {
    for (name <- Seq("b14_subquery", "b15_grouping_sets", "b20_filtered_agg")) {
      GroupB.queries(name)(spark, sf).count()
      for (t <- Seq("customer", "orders", "lineitem"))
        assert(!spark.catalog.tableExists(t), s"$name leaked view $t")
    }
  }
}
