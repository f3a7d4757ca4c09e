package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.TestSpark.tempDir

/** Partition pruning — the other half of the layout story next to
  * BucketedJoinSpec: data written `partitionBy(day)` must let a day
  * predicate prune at the FILE level (PartitionFilters on the scan), so a
  * one-day query over a 100 TB, 3-year events lake touches ~1/1000th of
  * the files instead of filtering rows after reading them all.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("a day predicate on day-partitioned events prunes at the scan (PartitionFilters)") {
    val dir = tempDir("part").resolve("events_by_day")
    val events = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("day").parquet(dir.toString)

    val firstDay = spark.read.parquet(dir.toString)
      .select(min(col("day"))).collect().head.getDate(0)
    val oneDay = spark.read.parquet(dir.toString)
      .filter(col("day") === lit(firstDay))
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.linesIterator.take(10).mkString("\n"))
    assert(!plan.contains("PartitionFilters: []"),
      "day predicate did not reach the partition level")
    // pruned read returns exactly that day's rows
    val expected = events.filter(col("day") === lit(firstDay)).count()
    assert(oneDay.count() == expected)
    assert(expected > 0)
  }
}
