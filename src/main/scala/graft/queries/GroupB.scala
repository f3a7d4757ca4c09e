package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group B — relational core (SURVEY.md §2.3 Group B): the general query
  * surface, expressed declaratively so Catalyst owns pushdown, join
  * selection, partial aggregation, and AQE.
  */
object GroupB {
  type Q = (SparkSession, String) => DataFrame

  /** b5: hash aggregate, TPC-H Q1 shape on lineitem. Partial (map-side)
    * aggregation + single shuffle on the group keys; at 100 TB the group
    * cardinality is tiny (RF×LS ≤ 9) so the shuffle is negligible.
    */
  def b5HashAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  val queries: Map[String, Q] = Map(
    "b5_hash_agg" -> (b5HashAgg _),
  )

  val oracleSql: Map[String, String] = Map(
    "b5_hash_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 2) AS avg_qty,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
