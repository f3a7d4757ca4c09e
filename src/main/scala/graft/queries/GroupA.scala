package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.operators.{ColumnMapping, CondOp, Conditional, Mapping}
import graft.sources.CsvDialect

/** Group A — reference-fidelity CSV semantics (SURVEY.md §2.3 Group A).
  * Every query round-trips a parquet table through our CSV sink + source
  * (the real semantics layer), then must hash-match a DuckDB oracle run on
  * the ORIGINAL parquet — so the round trip itself is what's verified.
  */
object GroupA {
  type Q = (SparkSession, String) => DataFrame

  /** a1: scan + column-prune + rename (R1, R5). */
  def a1ScanProject(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = Tables.csvRoundTrip(spark, sfDir, "nation", "a1")
    Mapping("nation", "nation_out", Seq(
      ColumnMapping(Some("n_nationkey"), "nkey", castTo = Some(LongType)),
      ColumnMapping(Some("n_name"), "name"),
    )).compile(nation).orderBy("nkey")
  }

  /** a2: row filter via conditionals (R6). */
  def a2FilterConditionals(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.csvRoundTrip(spark, sfDir, "customer", "a2")
    Mapping("customer", "customer_out", Seq(
      ColumnMapping(Some("c_custkey"), "c_custkey", castTo = Some(LongType)),
      ColumnMapping(Some("c_mktsegment"), "c_mktsegment"),
      ColumnMapping(Some("c_acctbal"), "c_acctbal", castTo = Some(DoubleType)),
    ), conditionals = Seq(
      Conditional("c_mktsegment", CondOp.EqualTo, "BUILDING"),
      Conditional("c_acctbal", CondOp.GreaterThan, "1000"),
    )).compile(customer).orderBy("c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "a1_scan_project" -> (a1ScanProject _),
    "a2_filter_conditionals" -> (a2FilterConditionals _),
  )

  val oracleSql: Map[String, String] = Map(
    "a1_scan_project" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name AS name
        |FROM nation ORDER BY nkey""".stripMargin,
    "a2_filter_conditionals" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000
        |ORDER BY c_custkey""".stripMargin,
  )
}
