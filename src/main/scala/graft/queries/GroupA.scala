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

  /** a3: NULL sentinel round-trip (R7/R11) — nulls injected before the CSV
    * write must come back as SQL nulls, not the string "NULL".
    */
  def a3NullSentinel(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.csvRoundTrip(spark, sfDir, "orders", "a3",
      prepare = _.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null: String))
          .otherwise(col("o_orderpriority")).as("o_orderpriority")))
    Mapping("orders", "orders_out", Seq(
      ColumnMapping(Some("o_orderkey"), "o_orderkey", castTo = Some(LongType)),
      ColumnMapping(Some("o_orderpriority"), "o_orderpriority"),
    )).compile(orders).orderBy("o_orderkey")
  }

  /** a4: comma-decimal text → double (R8, Comma mode). */
  def a4DecimalSeparator(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.csvRoundTrip(spark, sfDir, "lineitem", "a4",
      prepare = _.select(
        col("l_orderkey"), col("l_linenumber"),
        regexp_replace(col("l_quantity").cast("string"), "\\.", ",").as("qty_text")))
    Mapping("lineitem", "lineitem_out", Seq(
      ColumnMapping(Some("l_orderkey"), "l_orderkey", castTo = Some(LongType)),
      ColumnMapping(Some("l_linenumber"), "l_linenumber", castTo = Some(LongType)),
      ColumnMapping(Some("qty_text"), "qty", castTo = Some(DoubleType),
        decimalMode = graft.sources.DecimalMode.Comma),
    )).compile(li).orderBy("l_orderkey", "l_linenumber")
  }

  /** a5: defective rows dropped (R9, DROPMALFORMED): bad lines appended to
    * the CSV after the round-trip write must vanish, leaving exactly the
    * original table.
    */
  def a5DefectiveRows(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, StandardOpenOption}
    val dialect = CsvDialect(malformed = graft.sources.MalformedMode.Drop)
    val file = Tables.csvRoundTripSingle(spark, sfDir, "nation", "a5", dialect)
    Files.write(file,
      "\"99\";\"BADLAND\";\"9\";\"EXTRA-FIELD\"\n\"98\";\"unclosed quote\n".getBytes("UTF-8"),
      StandardOpenOption.APPEND)
    Mapping("nation", "nation_out", Seq(
      ColumnMapping(Some("n_nationkey"), "n_nationkey", castTo = Some(LongType)),
      ColumnMapping(Some("n_name"), "n_name"),
      ColumnMapping(Some("n_regionkey"), "n_regionkey", castTo = Some(LongType)),
    )).compile(graft.sources.CsvCatalog.readTable(spark, file, dialect))
      .orderBy("n_nationkey")
  }

  /** a6: no-header file → positional `Column i` names, 1-based (R2).
    * Stays on the single-file path: the fixture pins the reference's
    * one-file-per-table naming alongside the headerless dialect.
    */
  def a6HeaderInference(spark: SparkSession, sfDir: String): DataFrame = {
    val dialect = CsvDialect(hasHeader = false)
    val file = Tables.csvRoundTripSingle(spark, sfDir, "region", "a6", dialect)
    val region = graft.sources.CsvCatalog.readTable(spark, file, dialect)
    Mapping("region", "region_out", Seq(
      ColumnMapping(Some("Column 1"), "r_regionkey", castTo = Some(LongType)),
      ColumnMapping(Some("Column 2"), "r_name"),
    )).compile(region).orderBy("r_regionkey")
  }

  /** a7: timestamps written as `dd-MM-yyyy HH:mm:ss:fff` (R13) — the raw
    * formatted string must match DuckDB's strftime of the original.
    */
  def a7DatetimeFormat(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.csvRoundTrip(spark, sfDir, "orders", "a7")
    Mapping("orders", "orders_out", Seq(
      ColumnMapping(Some("o_orderkey"), "o_orderkey", castTo = Some(LongType)),
      ColumnMapping(Some("o_orderdate"), "o_date_str"),
    )).compile(orders).orderBy("o_orderkey")
  }

  /** a8: constant/script columns injected at the destination (R12). */
  def a8ConstantColumn(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.csvRoundTrip(spark, sfDir, "region", "a8")
    Mapping("region", "region_out", Seq(
      ColumnMapping(Some("r_regionkey"), "r_regionkey", castTo = Some(LongType)),
      ColumnMapping(Some("r_name"), "r_name"),
      ColumnMapping(None, "src", constant = Some("csv-import")),
    )).compile(region).orderBy("r_regionkey")
  }

  /** a9: schema drift across ingest batches (R19's editable/overridable
    * schema, exercised the way a long-running feed actually hits it): an
    * old extract lacks a column a newer extract added. Each batch
    * round-trips our CSV sink+source with ITS OWN schema, maps/casts
    * independently, and the union is BY NAME with missing columns
    * null-filled (`unionByName(allowMissingColumns = true)`) — positional
    * UNION would silently misalign. `src_ver` tags each batch; the
    * old batch's absent `l_discount` surfaces as SQL NULL.
    */
  def a9SchemaDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val v1 = Tables.csvRoundTrip(spark, sfDir, "lineitem", "a9v1",
      prepare = _.filter(col("l_linenumber") === 1)
        .select("l_orderkey", "l_partkey", "l_quantity"))
    val v2 = Tables.csvRoundTrip(spark, sfDir, "lineitem", "a9v2",
      prepare = _.filter(col("l_linenumber") === 2)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_discount"))
    val m1 = Mapping("lineitem_v1", "lineitem_out", Seq(
      ColumnMapping(Some("l_orderkey"), "l_orderkey", castTo = Some(LongType)),
      ColumnMapping(Some("l_partkey"), "l_partkey", castTo = Some(LongType)),
      ColumnMapping(Some("l_quantity"), "l_quantity", castTo = Some(DoubleType)),
    )).compile(v1).withColumn("src_ver", lit(1L))
    val m2 = Mapping("lineitem_v2", "lineitem_out", Seq(
      ColumnMapping(Some("l_orderkey"), "l_orderkey", castTo = Some(LongType)),
      ColumnMapping(Some("l_partkey"), "l_partkey", castTo = Some(LongType)),
      ColumnMapping(Some("l_quantity"), "l_quantity", castTo = Some(DoubleType)),
      ColumnMapping(Some("l_discount"), "l_discount", castTo = Some(DoubleType)),
    )).compile(v2).withColumn("src_ver", lit(2L))
    m1.unionByName(m2, allowMissingColumns = true)
      .orderBy("l_orderkey", "src_ver")
  }

  /** a10: JSONL (newline-delimited JSON) round-trip — the training-data
    * interchange format next to the reference's CSV. Write: one JSON
    * object per line via `to_json(struct(...))` into a text sink
    * (partitioned directory — the 100 TB path, same discipline as
    * [[Tables.csvRoundTrip]]). Read: `spark.read.json` with schema
    * inference disabled in spirit — an explicit schema, because inference
    * is a second full scan and a schema drift hazard at scale. Doubles
    * survive exactly (shortest-round-trip rendering parses back to the
    * identical bits); the oracle reads the ORIGINAL parquet, so the whole
    * JSONL write+read cycle is what's verified.
    */
  /** a14: PARTITION-COLUMN round-trip — the hive-style layout the 100 TB
    * deployment actually writes (`partitionBy("lang")` → one directory
    * per lang) and the pruned read it exists for: the query writes
    * documents partitioned, reads back with a lang predicate, and the
    * oracle applies the same predicate to the ORIGINAL parquet — so the
    * hash compare verifies (a) values and the doc_id-typed columns
    * survive the partition-column round trip (partition values travel as
    * directory names, re-typed on read) and (b) the pruned subset is
    * exactly the predicate's. PartitionPruningSpec separately pins that
    * the physical scan reads ONLY the matching directories.
    */
  def a14PartitionedRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val dir = Tables.stagingDir(sfDir, "a14", kind = "parquet")
    src.write.mode("overwrite").partitionBy("lang").parquet(dir.toString)
    spark.read.parquet(dir.toString)
      .filter(col("lang").isin("en", "de"))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  def a10JsonlRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    // r22: fanned read (Tables.fanned) — the serial single-task encode of
    // the whole table otherwise dominates the round-trip write; ts is
    // unused here so the events() normalization is moot
    val src = Tables.fanned(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dir = Tables.stagingDir(sfDir, "a10", kind = "jsonl")
    src.select(to_json(struct(src.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", LongType),
      org.apache.spark.sql.types.StructField("user_id", LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", DoubleType)))
    spark.read.schema(schema).json(dir.toString)
      .orderBy("event_id")
  }

  /** a11: ORC round-trip — the second columnar interchange format next to
    * parquet (Spark's built-in `orc` source). Unlike a10's JSONL, ORC's
    * file metadata preserves exact types, so the read needs no explicit
    * schema — which is itself the behavior being verified. Partitioned
    * directory write (the 100 TB path, [[Tables.csvRoundTrip]]'s
    * discipline); the oracle reads the ORIGINAL parquet, so the whole ORC
    * write+read cycle is what the hash compare checks.
    */
  def a11OrcRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dir = Tables.stagingDir(sfDir, "a11", kind = "orc")
    src.write.mode("overwrite").orc(dir.toString)
    spark.read.orc(dir.toString).orderBy("event_id")
  }

  /** a12: XML round-trip — the reference family's own config/interchange
    * markup (its persistence layer IS XML — CSVProvider.cs:363-454) as a
    * DATA format, via Spark 4's built-in xml source. Write: one <event>
    * element per row under a root tag (partitioned directory — the 100 TB
    * path). Read: explicit schema + the same rowTag (inference is a
    * second full scan, a10's rationale). Doubles survive exactly: the
    * writer renders shortest-round-trip decimal strings and the reader
    * parses them back to identical bits (same contract a10 verifies for
    * JSONL). The oracle reads the ORIGINAL parquet, so the whole XML
    * write+read cycle is what the hash compare checks.
    */
  def a12XmlRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dir = Tables.stagingDir(sfDir, "a12", kind = "xml")
    src.write.mode("overwrite").format("xml")
      .option("rootTag", "events").option("rowTag", "event")
      .save(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", LongType),
      org.apache.spark.sql.types.StructField("user_id", LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", DoubleType)))
    spark.read.schema(schema).format("xml").option("rowTag", "event")
      .load(dir.toString)
      .orderBy("event_id")
  }

  /** a13: Avro round-trip — the row-oriented interchange format of
    * Kafka-adjacent pipelines, completing the format family next to
    * CSV/JSONL/ORC/XML/parquet. This Spark build bundles the avro source
    * classes in spark-sql itself but does NOT service-register the
    * `avro` shortname (probed: `.format("avro")` throws the
    * deploy-spark-avro AnalysisException), so the query addresses the
    * `FileFormat` by its full class name — same engine, explicit
    * resolution. Avro files
    * carry their writer schema, so like a11's ORC the read needs no
    * explicit schema — exact-type preservation across the cycle is the
    * behavior being verified (long→long, double→double bit-identical;
    * Avro doubles are raw IEEE-754 on the wire, no decimal rendering
    * involved). Partitioned directory write — the 100 TB path. The
    * oracle reads the ORIGINAL parquet, so the whole Avro write+read
    * cycle is what the hash compare checks.
    */
  def a13AvroRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dir = Tables.stagingDir(sfDir, "a13", kind = "avro")
    val fmt = "org.apache.spark.sql.avro.AvroFileFormat"
    src.write.mode("overwrite").format(fmt).save(dir.toString)
    spark.read.format(fmt).load(dir.toString).orderBy("event_id")
  }

  /** a15: gzip-compressed CSV round-trip — the wire shape crawl dumps
    * actually arrive in: the reference's CSV layer reads plain files;
    * at 100 TB nothing ships uncompressed. Spark's CSV source applies
    * the codec transparently per FILE, and gzip is NOT splittable — one
    * decompress stream per file — so the scale layout keeps many
    * moderate .csv.gz parts rather than few huge ones (the partitioned
    * write here produces exactly that shape; a splittable deployment
    * swaps zstd/bzip2 with the same plan). Doubles survive via
    * shortest-representation rendering (a4's PlainDouble discipline);
    * the oracle reads the ORIGINAL parquet, so compress + decompress +
    * parse all sit under the hash gate.
    */
  def a15CsvGzipRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    // r22: fanned read (Tables.fanned) — the serial single-task encode of
    // the whole table otherwise dominates the round-trip write; ts is
    // unused here so the events() normalization is moot
    val src = Tables.fanned(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dir = Tables.stagingDir(sfDir, "a15", kind = "csvgz")
    src.write.mode("overwrite")
      .option("compression", "gzip").option("header", "true")
      .csv(dir.toString)
    // the read schema IS the written frame's schema — one definition, so
    // a select-list change cannot silently drift the two apart
    spark.read.schema(src.schema).option("header", "true").csv(dir.toString)
      .orderBy("event_id")
  }

  /** a16: bzip2-compressed CSV round-trip — the SPLITTABLE twin a15's
    * scale row promises. bzip2 is the one Hadoop text codec whose block
    * structure lets a 10 GB .csv.bz2 split across tasks (gzip forces
    * one stream per file; Hadoop's zstd needs native libs and is not
    * splittable for text either — zstd's splittable home is the parquet
    * row-group path, where the columnar round-trips already live). So
    * at 100 TB the layout choice is: gzip → many moderate parts (a15),
    * bzip2 → parts may be huge because readers split INSIDE them (this
    * query). Same hash gate as a15: compress + decompress + parse vs
    * the original parquet.
    */
  def a16CsvBzip2RoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    // r22: fanned read (Tables.fanned) — the serial single-task encode of
    // the whole table otherwise dominates the round-trip write; ts is
    // unused here so the events() normalization is moot
    val src = Tables.fanned(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dir = Tables.stagingDir(sfDir, "a16", kind = "csvbz2")
    src.write.mode("overwrite")
      .option("compression", "bzip2").option("header", "true")
      .csv(dir.toString)
    spark.read.schema(src.schema).option("header", "true").csv(dir.toString)
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "a1_scan_project" -> (a1ScanProject _),
    "a16_csv_bzip2_roundtrip" -> (a16CsvBzip2RoundTrip _),
    "a13_avro_roundtrip" -> (a13AvroRoundTrip _),
    "a15_csv_gzip_roundtrip" -> (a15CsvGzipRoundTrip _),
    "a14_partitioned_roundtrip" -> (a14PartitionedRoundTrip _),
    "a9_schema_drift" -> (a9SchemaDrift _),
    "a10_jsonl_roundtrip" -> (a10JsonlRoundTrip _),
    "a11_orc_roundtrip" -> (a11OrcRoundTrip _),
    "a12_xml_roundtrip" -> (a12XmlRoundTrip _),
    "a2_filter_conditionals" -> (a2FilterConditionals _),
    "a3_null_sentinel" -> (a3NullSentinel _),
    "a4_decimal_separator" -> (a4DecimalSeparator _),
    "a5_defective_rows" -> (a5DefectiveRows _),
    "a6_header_inference" -> (a6HeaderInference _),
    "a7_datetime_format" -> (a7DatetimeFormat _),
    "a8_constant_column" -> (a8ConstantColumn _),
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
    "a3_null_sentinel" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "a4_decimal_separator" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity AS qty
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "a5_defective_rows" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "a6_header_inference" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "a7_datetime_format" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%d-%m-%Y %H:%M:%S:%g') AS o_date_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "a8_constant_column" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name,
        |  'csv-import' AS src
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "a10_jsonl_roundtrip" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a11_orc_roundtrip" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a12_xml_roundtrip" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a13_avro_roundtrip" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a15_csv_gzip_roundtrip" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a16_csv_bzip2_roundtrip" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a14_partitioned_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang IN ('en', 'de') ORDER BY doc_id""".stripMargin,
    "a9_schema_drift" ->
      """SELECT l_orderkey, l_partkey, l_quantity,
        |  CAST(NULL AS DOUBLE) AS l_discount, CAST(1 AS BIGINT) AS src_ver
        |FROM lineitem WHERE l_linenumber = 1
        |UNION ALL
        |SELECT l_orderkey, l_partkey, l_quantity,
        |  l_discount, CAST(2 AS BIGINT) AS src_ver
        |FROM lineitem WHERE l_linenumber = 2
        |ORDER BY l_orderkey, src_ver""".stripMargin,
  )
}
