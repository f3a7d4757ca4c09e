package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

import graft.TestSpark

/** Mapping compiler (R5/R6/R12/R13): projection + rename, conditional
  * predicates, constant columns, inactive mappings, and the
  * parse-with-fallback timestamp conversion.
  */
class MappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("1", "BUILDING", "100.5", "2024-01-02 03:04:05"),
    ("2", "AUTO", "250.0", "not-a-date"),
    ("3", "BUILDING-EXT", "999.9", "2024-06-30 12:00:00"),
  ).toDF("id", "seg", "bal", "ts")

  test("projection renames and preserves mapping order (R5)") {
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("seg"), "segment"),
      ColumnMapping(Some("id"), "key", castTo = Some(LongType)),
    )).compile(df)
    assert(out.columns.toSeq == Seq("segment", "key"))
    assert(out.schema("key").dataType == LongType)
  }

  test("inactive column mappings are skipped; empty projection rejected") {
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("id"), "id"),
      ColumnMapping(Some("seg"), "seg", active = false),
    )).compile(df)
    assert(out.columns.toSeq == Seq("id"))
    assertThrows[IllegalArgumentException] {
      Mapping("t", "o", Seq(
        ColumnMapping(Some("id"), "id", active = false))).compile(df)
    }
  }

  test("conditionals compile to a conjunctive filter (R6)") {
    val out = Mapping("t", "o", Seq(ColumnMapping(Some("id"), "id")),
      conditionals = Seq(
        Conditional("seg", CondOp.StartsWith, "BUILDING"),
        Conditional("bal", CondOp.GreaterThan, "150"),
      )).compile(df).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("3"))
  }

  test("every conditional operator behaves") {
    def ids(c: Conditional): Set[String] =
      Mapping("t", "o", Seq(ColumnMapping(Some("id"), "id")),
        conditionals = Seq(c)).compile(df).collect().map(_.getString(0)).toSet
    assert(ids(Conditional("seg", CondOp.EqualTo, "AUTO")) == Set("2"))
    assert(ids(Conditional("seg", CondOp.NotEqualTo, "AUTO")) == Set("1", "3"))
    assert(ids(Conditional("seg", CondOp.Contains, "EXT")) == Set("3"))
    assert(ids(Conditional("seg", CondOp.NotContains, "EXT")) == Set("1", "2"))
    assert(ids(Conditional("seg", CondOp.EndsWith, "ING")) == Set("1"))
    assert(ids(Conditional("bal", CondOp.LessThan, "200")) == Set("1"))
    assert(ids(Conditional("id", CondOp.In, Seq("1", "3"))) == Set("1", "3"))
  }

  test("constant 'script' columns inject fixed values (R12)") {
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("id"), "id"),
      ColumnMapping(None, "src", constant = Some("import-x")),
    )).compile(df).collect()
    assert(out.forall(_.getString(1) == "import-x"))
  }

  test("timestamp cast parses valid values and falls back to the sentinel (R13)") {
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("id"), "id"),
      ColumnMapping(Some("ts"), "ts", castTo = Some(TimestampType)),
    )).compile(df).orderBy("id").collect()
    assert(out(0).getTimestamp(1).toString.startsWith("2024-01-02 03:04:05"))
    // unparseable -> 0001-01-01 00:00:00 (DateTime.MinValue semantics,
    // reference src/CSVDestinationWriter.cs:126)
    assert(out(1).getTimestamp(1).toString.startsWith("0001-01-01 00:00:00"))
    assert(out(2).getTimestamp(1).toString.startsWith("2024-06-30 12:00:00"))
  }

  test("explicit timestamp format is honored before falling back") {
    val d2 = Seq(("05/03/2024 07:08", "x")).toDF("ts", "x")
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("ts"), "ts", castTo = Some(TimestampType),
        timestampFormat = Some("dd/MM/yyyy HH:mm")),
    )).compile(d2).collect()
    assert(out(0).getTimestamp(0).toString.startsWith("2024-03-05 07:08:00"))
  }

  test("decimal Detect normalization composes with the double cast (R8)") {
    val d2 = Seq(("1,25", "3.5")).toDF("a", "b")
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("a"), "a", castTo = Some(DoubleType),
        decimalMode = graft.sources.DecimalMode.Detect),
      ColumnMapping(Some("b"), "b", castTo = Some(DoubleType),
        decimalMode = graft.sources.DecimalMode.Detect),
    )).compile(d2).collect()
    assert(out(0).getDouble(0) == 1.25 && out(0).getDouble(1) == 3.5)
  }

  test("decimal-separator normalization covers DecimalType destinations (r18)") {
    // the write side formats decimals under the culture rule, so the
    // read side must normalize commas for Decimal casts too — this
    // previously cast the raw comma string and produced NULL
    val d = Seq(("3,14", "2,50")).toDF("a", "b")
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("a"), "a",
        castTo = Some(org.apache.spark.sql.types.DecimalType(10, 2)),
        decimalMode = graft.sources.DecimalMode.Comma),
      ColumnMapping(Some("b"), "b",
        castTo = Some(org.apache.spark.sql.types.DecimalType(10, 2)),
        decimalMode = graft.sources.DecimalMode.Detect),
    )).compile(d).collect()
    assert(out(0).getDecimal(0) == new java.math.BigDecimal("3.14"))
    assert(out(0).getDecimal(1) == new java.math.BigDecimal("2.50"))
  }

  test("a conditional with no values is a validation error, not a bare head crash (r18)") {
    val e = intercept[IllegalArgumentException] {
      Conditional("x", CondOp.EqualTo, Seq.empty).toColumn
    }
    assert(e.getMessage.contains("'x'"), e.getMessage)
  }

  test("per-mapping value transform mirrors ConvertInputValueToOutputValue") {
    val df = Seq(("ann", "1"), ("bo", "2")).toDF("name", "id")
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("name"), "shout",
        transform = Some(c => org.apache.spark.sql.functions.upper(c))),
      ColumnMapping(Some("id"), "id"),
    )).compile(df).orderBy("id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("ANN", "BO"))
  }

  test("value transform runs AFTER the destination cast (reference call order)") {
    // reference applies ConvertInputValueToOutputValue to the CONVERTED
    // value (src/CSVDestinationWriter.cs:120) — doubling "1,5" must see the
    // comma-normalized double 1.5, not the raw text
    val df = Seq(("1,5", "a")).toDF("x", "tag")
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("x"), "doubled", castTo = Some(DoubleType),
        decimalMode = graft.sources.DecimalMode.Comma,
        transform = Some(c => c * 2)),
    )).compile(df).collect()
    assert(out(0).getDouble(0) == 3.0)
  }

  test("row hook mirrors the ProcessInputRow seam: applied after projection") {
    import org.apache.spark.sql.functions._
    val df = Seq(("1", "ann"), ("2", "bo"), ("3", "cy")).toDF("id", "name")
    val out = Mapping("t", "o", Seq(
      ColumnMapping(Some("id"), "key"),
      ColumnMapping(Some("name"), "name"),
    ), rowHook = Some(d => d.filter(col("key") =!= "2")
        .withColumn("hooked", lit(true)))).compile(df).orderBy("key").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("1", "3"))
    assert(out.forall(_.getBoolean(2)))
  }
}
