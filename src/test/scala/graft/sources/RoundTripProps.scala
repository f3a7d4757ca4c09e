package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.TestSpark.tempDir

/** Property: CSV write → read is the identity on row data, modulo the
  * documented deviations (SURVEY.md §2.4) which the generators avoid:
  * fields are generated without edge whitespace (data reads trim), without
  * embedded newlines (writes strip them), and never equal to the NULL
  * sentinel text (which would round-trip to SQL null by design).
  */
object RoundTripProps extends Properties("csvRoundTrip") {

  private val field: Gen[String] = {
    val inner = Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf(';', '"', ',', '.', '-', '_', '/', '\'', 'é', 'ø', 'д'),
      Gen.const(' '))
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, inner))
      .map(_.trim)
      .suchThat(s => s.nonEmpty && s != "NULL")
  }

  private val row: Gen[(String, Option[String], Option[String])] =
    for {
      a <- field
      b <- Gen.option(field)
      c <- Gen.option(field)
    } yield (a, b, c)

  property("write then read returns the same rows") =
    Prop.forAll(Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, row))) { rows =>
      val spark = TestSpark.spark
      import spark.implicits._
      val dir = tempDir("prop")
      val df = rows.zipWithIndex
        .map { case ((a, b, c), i) => (i.toString, a, b, c) }
        .toDF("id", "a", "b", "c")
      val f = CsvWrite.writeSingleFile(df, dir.toString, "t")
      val back = CsvCatalog.readTable(spark, f, CsvDialect())
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3))))
        .sortBy(_._1)
      val want = rows.zipWithIndex
        .map { case ((a, b, c), i) => (i.toString, a, b, c) }
        .sortBy(_._1).toArray
      Prop(back.sameElements(want)) :| s"got ${back.toSeq} want ${want.toSeq}"
    }
}
