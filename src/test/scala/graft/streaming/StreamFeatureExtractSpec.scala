package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.multimodal.Multimodal
import graft.sources.CsvDialect

/** The streaming feature-extract twin ([[StreamFeatureExtract]]): per
  * micro-batch parity with the batch kernel, the direct streaming
  * projection, and the composed live path gate → features.
  */
class StreamFeatureExtractSpec extends AnyFunSuite {

  import StreamTestMedia.{bmpFor, hex}

  private val P1 = 0x0123456789abcdefL
  private val P2 = 0x0f1e2d3c4b5a6978L

  test("per-micro-batch features equal the batch kernel's (parity pin)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val junk = Array[Byte](9, 9, 9)
    val rows = Seq(1L -> bmpFor(P1), 2L -> bmpFor(P2), 3L -> junk)
    val dir = tempDir("sfeat_in")
    // two micro-batches: (1,2) then (3)
    csvFile(dir, "b1.csv", "asset_id;content_hex\n" +
      rows.take(2).map { case (i, bs) => s"$i;${hex(bs)}" }.mkString("\n") + "\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("asset_id").cast("long").as("asset_id"),
        unhex(col("content_hex")).as("content"))
    val got = scala.collection.mutable.Map[Long, Seq[Float]]()
    val q = StreamFeatureExtract.start(stream, "sfeat", (df, _) => {
      df.select("asset_id", "features").collect()
        .foreach(r => got(r.getLong(0)) = r.getSeq[Float](1))
      ()
    })
    try {
      q.processAllAvailable()
      csvFile(dir, "b2.csv",
        s"asset_id;content_hex\n3;${hex(junk)}\n")
      q.processAllAvailable()
    } finally q.stop()
    val want = Multimodal
      .extractFeatures(rows.toDF("asset_id", "content"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.toMap == want, "stream and batch kernels must agree per asset")
    // the real decode fed 1/2 (distinct non-stub vectors), junk fell back
    assert(got(1L) != got(2L))
  }

  test("transform is an append-safe STREAMING projection (composes downstream)") {
    val spark = TestSpark.spark
    val dir = tempDir("sfeat_tr")
    csvFile(dir, "b1.csv",
      s"asset_id;content_hex\n7;${hex(bmpFor(P1))}\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("asset_id").cast("long").as("asset_id"),
        unhex(col("content_hex")).as("content"))
    val out = StreamFeatureExtract.transform(stream, dim = 8)
    assert(out.isStreaming, "the projection must stay a streaming frame")
    val q = out.writeStream.format("memory").queryName("sfeat_mem")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("sfeat_mem").collect()
    assert(rows.length == 1 && rows(0).getSeq[Float](2).size == 8)
  }

  test("the composed live path: dedup gate survivors -> features (one decode contract)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 10 near-dups the base (drops at the gate), 11 is new (passes and
    // gets features), 12 junk (passes the gate, stub features)
    val base = Seq((1L, bmpFor(P1))).toDF("asset_id", "content")
    val dir = tempDir("sfeat_gate")
    val flip3 = P1 ^ (1L << 3)
    csvFile(dir, "b1.csv", "asset_id;content_hex\n" +
      s"10;${hex(bmpFor(flip3))}\n" +
      s"11;${hex(bmpFor(P2))}\n" +
      s"12;${hex(Array[Byte](1, 2))}\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
        maxFilesPerTrigger = 1)
      .select(col("asset_id").cast("long").as("asset_id"),
        unhex(col("content_hex")).as("content"))
    val featIds = scala.collection.mutable.Set[Long]()
    val q = StreamImageDedup.start(stream, base, "sfeat_gate", (surv, _) => {
      // the twin composes INSIDE the gate's sink: survivors only are
      // decoded for features — dropped dups never pay the second decode
      Multimodal.extractFeatures(surv).select("asset_id").collect()
        .foreach(r => featIds += r.getLong(0))
      ()
    })
    try q.processAllAvailable() finally q.stop()
    assert(featIds.toSet == Set(11L, 12L),
      "features must be extracted for gate survivors exactly")
  }
}
