package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.sources.CsvDialect

/** Structured Streaming twin of the CSV source: same dialect mapping, file
  * source with schema probe, windowed aggregation with watermark.
  */
class CsvStreamSpec extends AnyFunSuite {

  test("streaming read ingests existing and late-arriving files") {
    val spark = TestSpark.spark
    val dir = tempDir("stream")
    csvFile(dir, "e1.csv", "ts;kind\n2024-01-01 10:05:00;a\n2024-01-01 10:20:00;b\n")
    val stream = CsvStream.readStream(spark, dir, CsvDialect(),
      maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("raw_rows").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("raw_rows").count() == 2)
      csvFile(dir, "e2.csv", "ts;kind\n2024-01-01 11:40:00;a\n")
      q.processAllAvailable()
      assert(spark.table("raw_rows").count() == 3)
    } finally q.stop()
  }

  test("streaming dedup keeps the first arrival per content fingerprint") {
    val spark = TestSpark.spark
    val dir = tempDir("sdedup")
    // doc B is a whitespace/punctuation variant of doc A -> same fingerprint
    csvFile(dir, "b1.csv",
      """ts;text
        |2024-01-01 10:00:00;hello dedup world
        |2024-01-01 10:01:00;Hello, dedup -- world!
        |2024-01-01 10:02:00;another document
        |""".stripMargin)
    val docs = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(to_timestamp(col("ts")).as("ts"), col("text"))
    val out = StreamingDedup.dedupByContent(docs, "text", "ts", watermark = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("deduped").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 2) // variant dropped
      // a later batch: one more dup of A (within watermark) + one new doc
      csvFile(dir, "b2.csv",
        "ts;text\n2024-01-01 10:10:00;hello DEDUP world\n2024-01-01 10:11:00;fresh text\n")
      q.processAllAvailable()
      val texts = spark.table("deduped").collect().map(_.getAs[String]("text")).toSet
      assert(spark.table("deduped").count() == 3)
      assert(texts.contains("hello dedup world") && texts.contains("fresh text"))
    } finally q.stop()
  }

  test("streaming dedup state survives a checkpoint stop/restart exactly-once (round-3 verdict #5)") {
    val spark = TestSpark.spark
    val dir = tempDir("ckptsrc")
    val out = tempDir("ckptout").resolve("data").toString
    val cp = tempDir("ckptdir").resolve("cp").toString
    def startQuery() = {
      val docs = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
        .select(to_timestamp(col("ts")).as("ts"), col("text"))
      StreamingDedup.dedupByContent(docs, "text", "ts", watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
    }
    // run 1: two unique docs + one near-dup variant -> 2 rows committed
    csvFile(dir, "b1.csv",
      """ts;text
        |2024-01-01 10:00:00;hello dedup world
        |2024-01-01 10:01:00;Hello, dedup -- world!
        |2024-01-01 10:02:00;another document
        |""".stripMargin)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 2)
    // stop mid-stream: new files arrive while NO query is running — one
    // duplicate of a run-1 doc (only droppable if the fingerprint STATE
    // was recovered from the checkpoint, not rebuilt empty) + one new doc
    csvFile(dir, "b2.csv",
      "ts;text\n2024-01-01 10:10:00;hello DEDUP world\n2024-01-01 10:11:00;fresh text\n")
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect().map(_.getAs[String]("text")).toSeq
    // exactly-once across the restart: run-1 rows not re-emitted, the
    // cross-restart duplicate dropped, the genuinely new doc appended
    assert(rows.size == 3, s"expected 3 rows after restart, got: $rows")
    assert(rows.sorted == Seq("another document", "fresh text", "hello dedup world"))
  }

  test("stream-stream interval join pairs views with later purchases per user") {
    val spark = TestSpark.spark
    val vDir = tempDir("sjv"); val pDir = tempDir("sjp")
    csvFile(vDir, "v1.csv",
      """ts;user;vid
        |2024-01-01 10:00:00;1;100
        |2024-01-01 10:20:00;1;101
        |2024-01-01 09:00:00;1;102
        |2024-01-01 10:05:00;2;103
        |""".stripMargin)
    csvFile(pDir, "p1.csv",
      "ts;user;pid\n2024-01-01 10:30:00;1;900\n2024-01-01 12:00:00;2;901\n")
    val views = CsvStream.readStream(spark, vDir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(to_timestamp(col("ts")).as("v_ts"),
        expr("cast(user as bigint)").as("user_id"),
        expr("cast(vid as bigint)").as("vid"))
    val purchases = CsvStream.readStream(spark, pDir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(to_timestamp(col("ts")).as("p_ts"),
        expr("cast(user as bigint)").as("user_id"),
        expr("cast(pid as bigint)").as("pid"))
    val joined = StreamJoin.intervalJoin(views, purchases, "user_id", "v_ts", "p_ts")
      .select(col("pid"), col("vid"))
    val q = joined.writeStream.format("memory")
      .queryName("sjoin").outputMode("append").start()
    try {
      q.processAllAvailable()
      val pairs = spark.table("sjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // purchase 900 (10:30, user 1) matches views at 10:00 + 10:20 but
      // NOT 09:00 (outside the hour); purchase 901 (12:00, user 2)
      // matches nothing (user 2's view is at 10:05, > 1 h before)
      assert(pairs == Set((900L, 100L), (900L, 101L)))
    } finally q.stop()
  }

  test("streaming CSV sink writes batch-identical dialect bytes, exactly-once") {
    val spark = TestSpark.spark
    val src = tempDir("sinksrc")
    val out = tempDir("sinkout").resolve("data")
    val cp = tempDir("sinkcp").resolve("cp")
    csvFile(src, "r1.csv", "id;amt\n1;150000000.0\n2;0.5\n")
    def start() = {
      val rows = CsvStream.readStream(spark, src, CsvDialect(), maxFilesPerTrigger = 1)
        .select(col("id"), col("amt").cast("double").as("amt"))
      CsvStream.writeStream(rows, out, cp, CsvDialect()).start()
    }
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // dialect bytes: quoted fields, ';' delimiter, POSITIONAL double (the
    // batch writer's formatter — no '1.5E8')
    val files = java.nio.file.Files.list(out).iterator()
    val partLines = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .filter(_.getFileName.toString.endsWith(".csv"))
      .flatMap(p => scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(p)).asScala)
      .toSeq.sorted
    assert(partLines.contains("\"1\";\"150000000.0\""), s"got: $partLines")
    assert(partLines.contains("\"2\";\"0.5\""))
    // restart from the checkpoint with one new file: old rows not re-emitted
    csvFile(src, "r2.csv", "id;amt\n3;2.5\n")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val back = graft.sources.CsvCatalog.readDir(spark, out, CsvDialect())
    assert(back.count() == 3)
    assert(back.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("1", "2", "3"))
  }

  test("windowed counts run in APPEND mode: watermark closes and emits buckets") {
    val spark = TestSpark.spark
    val dir = tempDir("stream")
    csvFile(dir, "e1.csv",
      "ts;kind\n2024-01-01 10:05:00;a\n2024-01-01 10:20:00;a\n2024-01-01 11:40:00;b\n")
    val events = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(to_timestamp(col("ts")).as("ts"), col("kind"))
    val agg = CsvStream.windowedCounts(events, "ts", "kind")
    // append mode only analyzes when the aggregation keeps the event-time
    // window struct in its grouping keys — this start() IS the regression
    // assertion for the watermark binding.
    val q = agg.writeStream.format("memory")
      .queryName("windowed_append").outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark (2h behind max event time 11:40) hasn't passed any
      // window end yet -> append emits nothing, state stays open
      assert(spark.table("windowed_append").count() == 0)
      // 14:00 advances the watermark to 12:00 (applied in the NEXT batch);
      // 15:00 triggers that next batch, which flushes windows ending <= 12:00
      csvFile(dir, "e2.csv", "ts;kind\n2024-01-01 14:00:00;c\n")
      q.processAllAvailable()
      csvFile(dir, "e3.csv", "ts;kind\n2024-01-01 15:00:00;c\n")
      q.processAllAvailable()
      val rows = spark.table("windowed_append")
        .orderBy("bucket", "kind")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(rows.toSeq == Seq(
        ("2024-01-01 10:00:00.0", "a", 2L),
        ("2024-01-01 11:00:00.0", "b", 1L)))
    } finally q.stop()
  }

  test("PII redaction (c6's projection) runs unchanged on a stream, equal to batch") {
    val spark = TestSpark.spark
    import spark.implicits._
    val data = Seq(
      (1L, "mail me at bob@example.com please"),
      (2L, "plain text with no pii at all"),
      (3L, "card 1234567890 and backup 99887766"))
    val dir = tempDir("spii")
    csvFile(dir, "d1.csv", "doc_id;text\n" +
      data.map { case (id, t) => s"$id;$t" }.mkString("", "\n", "\n"))
    val docs = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val out = graft.queries.GroupC.piiRedact(docs)
    assert(out.isStreaming, "stateless projection must stay streaming-planable")
    val q = out.writeStream.format("memory")
      .queryName("pii_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pii_stream")
      val batch = graft.queries.GroupC.piiRedact(data.toDF("doc_id", "text"))
      assert(streamed.count() == 3)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream and batch must produce identical redactions")
      val byId = streamed.collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_email"), r.getAs[Long]("n_longnum"))).toMap
      assert(byId(1L) == (1L, 0L) && byId(2L) == (0L, 0L) && byId(3L) == (0L, 2L))
    } finally q.stop()
  }

  test("overlapping chunker (d28's projection) runs unchanged on a stream, equal to batch") {
    val spark = TestSpark.spark
    import spark.implicits._
    // doc 2 is long enough (70 tokens > the 64-token window) to straddle
    // a stride boundary and produce two overlapping chunks
    val data = Seq(
      (1L, "short doc with a few tokens"),
      (2L, (1 to 70).map(i => s"w$i").mkString(" ")))
    val dir = tempDir("schunk")
    csvFile(dir, "c1.csv", "doc_id;text\n" +
      data.map { case (id, t) => s"$id;$t" }.mkString("", "\n", "\n"))
    val docs = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val out = graft.queries.GroupD.chunkOverlap(docs)
    assert(out.isStreaming, "stateless chunking must stay streaming-planable")
    val q = out.writeStream.format("memory")
      .queryName("chunk_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("chunk_stream")
      val batch = graft.queries.GroupD.chunkOverlap(data.toDF("doc_id", "text"))
      assert(streamed.count() == 3, "1 chunk for doc 1 + 2 overlapping for doc 2")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream and batch must produce identical chunks")
    } finally q.stop()
  }

  test("explicitSchema reopens a cleaned-out source dir without a probe file (r18)") {
    val spark = TestSpark.spark
    val dir = tempDir("csv-reopen")
    csvFile(dir, "b1.csv", "a;b\n1;2\n")
    val schema = CsvStream.readStream(spark, dir, CsvDialect()).schema
    // a cleanSource=delete stream that ingested everything has an empty
    // dir on restart: pre-fix the schema probe threw and the checkpointed
    // stream could never resume; with explicitSchema it reopens
    val empty = tempDir("csv-reopen-empty")
    val reopened = CsvStream.readStream(spark, empty, CsvDialect(),
      explicitSchema = Some(schema))
    assert(reopened.isStreaming && reopened.schema == schema)
    intercept[IllegalArgumentException] {
      CsvStream.readStream(spark, empty, CsvDialect())
    }
  }
}
