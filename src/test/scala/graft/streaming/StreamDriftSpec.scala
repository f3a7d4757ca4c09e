package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.queries.Tables
import graft.sources.CsvDialect

/** Streaming drift monitor: the per-row assignment tag is bit-identical
  * to the batch argmin, stays a stateless projection, and the windowed
  * counts match the batch group-by over the same rows.
  */
class StreamDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("assignTag matches batch assignWith bit-for-bit and plans map-only") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val model = graft.operators.KMeans.fitMemoized(s"sdrift|$sf", e, k = 8, iters = 3)
    val batch = graft.operators.KMeans.assignWith(e, model.centroids)
      .select("vec_id", "cluster", "d2").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val tagged = StreamDrift.assignTag(e, model.centroids)
    val viaTag = tagged.select("vec_id", "cluster", "d2").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(viaTag == batch, "stream tag must equal the batch argmin bit-for-bit")
    val plan = tagged.queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate") && !plan.contains("Join"),
      "assignTag must stay a pure projection (no shuffle, no stream state)")
  }

  test("windowed drift counts over micro-batches equal the batch group-by") {
    import spark.implicits._
    val rnd = new scala.util.Random(8282)
    val dim = 8
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val bases = Array.fill(3)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val train = (0 until 3).flatMap { c =>
      (0 until 20).map(m => (c * 20L + m,
        unit(bases(c).map(_ + 0.02 * rnd.nextGaussian())).map(_.toFloat)))
    }
    val ref = spark.createDataFrame(train).toDF("vec_id", "embedding")
    val model = graft.operators.KMeans.fit(ref, k = 3, iters = 5)
    val oodBar = 0.01 // tight clusters: planted far vectors must exceed this

    // stream: two micro-batches inside one 10-min window; batch 2 plants
    // two antipodal (OOD) vectors
    def row(id: Long, ts: String, v: Array[Double]) =
      s"$id;$ts;${v.mkString(",")}"
    val dir = tempDir("sdrift")
    csvFile(dir, "b1.csv", "vec_id;ts;emb\n" + (0 until 10).map(i =>
      row(100L + i, "2024-01-01 10:01:00",
        unit(bases(i % 3).map(_ + 0.02 * rnd.nextGaussian())))).mkString("\n") + "\n")
    val raw = CsvStream.readStream(spark, dir, CsvDialect(), maxFilesPerTrigger = 1)
      .select(col("vec_id").cast("long").as("vec_id"),
        to_timestamp(col("ts")).as("ts"),
        expr("transform(split(emb, ','), x -> cast(x as double))").as("embedding"))
    val tagged = StreamDrift.assignTag(raw, model.centroids)
    val counts = StreamDrift.driftCounts(tagged, "ts", oodBar,
      windowDuration = "10 minutes", watermarkDelay = "0 seconds")
    val q = counts.writeStream.format("memory").queryName("sdrift_counts")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      csvFile(dir, "b2.csv", "vec_id;ts;emb\n" + ((0 until 6).map(i =>
        row(200L + i, "2024-01-01 10:05:00",
          unit(bases(0).map(_ + 0.02 * rnd.nextGaussian())))) ++
        Seq(row(300L, "2024-01-01 10:06:00", unit(bases(1).map(-_))),
          row(301L, "2024-01-01 10:07:00", unit(bases(2).map(-_)))))
        .mkString("\n") + "\n")
      q.processAllAvailable()
    } finally q.stop()

    // latest update per (window, cluster) is the final count
    val got = spark.table("sdrift_counts")
      .groupBy("cluster").agg(max("n").as("n"), max("n_ood").as("n_ood"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.values.map(_._1).sum == 18L, s"18 streamed vectors: $got")
    assert(got.values.map(_._2).sum == 2L,
      s"exactly the two antipodal plants are OOD at the tight bar: $got")
  }
}
