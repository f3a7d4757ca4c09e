package graft.operators

import org.apache.spark.sql.SparkSession

/** Durable persistence for the engine's learned artifacts — the serving-path
  * analog of the reference provider's config round-trip
  * (`/root/reference/src/CSVProvider.cs:363-454` persists its mapping setup
  * as XML and reloads it on the next run; an analytics engine's "setup" is
  * its trained models). Every artifact here is DRIVER-SIZED by the existing
  * model contracts (k×dim centroids, M·K·sub codebooks, one tuned config
  * row, a few-MB sketch), so each saves as a tiny parquet frame — readable
  * by any engine, exact for doubles (IEEE bits round-trip), and versionable
  * alongside the corpus it was trained on.
  *
  * The load path performs NO training action: reads are model-sized parquet
  * scans, and [[KMeans.install]] / [[PqIndex.install]] /
  * [[AnnTuning.installLsh]] seed the per-JVM memos so the query serving
  * paths run with zero fit/tune jobs (pinned by a job-count listener in
  * ModelStoreSpec). Layout under `path/`: one subdirectory per frame.
  */
object ModelStore {

  /** Save a k-means model: `centroids` (cluster, cv) + `wcss` (iter, w).
    * Assignments are NOT persisted — they are corpus-sized; serving
    * re-derives them lazily with one scan via [[KMeans.assignWith]].
    */
  def saveKMeans(spark: SparkSession, path: String, model: KMeans.Model): Unit = {
    spark.createDataFrame(
        model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
      .toDF("cluster", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    spark.createDataFrame(
        model.wcss.zipWithIndex.map { case (w, i) => (i, w) })
      .toDF("iter", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/wcss")
  }

  /** Load a k-means model for `vectors` — centroids and WCSS come from the
    * store; assignments are the LAZY [[KMeans.assignWith]] plan over the
    * given vectors (no action until a consumer runs one, and never a
    * training iteration).
    */
  def loadKMeans(spark: SparkSession, path: String,
      vectors: org.apache.spark.sql.DataFrame): KMeans.Model = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    val wcss = spark.read.parquet(s"$path/wcss")
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
    KMeans.Model(cents, wcss,
      KMeans.assignWith(vectors, cents).select("vec_id", "cluster"))
  }

  /** Save PQ codebooks as (subspace, code, cv) rows — `dim`/`sub` are
    * reconstructed on load (sub = |cv|, dim = subspaces·sub), so the frame
    * is self-describing.
    */
  def savePq(spark: SparkSession, path: String, model: PqIndex.Model): Unit =
    spark.createDataFrame(
        for {
          (book, m) <- model.codebooks.zipWithIndex
          (cv, j) <- book.zipWithIndex
        } yield (m, j, cv.toSeq))
      .toDF("subspace", "code", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")

  def loadPq(spark: SparkSession, path: String): PqIndex.Model = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"no codebooks at $path")
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cs) => cs.sortBy(_._2).map(_._3) }
    val sub = books.head.head.length
    PqIndex.Model(books.size * sub, sub, books)
  }

  /** Save a tuned LSH decision (config + measured stats + corpus size) as a
    * single-row frame.
    */
  def saveLsh(spark: SparkSession, path: String,
      tuned: AnnTuning.Tuned[AnnTuning.LshConfig]): Unit =
    spark.createDataFrame(Seq((
        tuned.config.tables, tuned.config.bits, tuned.config.probes,
        tuned.stats.candidateFraction, tuned.stats.estRecall,
        tuned.stats.maxBucketFraction, tuned.corpusN)))
      .toDF("tables", "bits", "probes", "cand_frac", "est_recall",
        "max_bucket_frac", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/lsh")

  def loadLsh(spark: SparkSession, path: String)
      : AnnTuning.Tuned[AnnTuning.LshConfig] = {
    val df = spark.read.parquet(s"$path/lsh")
    val r = df.collect().head
    // pre-multiprobe artifacts have no `probes` column — read them as
    // probes = 0 (exactly the decision they recorded)
    val probes = if (df.columns.contains("probes")) r.getAs[Int]("probes") else 0
    AnnTuning.Tuned(
      AnnTuning.ConfigStats(
        AnnTuning.LshConfig(r.getAs[Int]("tables"), r.getAs[Int]("bits"), probes),
        r.getAs[Double]("cand_frac"), r.getAs[Double]("est_recall"),
        r.getAs[Double]("max_bucket_frac")),
      r.getAs[Long]("n"))
  }

  /** Save a tuned IVF decision — same single-row shape as [[saveLsh]]. */
  def saveIvf(spark: SparkSession, path: String,
      tuned: AnnTuning.Tuned[AnnTuning.IvfConfig]): Unit =
    spark.createDataFrame(Seq((
        tuned.config.stride, tuned.config.probes,
        tuned.stats.candidateFraction, tuned.stats.estRecall,
        tuned.stats.maxBucketFraction, tuned.corpusN)))
      .toDF("stride", "probes", "cand_frac", "est_recall", "max_bucket_frac", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/ivf")

  def loadIvf(spark: SparkSession, path: String)
      : AnnTuning.Tuned[AnnTuning.IvfConfig] = {
    val r = spark.read.parquet(s"$path/ivf").collect().head
    AnnTuning.Tuned(
      AnnTuning.ConfigStats(
        AnnTuning.IvfConfig(r.getInt(0), r.getInt(1)),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)),
      r.getLong(5))
  }

  /** Save opaque sketch bytes (a serialized CountMinSketch / Bloom filter)
    * as a single-row binary frame.
    */
  def saveSketch(spark: SparkSession, path: String, bytes: Array[Byte]): Unit =
    spark.createDataFrame(Seq(Tuple1(bytes))).toDF("bytes")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/sketch")

  def loadSketch(spark: SparkSession, path: String): Array[Byte] =
    spark.read.parquet(s"$path/sketch").collect().head.getAs[Array[Byte]](0)
}
