package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization codebooks for an embedding corpus: the vector
  * space is cut into `M` contiguous subspaces and each subspace gets a
  * `K`-entry codebook trained by [[KMeans]] on that slice. The model is
  * driver-sized (M·K·sub doubles — the same "only the model reaches the
  * driver" contract as [[KMeans]] and [[AnnTuning]]) and MEMOIZED per
  * corpus key: training is a one-time cost (it lands in a bench's first
  * pass, like AnnTuning's sampled tuning), while every later use embeds
  * the codebooks as plan literals. Same lock discipline as AnnTuning's
  * round-4 fix: `putIfAbsent` publishes a lazy holder so the multi-job
  * training never runs inside a ConcurrentHashMap bin lock, and the key
  * carries every parameter the model depends on.
  */
object PqIndex {

  /** `codebooks(m)(j)` = centroid j of subspace m (each `sub` doubles). */
  final case class Model(dim: Int, sub: Int, codebooks: Seq[Array[Array[Double]]])

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, LazyMemo[Model]]()

  /** Train (or reuse) the codebooks for a corpus of L2-normalized vectors
    * (`vec_id`, `nvec: array<float>`). `key` must identify the corpus
    * (e.g. the sf dir or a test tag) — deterministic inputs make the
    * memoized model equal to a fresh retrain.
    */
  def train(key: String, nv: DataFrame, m: Int, k: Int, iters: Int): Model = {
    // disk-backed second level (Bench/Verify only — see ModelCache)
    LazyMemo.memoized(memo, s"$key|$m|$k|$iters")(
      ModelCache.cached("pq", s"$key|$m|$k|$iters",
        nv)(ModelStore.loadPq(nv.sparkSession, _))(
        ModelStore.savePq(nv.sparkSession, _, _))(
        doTrain(nv, m, k, iters)))
  }

  /** Test seam: drop every memoized model (e.g. to pin that a RETRAIN is
    * deterministic, which a memo hit would vacuously pass) — the same
    * seam AnnTuning provides.
    */
  def clearMemo(): Unit = memo.clear()

  /** Seed the memo with a persisted model ([[ModelStore.loadPq]]) so a
    * later [[train]] with the same parameters serves it without the
    * M-codebook training pass — [[KMeans.install]]'s twin.
    */
  def install(key: String, m: Int, k: Int, iters: Int, model: Model): Unit =
    memo.put(s"$key|$m|$k|$iters", new LazyMemo(() => model))

  private def doTrain(nv: DataFrame, m: Int, k: Int, iters: Int): Model = {
    val dimRow = nv.select(max(size(col("nvec"))), min(size(col("nvec")))).collect()(0)
    require(!dimRow.isNullAt(0),
      "cannot train PQ codebooks on an empty corpus (no normalizable vectors)")
    val dim = dimRow.getInt(0)
    // a mixed-dimension corpus would pass the divisibility gate yet slice
    // short/misaligned subvectors, silently degrading codes — fail fast
    require(dimRow.getInt(1) == dim,
      s"PQ needs a fixed-dimension corpus; saw sizes ${dimRow.getInt(1)}..$dim")
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val books = (0 until m).map { i =>
      KMeans.fit(
        nv.select(col("vec_id"),
          expr(s"slice(nvec, ${i * sub + 1}, $sub)").as("embedding")),
        k = k, iters = iters).centroids
    }
    Model(dim, sub, books)
  }
}
