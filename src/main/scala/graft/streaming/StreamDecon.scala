package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of d19/d23's decontamination: tag documents on an
  * unbounded ingest stream with their estimated benchmark-shingle overlap
  * by probing a STATIC benchmark bloom filter per row — the "don't let
  * eval data into the training mix" gate run at ingest time instead of as
  * a batch sweep.
  *
  * The scale shape is the whole point: the stage is MAP-ONLY (no shuffle,
  * no state, append-mode safe at any watermark) because the benchmark set
  * rides inside the plan as a bloom-filter literal (d23's pattern) and
  * each document's shingles are probed as a per-row array fold — so the
  * gate adds zero streaming state at 100 TB/day, where a stream-static
  * JOIN against the benchmark shingle table would shuffle every shingle
  * of every arriving document.
  *
  * The per-row shingle set comes from the native
  * [[graft.functions.ShingleHashes]] kernel, NOT the declarative
  * tokenize+transform HOF chain: a downstream `filter(contaminated_est)`
  * (every consumer of this gate writes one) pushes the predicate below
  * the projection, substituting the alias INTO the per-element lambda —
  * the regex tokenizer then re-runs ~3× per element per row (measured
  * 32 s for tag+filter+count over 45k docs at sf0.1; the native kernel's
  * single char-scan per evaluation site does the same work in 1 s,
  * identical results). The d43 inline trap, pushdown edition.
  *
  * Estimate contract (one-sided, the d23/d41 family): bloom filters have
  * no false negatives, so `n_shared_est ≥ n_shared` and
  * `contaminated_est = false` GUARANTEES the document is clean — a
  * pipeline drops flagged docs (over-dropping the ~1% clean-but-flagged
  * is the accepted cost) or routes them to d44's exact attribution for
  * adjudication.
  */
object StreamDecon {

  /** Per-row distinct shingle hashes — [[graft.functions.ShingleHashes]],
    * bit-identical to the batch GroupC.shingles per-doc set (pinned in
    * ShingleHashesSpec). Resolved via the function registry, so callers
    * must register first (both entry points below do).
    */
  private def shingles(text: Column): Column =
    call_function(graft.functions.GraftFunctions.ShingleHashesName, text)

  /** The benchmark side, built ONCE per benchmark release (a driver-side
    * action over the static benchmark relation — never the stream):
    * serialized bloom over the distinct benchmark shingles.
    */
  def benchmarkBloom(benchDocs: DataFrame, textCol: String = "text"): Array[Byte] = {
    graft.functions.GraftFunctions.register(benchDocs.sparkSession)
    val distinctSh = benchDocs
      .select(explode(shingles(col(textCol))).as("shingle"))
      .distinct()
    graft.functions.BloomContains.serialized(distinctSh, "shingle")
  }

  /** Tag a (possibly streaming) documents frame with `n_shared_est` /
    * `contaminated_est` from the benchmark bloom. Pure projection —
    * composes with any downstream watermark/sink/filter.
    */
  def tag(docs: DataFrame, bloomBytes: Array[Byte],
          textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val hits = filter(shingles(col(textCol)), s =>
      call_function(graft.functions.GraftFunctions.BloomName,
        lit(bloomBytes), s))
    docs
      // NULL text shares no shingles: coalesce keeps the contract two-state
      // (the batch shingle frame drops null-text rows for the same reason),
      // so filter(contaminated_est) / filter(!contaminated_est) partition
      // the stream with no silently-dropped third state.
      .withColumn("n_shared_est", coalesce(size(hits).cast("long"), lit(0L)))
      .withColumn("contaminated_est", col("n_shared_est") > 0)
  }
}
