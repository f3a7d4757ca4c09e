package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Internal-consistency pins for the round-13 corpus diagnostics (the
  * DuckDB oracle pins their values; these pin the INVARIANTS that hold
  * on any corpus, exercised at sf0.001):
  *  - d69: each rule flag restates its reported statistic, and `keep`
  *    is exactly the conjunction — the gate cannot disagree with the
  *    metrics it publishes.
  *  - d70: slopes are strictly negative (rank-1 is the mode by
  *    construction) and n_types ≤ n_tokens.
  *  - d71: entropy is bounded by [0, log₂(n_types)] with equality at
  *    the uniform end only, and n_types ≤ n_toks.
  *  - d72: KL divergence is non-negative (Gibbs' inequality).
  */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("d69 flags restate their statistics and keep is the conjunction") {
    val rows = GroupD.d69GopherRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getLong(r.fieldIndex("n_words"))
      val meanLen = r.getLong(r.fieldIndex("mean_word_len_fp"))
      val alpha = r.getLong(r.fieldIndex("alpha_frac_fp"))
      val stops = r.getLong(r.fieldIndex("stop_hits"))
      val sym = r.getLong(r.fieldIndex("symbol_frac_fp"))
      def b(n: String) = r.getBoolean(r.fieldIndex(n))
      assert(b("r_word_count") == (nWords >= 50 && nWords <= 100000))
      assert(b("r_mean_len") == (meanLen >= 300 && meanLen <= 1000))
      assert(b("r_alpha") == (alpha >= 8000))
      assert(b("r_stop") == (stops >= 1))
      assert(b("r_symbol") == (sym < 1000))
      assert(b("keep") == (b("r_word_count") && b("r_mean_len") &&
        b("r_alpha") && b("r_stop") && b("r_symbol")))
    }
  }

  test("d70 slopes are negative and volumes are consistent") {
    val rows = GroupD.d70ZipfFit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("zipf_slope")) < 0.0)
      assert(r.getLong(r.fieldIndex("n_types")) <=
        r.getLong(r.fieldIndex("n_tokens")))
    }
  }

  test("d72 divergence is non-negative (Gibbs) with consistent volumes") {
    val rows = GroupD.d72SourceDivergence(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // KL(P_s ‖ P_c) ≥ 0 always; rounding slack for the round(·, 4)
      assert(r.getDouble(r.fieldIndex("kl_bits")) >= -1e-4)
      assert(r.getLong(r.fieldIndex("n_types")) <=
        r.getLong(r.fieldIndex("n_tokens")))
    }
  }

  test("d74 chunks tile each document exactly") {
    val rows = GroupD.d74CdcChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, ch) =>
      val sorted = ch.sortBy(_._2)
      assert(sorted.head._3 == 1L, s"doc $doc first chunk start")
      // contiguous: each start is the previous end + 1
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) =>
          assert(s2 == s1 + l1, s"doc $doc gap at $s2")
        case _ => ()
      }
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
    }
  }

  test("d75 volumes reconcile with d74's chunk table") {
    val vol = GroupD.d74CdcChunks(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (d, ch) => d -> ((ch.length.toLong, ch.map(_.getLong(3)).sum)) }
    val rows = GroupD.d75ChunkDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val doc = r.getLong(0)
      val (nCh, nChars) = vol(doc)
      assert(r.getLong(1) == nCh && r.getLong(2) == nChars,
        s"doc $doc volume mismatch")
      assert(r.getLong(3) <= nCh && r.getLong(4) <= nChars,
        s"doc $doc shared exceeds volume")
      assert(r.getLong(5) == r.getLong(4) * 10000 / math.max(nChars, 1L))
    }
    assert(rows.map(_.getLong(0)).toSet == vol.keySet, "doc sets differ")
  }

  test("d77 reconstructs untouched docs bit-exactly and reconciles with d75") {
    import org.apache.spark.sql.functions.{col, md5}
    val docs = graft.queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("orig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val d75 = GroupD.d75ChunkDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = GroupD.d77RemoveSharedChunks(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val doc = r.getLong(0)
      val (nCh, nChars) = d75(doc)
      assert(r.getLong(1) + r.getLong(3) == nCh, s"doc $doc chunk split")
      assert(r.getLong(2) + r.getLong(4) == nChars, s"doc $doc char split")
      // chunks TILE the doc, so removing nothing reconstructs the
      // original text exactly — the md5 must match the raw text's
      if (r.getLong(3) == 0L)
        assert(r.getString(5) == docs(doc), s"doc $doc reconstruction")
      else
        assert(r.getString(5) != docs(doc), s"doc $doc removed yet identical")
    }
  }

  test("d74 boundaries are edit-stable: a prefix edit leaves the tail chunks") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight while nobody " +
      "watches the long winding river flow quietly past the old mill"
    val edited = "XX" + base // a 2-char prepend — fixed windows all shift
    val chunks = GroupD.cdcChunksOf(
        Seq((1L, base), (2L, edited)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(4)))
    val a = chunks.filter(_._1 == 1L).map(_._2)
    val b = chunks.filter(_._1 == 2L).map(_._2)
    // all chunks after the first boundary re-synchronize: the edited
    // doc's chunk md5 set must contain every base chunk except possibly
    // the first (whose content absorbed the edit)
    val shared = a.toSet intersect b.toSet
    assert(shared.size >= a.length - 1,
      s"CDC failed to resynchronize: ${a.length} base chunks, " +
        s"${shared.size} shared")
    assert(a.length >= 3, s"fixture too short to be meaningful: ${a.length}")
  }

  test("d71 entropy respects its information-theoretic bounds") {
    val rows = GroupD.d71DocEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(r.fieldIndex("entropy_bits"))
      val types = r.getLong(r.fieldIndex("n_types"))
      val toks = r.getLong(r.fieldIndex("n_toks"))
      assert(types <= toks)
      // rounding slack: values are round(·, 4)
      assert(h >= -1e-4 && h <= math.log(types.toDouble) / math.log(2.0) + 1e-4,
        s"doc ${r.getLong(0)}: H=$h outside [0, log2($types)]")
      assert(r.getBoolean(r.fieldIndex("low_entropy")) == (h < 3.0))
    }
  }
}
