package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic invariants for the round-7 widening queries: d28 overlapping
  * chunking, d29 bigram collocations, d30 containment probes, a9 schema
  * drift — properties the DuckDB oracle equality can't state directly.
  */
class ChunkCollocationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("d28: chunks tile every document at stride 48 and cover the last token") {
    val chunks = GroupD.d28ChunkOverlap(spark, sf).cache()
    try {
      val docs = Tables(spark, sf, "documents")
        .select(col("doc_id"), GroupC.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 1 && col("ts").getItem(0) =!= "")
        .select(col("doc_id"), size(col("ts")).cast("long").as("n"))
      // per doc: ids are 0..k-1, starts are id*48+1, every chunk is 64
      // tokens except possibly the last, and the last chunk reaches token n
      val per = chunks.groupBy("doc_id").agg(
        count(lit(1)).as("k"),
        max("chunk_id").as("max_id"),
        sum(when(col("n_chunk_tokens") === 64, 0).otherwise(1)).as("short_chunks"),
        max(col("chunk_start") + col("n_chunk_tokens") - 1).as("covered"))
      val joined = per.join(docs, "doc_id")
      assert(joined.filter(col("max_id") =!= col("k") - 1).isEmpty,
        "chunk ids must be contiguous from 0")
      assert(joined.filter(col("short_chunks") > 1).isEmpty,
        "only the final chunk may be shorter than the window")
      assert(joined.filter(col("covered") =!= col("n")).isEmpty,
        "the last chunk must end exactly at the last token")
      assert(chunks.filter(col("chunk_start") =!= col("chunk_id") * 48 + 1).isEmpty,
        "starts must advance by exactly the stride")
      // every document with tokens is chunked
      assert(docs.join(per, Seq("doc_id"), "left_anti").isEmpty)
    } finally chunks.unpersist()
  }

  test("d29: top-5 per lang, contiguous ranks, counts recomputable") {
    val top = GroupD.d29BigramPmi(spark, sf).cache()
    try {
      val perLang = top.groupBy("lang")
        .agg(count(lit(1)).as("k"), max("rnk").as("maxr"), min("rnk").as("minr"))
      assert(perLang.filter(col("k") > 5 || col("maxr") =!= col("k") ||
        col("minr") =!= 1).isEmpty, "ranks must be the contiguous prefix 1..k≤5")
      // recount one winning bigram directly from the corpus
      val row = top.filter(col("rnk") === 1).orderBy("lang").limit(1)
        .collect()(0)
      val (lang, w1, w2, cnt) =
        (row.getString(0), row.getString(1), row.getString(2), row.getLong(3))
      val direct = Tables(spark, sf, "documents")
        .filter(col("lang") === lang)
        .select(GroupC.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("b"))
        .filter(col("b.w1") === w1 && col("b.w2") === w2)
        .count()
      assert(direct == cnt, s"recount of top bigram ($w1,$w2) in $lang")
      assert(top.filter(col("lift_fp") <= 0).isEmpty,
        "a bigram that occurs has positive lift")
    } finally top.unpersist()
  }

  test("d30: probe-generated containment equals c7's exact result") {
    val probe = GroupD.d30ContainmentProbe(spark, sf)
    val exact = GroupC.c7Containment(spark, sf)
    assert(probe.exceptAll(exact).isEmpty && exact.exceptAll(probe).isEmpty,
      "prefix-filtered probing + exact verify must reproduce c7 bit-for-bit")
  }

  test("d30: the prefix filter's candidate volume is a small fraction of c7's meets (visible)") {
    // d4's discipline: the claimed pruning must be a measured number, not
    // prose. Candidate volume = probe-join meets; c7's volume = the full
    // inverted-index self-join meets (Σ df·(df−1)/2).
    val sh = GroupC.shingles(spark, "/root/testdata/sf0.01")
    // the SHIPPED probe rule, not a copy — the pin measures d30's code
    val probes = GroupD.containmentProbes(sh)
    val candidateMeets = probes.as("p").join(sh.as("i"), "shingle")
      .filter(col("p.doc_id") =!= col("i.doc_id")).count()
    val fullMeets = sh.as("a").join(sh.as("b"),
      col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id")).count()
    val fraction = candidateMeets.toDouble / fullMeets
    info(f"candidate meets $candidateMeets vs full $fullMeets -> fraction $fraction%.3f")
    assert(fraction < 0.25,
      f"prefix filter stopped pruning: fraction $fraction%.3f")
  }

  test("d32: novelty is a valid fraction and OOV counts recompute directly") {
    val nov = GroupD.d32BigramNovelty(spark, sf).cache()
    try {
      assert(nov.filter(col("n_oov") > col("n_bigrams") ||
        col("novelty_fp") < 0 || col("novelty_fp") > 10000).isEmpty)
      // every >=2-token doc is scored exactly once
      val expected = Tables(spark, sf, "documents")
        .filter(size(GroupC.tokens(col("text"))) >= 2).count()
      assert(nov.count() == expected)
      // d32's fixed point is consistent with its own counts
      assert(nov.filter(col("novelty_fp") =!=
        expr("(n_oov * 10000) div n_bigrams")).isEmpty)
    } finally nov.unpersist()
  }

  test("d34: survivors are exactly the delta docs without a base or earlier-delta match") {
    val deltaSrc = Set("src17", "src18", "src19")
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val delta = docs.collect { case (id, s) if deltaSrc(s) => id }.toSet
    // qualifying pairs under d34's exact integer threshold, recomputed
    // independently from the shared pair-overlap skeleton
    val pairs = GroupC.pairOverlap(spark, sf)
      .filter(col("c") * 8 >= (col("na") + col("nb")) * 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val matchesOf = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val expected = delta.filter { d =>
      !matchesOf.getOrElse(d, Set.empty).exists(o => !delta(o) || o < d)
    }
    val got = GroupD.d34DedupIncremental(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"extra=${got -- expected} missing=${expected -- got}")
    assert(got.subsetOf(delta), "output must contain only delta documents")
  }

  test("d34: rarest-first probing prunes the candidate join (visible) and stays complete") {
    // round-9: d34 probes with each delta doc's floor(2n/5)+1 rarest
    // shingles instead of ALL delta shingles — the pruning must be a
    // measured number (d30's discipline), and pigeonhole completeness
    // means the candidate PAIR set must still cover every J>=0.6 match
    val sf01 = "/root/testdata/sf0.01"
    val deltaIds = Tables(spark, sf01, "documents")
      .filter(col("source").isin("src17", "src18", "src19")).select("doc_id")
    val sh = GroupC.shingles(spark, sf01)
    val shDelta = sh.join(deltaIds, "doc_id")
    // the SHIPPED probe rule, not a copy
    val probes = GroupD.incrementalProbes(sh, deltaIds)
    val probeMeets = probes.as("d").join(sh.as("o"), "shingle")
      .filter(col("d.doc_id") =!= col("o.doc_id")).count()
    val fullMeets = shDelta.as("d").join(sh.as("o"), "shingle")
      .filter(col("d.doc_id") =!= col("o.doc_id")).count()
    val fraction = probeMeets.toDouble / fullMeets
    info(f"probe meets $probeMeets vs full $fullMeets -> fraction $fraction%.3f")
    assert(fraction < 0.6, f"prefix filter stopped pruning: $fraction%.3f")
    // completeness: every qualifying pair (delta doc, partner) appears
    // among the prefix-probe candidates
    val candPairs = probes.as("d").join(sh.as("o"), "shingle")
      .filter(col("d.doc_id") =!= col("o.doc_id"))
      .select(col("d.doc_id").as("did"), col("o.doc_id").as("oid"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qualifying = GroupC.pairOverlap(spark, sf01)
      .filter(col("c") * 8 >= (col("na") + col("nb")) * 3)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val deltaSet = deltaIds.collect().map(_.getLong(0)).toSet
    val required = qualifying.filter { case (d, _) => deltaSet(d) }.toSet
    assert(required.subsetOf(candPairs),
      s"prefix probes missed qualifying pairs: ${required -- candPairs}")
  }

  test("a9: drifted batches union by name with nulls exactly where the column was absent") {
    val out = GroupA.a9SchemaDrift(spark, sf).cache()
    try {
      assert(out.filter(col("src_ver") === 1 && col("l_discount").isNotNull).isEmpty,
        "v1 lacked l_discount — must surface as NULL")
      assert(out.filter(col("src_ver") === 2 && col("l_discount").isNull).isEmpty,
        "v2 carries l_discount for every row")
      val li = Tables(spark, sf, "lineitem")
      assert(out.filter(col("src_ver") === 1).count() ==
        li.filter(col("l_linenumber") === 1).count())
      assert(out.filter(col("src_ver") === 2).count() ==
        li.filter(col("l_linenumber") === 2).count())
    } finally out.unpersist()
  }
}
