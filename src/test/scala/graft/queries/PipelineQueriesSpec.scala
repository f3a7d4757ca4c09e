package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic invariants for the round-6 pipeline queries (b32 sessionize,
  * d15 stratified split, d16 tf-idf, c6 PII redaction) — properties the
  * DuckDB oracle equality can't state directly, checked on real testdata.
  */
class PipelineQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("b32: sessions partition the events and respect the 30-minute gap rule") {
    val sessions = GroupB.b32Sessionize(spark, sf).cache()
    try {
      val totalEvents = Tables.events(spark, sf).count()
      val sessionEvents = sessions.agg(sum("n_events")).collect()(0).getLong(0)
      assert(sessionEvents == totalEvents, "every event belongs to exactly one session")
      // within a user, consecutive sessions are separated by > 30 minutes
      // and ordinals are the contiguous sequence 1..k
      val bad = sessions
        .withColumn("prev_end", lag("session_end", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("session_seq")))
        .withColumn("prev_seq", lag("session_seq", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("session_seq")))
        .filter(col("prev_end").isNotNull &&
          (col("session_start") <= col("prev_end") + expr("INTERVAL 30 MINUTES") ||
            col("session_seq") =!= col("prev_seq") + 1))
      assert(bad.isEmpty, "adjacent sessions closer than the gap or non-contiguous ordinals")
      assert(sessions.filter(col("session_start") > col("session_end")).isEmpty)
    } finally sessions.unpersist()
  }

  test("d15: split is exactly stratified per lang and deterministic") {
    val split = GroupD.d15StratifiedSplit(spark, sf).cache()
    try {
      val got = split.groupBy("lang", "split").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val perLang = Tables(spark, sf, "documents").groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((lang, n) <- perLang) {
        val train = n * 8 / 10
        val valN = n * 9 / 10 - train
        assert(got.getOrElse((lang, "train"), 0L) == train, s"$lang train")
        assert(got.getOrElse((lang, "val"), 0L) == valN, s"$lang val")
        assert(got.getOrElse((lang, "test"), 0L) == n - train - valN, s"$lang test")
      }
      // same hash, same ranks: a second evaluation assigns identically
      val again = GroupD.d15StratifiedSplit(spark, sf)
      assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
    } finally split.unpersist()
  }

  test("d16: at most 5 terms per doc with contiguous ranks from 1") {
    val tfidf = GroupD.d16Tfidf(spark, sf).cache()
    try {
      val perDoc = tfidf.groupBy("doc_id")
        .agg(count(lit(1)).as("k"), min("rnk").as("lo"), max("rnk").as("hi"))
      assert(perDoc.filter(col("k") > 5 || col("lo") =!= 1 ||
        col("hi") =!= col("k")).isEmpty)
      assert(tfidf.filter(col("tfidf") < 0).isEmpty,
        "idf = ln(N/df) is nonnegative (df <= N)")
    } finally tfidf.unpersist()
  }

  test("d17: every stratum is capped at 5 and under-quota strata keep all docs") {
    val sampled = GroupD.d17QuotaSample(spark, sf)
    val got = sampled.groupBy("lang", "source").count()
    assert(got.filter(col("count") > 5).isEmpty, "a stratum exceeded its quota")
    val full = Tables(spark, sf, "documents").groupBy("lang", "source").count()
      .withColumnRenamed("count", "n")
    val under = full.filter(col("n") <= 5)
      .join(got, Seq("lang", "source"), "left")
      .filter(col("count").isNull || col("count") =!= col("n"))
    assert(under.isEmpty, "an under-quota stratum lost docs")
  }

  test("d18: duplicate fraction is consistent with its own counts") {
    val rep = GroupD.d18Repetition(spark, sf)
    assert(rep.filter(col("n_distinct") > col("n_shingles")).isEmpty)
    val recomputed = floor((col("n_shingles") - col("n_distinct")) * lit(10000)
      / col("n_shingles").cast("double")).cast("long")
    assert(rep.filter(col("dup_fp") =!= recomputed).isEmpty)
    assert(rep.filter(col("repetitive") =!= (col("dup_fp") >= 1000)).isEmpty)
  }

  test("d19: benchmark docs never appear and zero-shared docs are uncontaminated") {
    val out = GroupD.d19Decontaminate(spark, sf).cache()
    try {
      assert(out.filter(col("source") === "src0").isEmpty)
      assert(out.filter(col("contaminated") =!= (col("n_shared") > 0)).isEmpty)
      val trainN = Tables(spark, sf, "documents")
        .filter(col("source") =!= "src0").count()
      assert(out.count() == trainN, "every non-benchmark doc gets a verdict")
    } finally out.unpersist()
  }

  test("d20: packing is gapless — offsets stay under budget and positions chain") {
    val packed = GroupD.d20PackSequences(spark, sf).cache()
    try {
      assert(packed.filter(col("pack_offset") < 0 ||
        col("pack_offset") >= 4096).isEmpty)
      // reconstruct each doc's start position and check the per-lang stream
      // is contiguous: this doc's start = previous doc's start + its tokens
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("start_pos")
      val chained = packed
        .withColumn("start_pos", col("pack_id") * 4096 + col("pack_offset"))
        .withColumn("prev_end",
          lag(col("start_pos") + col("n_tokens"), 1).over(w))
        .filter(col("prev_end").isNotNull &&
          col("prev_end") =!= col("start_pos"))
      assert(chained.isEmpty, "a gap or overlap in the packed token stream")
      assert(packed.filter(col("pack_id") === 0 && col("pack_offset") === 0)
        .count() == packed.select("lang").distinct().count(),
        "each lang stream starts exactly once at pack 0, offset 0")
    } finally packed.unpersist()
  }

  test("d21: every unit-norm vector quantizes with a positive scale and a fingerprint") {
    val q = GroupD.d21QuantizeEmbed(spark, sf)
    assert(q.filter(col("q_fp").isNull =!= (col("scale_fp") === 0)).isEmpty,
      "fingerprint must be NULL exactly for zero vectors")
    assert(q.select("n_dims").distinct().count() == 1,
      "corpus dimensionality is uniform")
  }

  test("d22: pipeline survivors respect every stage's rule") {
    val out = GroupD.d22PipelineE2e(spark, sf).cache()
    try {
      // no repetitive doc survives the gate
      val rep = GroupD.d18Repetition(spark, sf)
        .filter(col("repetitive")).select("doc_id")
      assert(out.join(rep, "doc_id").isEmpty)
      // no non-canonical cluster member survives the dedup stage
      val nonCanon = GroupD.d14DedupClusters(spark, sf)
        .filter(col("cluster_id") =!= col("doc_id")).select("doc_id")
      assert(out.join(nonCanon, "doc_id").isEmpty)
      // quota holds on the final corpus
      assert(out.groupBy("lang", "source").count()
        .filter(col("count") > 5).isEmpty)
      // the split boundaries apply to the FINAL (gated, deduped, capped)
      // corpus: per lang, n here is the output's own row count
      val perLang = out.groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bySplit = out.groupBy("lang", "split").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      for ((lang, n) <- perLang) {
        val train = n * 8 / 10
        val valN = n * 9 / 10 - train
        assert(bySplit.getOrElse((lang, "train"), 0L) == train, s"$lang train")
        assert(bySplit.getOrElse((lang, "val"), 0L) == valN, s"$lang val")
        assert(bySplit.getOrElse((lang, "test"), 0L) == n - train - valN, s"$lang test")
      }
    } finally out.unpersist()
  }

  test("c6: untouched documents keep their original fingerprint, touched ones change it") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("orig_fp"))
    val red = GroupC.c6PiiRedact(spark, sf).join(docs, "doc_id")
    assert(red.filter(length(col("redacted_fp")) =!= 32).isEmpty)
    assert(red.filter(col("n_email") === 0 && col("n_longnum") === 0 &&
      col("redacted_fp") =!= col("orig_fp")).isEmpty,
      "no matches must mean byte-identical text")
    assert(red.filter((col("n_email") > 0 || col("n_longnum") > 0) &&
      col("redacted_fp") === col("orig_fp")).isEmpty,
      "matches must change the text")
  }

  test("b36: merge covers every customer with orders, change types are consistent") {
    val orders = Tables(spark, sf, "orders")
    val out = GroupB.b36MergeScd(spark, sf).cache()
    try {
      // one row per customer that has any order; key uniqueness
      assert(out.count() == orders.select("o_custkey").distinct().count())
      assert(out.select("o_custkey").distinct().count() == out.count())
      val cutoff = lit("1997-01-01").cast("timestamp")
      val hasBase = orders.filter(col("o_orderdate") < cutoff)
        .select("o_custkey").distinct()
      val hasDelta = orders.filter(col("o_orderdate") >= cutoff)
        .select("o_custkey").distinct()
      // INSERT ⟺ delta-only, UNCHANGED ⟺ base-only, UPDATE ⟺ both
      val joined = out
        .join(hasBase.withColumn("in_b", lit(true)), Seq("o_custkey"), "left")
        .join(hasDelta.withColumn("in_d", lit(true)), Seq("o_custkey"), "left")
      assert(joined.filter(col("change_type") === "INSERT" &&
        (col("in_b").isNotNull || col("in_d").isNull)).isEmpty)
      assert(joined.filter(col("change_type") === "UNCHANGED" &&
        (col("in_b").isNull || col("in_d").isNotNull)).isEmpty)
      assert(joined.filter(col("change_type") === "UPDATE" &&
        (col("in_b").isNull || col("in_d").isNull)).isEmpty)
      // UPDATE/INSERT rows carry a delta-side (post-cutoff) current order
      assert(out.filter(col("change_type") =!= "UNCHANGED" &&
        col("cur_orderdate") < to_date(cutoff)).isEmpty)
    } finally out.unpersist()
  }

  test("d26: copy counts bracket the mixture weights and reruns are identical") {
    val out = GroupD.d26MixUpsample(spark, sf).cache()
    try {
      // per-doc copy count must equal the declared n_copies, which itself
      // must sit in [floor(w), ceil(w)] for that lang
      val bounds = Map("en" -> (0L, 1L), "de" -> (2L, 3L), "es" -> (1L, 2L),
        "fr" -> (1L, 1L), "zh" -> (3L, 4L))
      val perDoc = out.groupBy("doc_id", "lang", "n_copies")
        .agg(count(lit(1)).as("emitted"),
          max("copy_id").as("max_copy")).collect()
      perDoc.foreach { r =>
        val (lo, hi) = bounds(r.getString(1))
        val n = r.getLong(2)
        assert(n >= lo && n <= hi, s"lang ${r.getString(1)} emitted $n")
        assert(r.getLong(3) == n && r.getLong(4) == n,
          "copy_id must be the contiguous 1..n_copies sequence")
      }
      // src0 (benchmark) docs never appear
      val src0 = Tables(spark, sf, "documents")
        .filter(col("source") === "src0").select("doc_id")
      assert(out.join(src0, "doc_id").isEmpty)
      // deterministic rerun
      assert(GroupD.d26MixUpsample(spark, sf).collect().toSeq ==
        out.orderBy("doc_id", "copy_id").collect().toSeq)
    } finally out.unpersist()
  }

  test("d25: profile metrics agree with directly computed column facts") {
    val li = Tables(spark, sf, "lineitem")
    val rows = GroupD.d25Profile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("l_orderkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate"))
    val n = li.count()
    val ndFlag = li.select("l_returnflag").distinct().count()
    val flag = rows("l_returnflag")
    assert(flag.getLong(1) == n && flag.getLong(2) == 0 &&
      flag.getLong(3) == ndFlag)
    assert(flag.isNullAt(6), "non-numeric columns have no mean")
    val qty = rows("l_quantity")
    val (mn, mx) = {
      val r = li.agg(min("l_quantity"), max("l_quantity")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    assert(qty.getString(4).toDouble == mn && qty.getString(5).toDouble == mx)
    assert(!qty.isNullAt(6), "numeric columns report a mean")
  }

  test("a13: avro round-trip preserves rows and exact types vs the source parquet") {
    val back = GroupA.a13AvroRoundTrip(spark, sf)
    val src = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)), "avro preserves exact types")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "avro round-trip is bit-exact")
  }

  test("c11: markup kernel — script blocks, entity single-decode, whitespace (r18)") {
    import spark.implicits._
    val df = Seq(
      // the tag-soup trap: the script BODY carries < and && — it must be
      // stripped as a block, not read as tags by the generic pass
      (1L, "<p>a</p><script>if (x < 2 && y > 3) { bad() }</script><b>b</b>"),
      // &amp;lt; must single-decode to &lt; (amp decoded LAST), quotes
      // and apostrophes decode, a bare &amp; decodes
      (2L, "&amp;lt;  not &quot;a&quot; tag&#39;s &amp; here"),
      // style blocks and comments strip; runs of whitespace collapse
      (3L, "<style>p { color: red; }</style> <!-- note --> keep   this "),
      (4L, "<a href=\"http://x/y?a=1&amp;b=2\">z</a>")
    ).toDF("doc_id", "html")
    val out = df.select($"doc_id", GroupC.markupClean($"html").as("t"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "a b", s"script body leaked: '${out(0)}'")
    assert(out(1) == "&lt; not \"a\" tag's & here",
      s"entity decode wrong: '${out(1)}'")
    assert(out(2) == "keep this", s"style/comment/ws wrong: '${out(2)}'")
    assert(out(3) == "z", s"attribute tag leaked: '${out(3)}'")
  }

  test("c13: URL normalization kernel — ports, tracking params, fragments, www (r18)") {
    import spark.implicits._
    val df = Seq(
      // default port for the scheme drops; /index.html strips to /;
      // tracking param drops; fragment drops; www. and case fold
      (1L, "HTTPS://WWW.Ex.COM:443/a/index.html?id=1&utm_source=x#f"),
      // tracking-ONLY query: the '?' must vanish; non-default port kept
      (2L, "http://ex.com:8080/a?utm_medium=email"),
      // :80 is default for http (drops); fbclid stripped mid-query
      (3L, "HtTp://cdn.Ex.org:80/p?b=2&fbclid=z&id=3"),
      // :443 on a NON-https scheme is not default — kept
      (4L, "http://sub.site.net:443/x/")
    ).toDF("doc_id", "url")
    val out = df.select($"doc_id", GroupC.urlNormalize($"url").as("n"),
        GroupC.urlDomain($"url").as("d"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "https://ex.com/a/?id=1", out(0).getString(1))
    assert(out(1).getString(1) == "http://ex.com:8080/a", out(1).getString(1))
    assert(out(2).getString(1) == "http://cdn.ex.org/p?b=2&id=3",
      out(2).getString(1))
    assert(out(3).getString(1) == "http://sub.site.net:443/x/",
      out(3).getString(1))
    assert(out(0).getString(2) == "ex.com")
    assert(out(2).getString(2) == "ex.org") // subdomain excluded
    assert(out(3).getString(2) == "site.net")
  }

  test("c13: review counterexamples — empty port, uppercase UTM, sub-2-label domain (r18)") {
    import spark.implicits._
    val df = Seq(
      // an EMPTY port is the same as no port (URI grammar) — the bare
      // colon must strip, or h:/p and h/p split identities
      (1L, "http://h:/p"),
      // campaign links appear uppercase in the wild; underscore-bearing
      // utm keys must strip too
      (2L, "http://h/p?UTM_SOURCE=x&utm_source_platform=y&id=1"),
      // a sub-2-label host has NO registered domain: NULL, not '' (the
      // empty string would pool all such docs into one d91 cap group)
      (3L, "http://localhost/x"),
      (4L, "http://h:/p?a=1")
    ).toDF("doc_id", "url")
    val out = df.select($"doc_id", GroupC.urlNormalize($"url").as("n"),
        GroupC.urlDomain($"url").as("d"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "http://h/p", out(0).getString(1))
    assert(out(1).getString(1) == "http://h/p?id=1", out(1).getString(1))
    assert(out(2).getString(1) == "http://localhost/x")
    assert(out(2).isNullAt(2), "sub-2-label host must have NULL domain")
    assert(out(0).isNullAt(2) && out(3).isNullAt(2))
    assert(out(3).getString(1) == "http://h/p?a=1")
  }

  test("c11: review counterexamples — uppercase blocks, commented-out script opener (r18)") {
    import spark.implicits._
    val df = Seq(
      // HTML tag names are case-insensitive: an uppercase SCRIPT body
      // must strip as a block, never leak as text
      (1L, "<P>upper</P><SCRIPT>var x=1;</SCRIPT>done"),
      (2L, "<STYLE>p{}</STYLE><Script>y</Script>keep"),
      // a commented-out opener must not swallow content up to a later
      // real </script>
      (3L, "<!--<script>--><p>hello</p><script>x</script>")
    ).toDF("doc_id", "html")
    val out = df.select($"doc_id", GroupC.markupClean($"html").as("t"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "upper done", s"uppercase script leaked: '${out(0)}'")
    assert(out(1) == "keep", s"uppercase style/mixed script leaked: '${out(1)}'")
    assert(out(2) == "hello", s"commented-out opener mishandled: '${out(2)}'")
  }

  test("c13: non-absolute input refused with NULL; kernel idempotent on the corpus (r18)") {
    import spark.implicits._
    // junk refusal: no scheme:// → NULL from both kernels (a NULL key
    // drops out of dedup/cap joins instead of colliding on a degenerate)
    val junk = Seq((1L, "not a url"), (2L, "/relative/path?id=1"),
      (3L, "www.ex.com/no-scheme")).toDF("doc_id", "url")
      .select(GroupC.urlNormalize($"url").as("n"),
        GroupC.urlDomain($"url").as("d"))
    assert(junk.filter($"n".isNotNull || $"d".isNotNull).isEmpty)
    // idempotence over the full constructed corpus: re-normalizing a
    // canonical URL is the identity (nothing the kernel emits re-matches
    // a strip pattern)
    val once = GroupC.c13UrlNormalize(spark, sf)
    val twice = once.select(col("doc_id"), col("norm_url"),
      GroupC.urlNormalize(col("norm_url")).as("again"),
      GroupC.urlDomain(col("norm_url")).as("dom_again"),
      GroupC.urlDomain(col("url")).as("dom"))
    assert(twice.filter(col("again") =!= col("norm_url")).isEmpty,
      "urlNormalize is not idempotent")
    assert(twice.filter(col("dom_again") =!= col("dom")).isEmpty,
      "urlDomain disagrees between raw and canonical input")
  }

  test("d91: per-domain cap ≤ 3, contiguous best-first ranks, WindowGroupLimit plan (r18)") {
    val out = GroupD.d91DomainCap(spark, sf).cache()
    try {
      val g = out.groupBy("domain")
        .agg(count(lit(1)).as("n"), max("rank").as("maxr"),
          min("rank").as("minr"))
      assert(g.filter(col("n") > 3).isEmpty, "a domain exceeded the cap")
      // ranks are exactly 1..n within each domain
      assert(g.filter(col("minr") =!= 1 || col("maxr") =!= col("n")).isEmpty)
      // within a domain, rank order is n_chars DESC (doc_id tiebreak)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("domain").orderBy("rank")
      val bad = out.withColumn("prev", lag("n_chars", 1).over(w))
        .filter(col("prev").isNotNull && col("prev") < col("n_chars"))
      assert(bad.isEmpty, "rank order disagrees with n_chars DESC")
      // the scale pin: rank ≤ k over a partitioned window must plan as
      // WindowGroupLimit (map-side per-group pruning before the exchange)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    } finally out.unpersist()
  }

  test("d92: raw pairs differ as strings, collide canonically, keeper is the even id (r18)") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
    // the corpus shape: (2k, 2k+1) raw URLs are DIFFERENT strings with
    // the SAME canonical form — the surface deltas all normalize away
    val raw = docs.select($"doc_id", GroupC.d92Url.as("url"))
      .select($"doc_id", $"url", GroupC.urlNormalize($"url").as("n"),
        ($"doc_id" - $"doc_id" % 2).as("base"))
    val byBase = raw.groupBy("base").agg(
      countDistinct("url").as("nraw"), countDistinct("n").as("ncanon"),
      count(lit(1)).as("cnt"))
    val full = byBase.filter(col("cnt") === 2)
    assert(full.filter(col("nraw") =!= 2 || col("ncanon") =!= 1).isEmpty,
      "a pair's raw forms coincided or its canonical forms diverged")
    val out = GroupD.d92UrlDedup(spark, sf)
    assert(out.filter(col("keep_id") % 2 =!= 0).isEmpty,
      "keeper must be the even (smaller) member")
    // fixed-buffer aggs keyed on the string: HashAggregate with map-side
    // partials, and NO SortAggregate (a min-over-string buffer would
    // force one, paying two full sorts — the rejected variant)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(!plan.contains("SortAggregate"), plan.take(2000))
  }

  test("c12: the composed gate covers every document and keeps d69's schema (r18)") {
    val c12 = GroupC.c12MarkupGopher(spark, sf)
    val d69 = GroupD.d69GopherRules(spark, sf)
    assert(c12.schema == d69.schema,
      "the composed gate must be the SAME gate (shared gopherOver body)")
    assert(c12.count() == Tables(spark, sf, "documents").count())
    // the wrapper injects known-clean words (Doc/Tom/Jerry/link...), so
    // cleaned word counts strictly exceed the raw text's
    val joined = c12.select(col("doc_id"), col("n_words").as("nw_clean"))
      .join(d69.select(col("doc_id"), col("n_words").as("nw_raw")), "doc_id")
    assert(joined.filter(col("nw_clean") <= col("nw_raw")).count() == 0)
  }
}
