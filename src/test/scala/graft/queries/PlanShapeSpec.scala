package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape regression tests: the scale-critical physical-plan properties
  * the SCALE.md audit claims, pinned so a future edit cannot silently
  * un-push a filter, de-broadcast a dim, or reintroduce a nested-loop
  * join. Asserts on `queryExecution.executedPlan.toString` (the planned
  * shape — AQE may still refine exchanges at runtime, but the properties
  * below are decided at planning).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("driver contract: every oracle key names a declared query") {
    val queries = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet -- queries
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
    // rows-only (oracle-less) declarations are the approximate ops only
    val rowsOnly = queries -- graft.SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("d4_ann_lsh", "d11_ann_ivf", "d12_sketch_stats",
      "d13_ann_topk", "d27_kmeans", "d33_ann_pq", "d36_filtered_ann",
      "d39_semdedup", "d41_bigram_novelty_cms", "d43_containment_minhash",
      "d51_embedding_drift", "d52_label_knn_ann", "d53_ivf_maintain",
      "d54_maintained_serve", "d60_ann_ivfpq", "d63_bpe_train",
      "d73_bpe_encode"),
      s"unexpected oracle-less queries: $rowsOnly")
  }

  test("b40/b42/d66: top-k cuts plan as TakeOrderedAndProject, never a global sort") {
    assert(plan("b40_tpch_q3").contains("TakeOrderedAndProject"))
    assert(plan("b42_tpch_q18").contains("TakeOrderedAndProject"))
    assert(plan("d66_skew_report").contains("TakeOrderedAndProject"))
  }

  test("b44: every Q6 predicate reaches the scan; the agg is partial+final") {
    val p = plan("b44_tpch_q6")
    // shipdate range + quantity bound reach PushedFilters (the rendered
    // list truncates, so assert the leading entries + the DataFilters
    // mirror of the quantity bound)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "IsNotNull(l_quantity), GreaterThanOrEqual(l_shipdate"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(p.contains("l_quantity#") && p.contains("< 24.0"))
    assert(p.contains("partial_sum"), "Q6 must combine map-side")
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("b45: Q14's dim broadcasts; both sums combine map-side; date band pushed") {
    val p = plan("b45_tpch_q14")
    assert(p.contains("BroadcastHashJoin"), "part dim must broadcast")
    assert(p.contains("partial_sum"), "promo/total sums must combine map-side")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("b46: Q4 is a SEMI join (existence for free, no post-join dedup)") {
    val p = plan("b46_tpch_q4")
    assert(p.contains("LeftSemi"), p.linesIterator.take(20).mkString("\n"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date band must reach the orders scan")
    assert(!p.contains("HashAggregate(keys=[o_orderkey"),
      "existence must come from the semi join, not a dedup aggregate")
  }

  test("b47: Q19's hoisted bounds reach BOTH scans; the dim prunes pre-broadcast") {
    val p = plan("b47_tpch_q19")
    assert(p.contains("In(p_brand"), "brand set must push to the part scan")
    assert(p.contains("LessThanOrEqual(l_quantity,30.0)"),
      "hoisted quantity bound must push to the lineitem scan")
    assert(p.contains("BroadcastHashJoin"), "pruned part dim must broadcast")
  }

  test("b54: Q21's existence tests are SEMI and ANTI joins on the same fact — no dedup agg") {
    val p = plan("b54_tpch_q21")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("TakeOrderedAndProject"), "the 100-cut must not global-sort")
    assert(!p.contains("HashAggregate(keys=[l_orderkey"),
      "existence must come from the joins, not a count-distinct dedup")
  }

  test("b55: Q20's IN chain plans as broadcast-prune + partial agg + SEMI join") {
    val p = plan("b55_tpch_q20")
    assert(p.contains("LeftSemi"), p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("BroadcastHashJoin"),
      "the name-filtered part keys must broadcast-prune the fact scan")
    assert(p.contains("partial_sum"), "per-(supplier, part) agg must combine map-side")
  }

  test("b48/b58: the dim prune sits BELOW the pre-aggregate (broadcast semi before the shuffle)") {
    // r19 — the verdict's one genuine plan defect: Catalyst does not push
    // joins through aggregates, so the brand/size/region prunes must be
    // authored below the per-part(, supplier) pre-aggregates or the full
    // key space crosses the exchange and ~98% is discarded one operator
    // later. Pin it structurally: every pre-aggregate (grouping on the
    // fact keys) must carry the LeftSemi prune(s) in its own subtree.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    def pin(name: String, groupKeys: Int, semis: Int): Unit = {
      val lp = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan
      val preAggs = lp.collect {
        case a: Aggregate if a.groupingExpressions.size == groupKeys => a
      }
      assert(preAggs.nonEmpty, s"$name: pre-aggregate not found")
      for (a <- preAggs) {
        val below = a.child.collect {
          case j: Join if j.joinType == LeftSemi => j
        }
        assert(below.size == semis,
          s"$name: expected $semis LeftSemi prune(s) below the " +
            s"pre-aggregate, saw ${below.size}")
      }
      val p = plan(name)
      assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
        s"$name: the semi prune must be a broadcast join")
    }
    pin("b48_tpch_q17", groupKeys = 1, semis = 1)
    pin("b58_tpch_q2", groupKeys = 2, semis = 2)
  }

  test("b56: Q12's date band reaches the scan; both counts ride one partial agg") {
    val p = plan("b56_tpch_q12")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(p.contains("partial_sum"), "the census must combine map-side")
    assert(!p.contains("Window"), "no window belongs in a conditional census")
  }

  test("b49: Q22's absence test is a LEFT ANTI join; priority filter pushed") {
    val p = plan("b49_tpch_q22")
    assert(p.contains("LeftAnti"), p.linesIterator.take(25).mkString("\n"))
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"),
      "priority filter must reach the orders scan")
  }

  test("b50: Q15's argmax is a 1-row broadcast back over the aggregate — no window") {
    val p = plan("b50_tpch_q15")
    assert(p.contains("BroadcastExchange"), "max must broadcast")
    assert(!p.contains("Window"), "argmax must not sort the whole aggregate")
  }

  test("b43: Q1 is one pushed-filter scan into a partial+final hash agg") {
    val p = plan("b43_tpch_q1")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    assert(p.contains("partial_sum"), "Q1 must combine map-side")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    // one for the group-by, one for the presentation sort — nothing else
    assert(exchanges <= 2, p.linesIterator.filter(_.contains("Exchange"))
      .mkString("\n"))
  }

  test("d69: the Gopher gate is shuffle-free up to the presentation sort") {
    // SCALE.md's d69 claim made structural: one Exchange total (the
    // range partitioning feeding the ORDER BY doc_id), nothing else —
    // no aggregation, no window, no join may sneak a shuffle into the
    // scan-bound gate
    val p = plan("d69_gopher_rules")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected only the presentation-sort exchange:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!p.contains("HashAggregate") && !p.contains("SortMergeJoin"))
  }

  test("d71: both aggregations are partial-before-shuffle, nothing else moves") {
    // two hash exchanges is the RIGHT shape: the first carries map-side
    // combined (doc_id, token) counts (≈ distinct tokens per doc, not
    // raw occurrences), the second carries ≤ one partial row per
    // (doc, input partition). A single doc_id repartition would be one
    // exchange of RAW exploded occurrences — strictly more bytes. Pin
    // the count and the absence of joins/windows.
    val p = plan("d71_doc_entropy")
    val hashEx = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashEx == 2, s"expected the 2 partial-agg exchanges, saw $hashEx:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "aggregates must combine map-side before the shuffle")
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("d59: boilerplate membership is a broadcast join (df-tail build side)") {
    val p = plan("d59_boilerplate_spans")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(25).mkString("\n"))
  }

  test("d61: rank and running cumsum share ONE window (single sort per lang shard)") {
    val p = plan("d61_budget_assembly")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1, s"expected 1 Window operator, saw $windows:\n" +
      p.linesIterator.filter(_.contains("Window")).mkString("\n"))
  }

  test("d60: the ADC candidate join carries PQ codes, never full-width vectors") {
    // the SCALE.md d60 claim made structural: the join that attaches the
    // corpus side to candidates must ship the M-int `codes` array — the
    // float `nvec` may only appear in the C-bounded rerank joins
    val lp = graft.SparkEntry.queries("d60_ann_ivfpq")(spark, sf)
      .queryExecution.optimizedPlan
    val joins = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val adcJoins = joins.filter(_.output.map(_.name).contains("codes"))
    assert(adcJoins.nonEmpty, "ADC stage must join on compact codes")
    assert(adcJoins.forall(j => !j.output.map(_.name).contains("nvec")),
      "full-width vectors must not ride the candidate join")
  }

  test("d38: global top-20 plans as TakeOrderedAndProject, never a full sort") {
    val p = plan("d38_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(20).mkString("\n"))
  }

  test("d40: pure two-level aggregate — no join, no window") {
    val p = plan("d40_length_histogram")
    assert(!p.contains("Join") && !p.contains("Window"),
      p.linesIterator.take(20).mkString("\n"))
  }

  test("d74: chunking is pure scan-side — no join/window; text never crosses an exchange") {
    // the round-14 rewrite's contract: cut detection, boundary zipping
    // and chunk-md5 all happen inside the text row's own projection.
    // The only exchange is the presentation sort, and its payload is
    // (doc_id, idx, start, len, md5) — never the text column.
    val df = GroupD.cdcChunksOf(
      Tables(spark, sf, "documents").select("doc_id", "text"))
    val rendered = df.queryExecution.executedPlan.toString
    assert(!rendered.contains("Join") && !rendered.contains("Window ["),
      rendered.linesIterator.take(25).mkString("\n"))
    val exchanges = rendered.linesIterator.filter(_.contains("Exchange")).toList
    assert(exchanges.nonEmpty, "expected the presentation-sort exchange")
    assert(exchanges.forall(l =>
      l.contains("rangepartitioning") && !l.contains("text#")),
      "document text rode a shuffle:\n" + exchanges.mkString("\n"))
  }

  test("d78: the pixel decode runs ONCE per join side — never re-derived at the scan") {
    // the round-14 pathology pinned: an isnotnull(dhash) — explicit or
    // inferred from the hamming predicate — pushes through the
    // repartition barriers and re-inlines the whole construct+decode
    // into a per-row scan filter (measured 25 of 27 s at sf0.1). The
    // decode expression may appear once per join side, nowhere else.
    val p = plan("d78_image_dedup")
    val occurrences = "graft_bmp_dhash\\(".r.findAllMatchIn(p).length
    assert(occurrences <= 2, s"decode expression appears $occurrences times")
    assert(!p.contains("DataFilters: [isnotnull(graft_bmp_dhash"),
      "inferred null filter re-derives the decode at the scan")
  }

  test("d84: the PNG decode runs ONCE per join side — never re-derived at the scan") {
    // d78's pathology pin at the PNG leg: the inflate+unfilter decode is
    // far more expensive than the BMP walk, so an inferred
    // isnotnull(dhash) re-inlining it at the scan would hurt worse
    val p = plan("d84_png_dedup")
    val occurrences = "graft_png_dhash\\(".r.findAllMatchIn(p).length
    assert(occurrences <= 2, s"decode expression appears $occurrences times")
    assert(!p.contains("DataFilters: [isnotnull(graft_png_dhash"),
      "inferred null filter re-derives the decode at the scan")
  }

  test("d87: the GIF LZW decode runs ONCE per join side — never re-derived at the scan") {
    val p = plan("d87_gif_dedup")
    val occurrences = "graft_gif_dhash\\(".r.findAllMatchIn(p).length
    assert(occurrences <= 2, s"decode expression appears $occurrences times")
    assert(!p.contains("DataFilters: [isnotnull(graft_gif_dhash"),
      "inferred null filter re-derives the decode at the scan")
  }

  test("d86: both decodes run ONCE per join side; qualifying pairs cross the format boundary") {
    // the cross-format corpus runs BOTH native decodes under a coalesce
    // (each refuses the other container at its signature), so the d78
    // pathology pin applies to each: one occurrence per join side max,
    // and no inferred isnotnull filter re-deriving them at the scan
    val p = plan("d86_cross_format_dedup")
    for (fn <- Seq("graft_bmp_dhash", "graft_png_dhash")) {
      val occurrences = s"$fn\\(".r.findAllMatchIn(p).length
      assert(occurrences <= 2, s"$fn appears $occurrences times")
      assert(!p.contains(s"DataFilters: [isnotnull($fn"),
        s"inferred null filter re-derives $fn at the scan")
    }
    // the claim under test: a BMP-rendered asset dedups against a
    // PNG-rendered one — at least one verified pair spans the parity
    // boundary (even doc_ids are BMP, odd are PNG)
    val pairs = GroupD.d86CrossFormatDedup(spark, sf)
      .select("doc_a", "doc_b").collect()
    assert(pairs.exists(r => r.getLong(0) % 2 != r.getLong(1) % 2),
      s"no cross-format pair among ${pairs.length} verified pairs")
  }

  test("d55: snapshot diff is one full-outer SMJ on doc_id — no nested loop, no window") {
    val p = plan("d55_snapshot_diff")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("Window"),
      p.linesIterator.take(25).mkString("\n"))
  }

  test("d37: shard offsets join as a broadcast (model-sized side)") {
    assert(plan("d37_split_sharded").contains("BroadcastHashJoin"))
  }

  test("a2: conditional filters are pushed into the CSV scan (PushedFilters)") {
    val p = plan("a2_filter_conditionals")
    assert(p.contains("PushedFilters: ["), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("PushedFilters: []"),
      "scan shows an EMPTY pushed-filter list")
  }

  test("b10: rank filter plans as WindowGroupLimit (per-partition top-k)") {
    assert(plan("b10_topk_per_group").contains("WindowGroupLimit"))
  }

  test("b11: global sort+limit plans as TakeOrderedAndProject (no full sort)") {
    assert(plan("b11_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("b4/c3/d3: the small side is broadcast") {
    for (q <- Seq("b4_broadcast_join", "c3_similarity_topk", "d3_knn_join")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"), s"$q lost its broadcast")
    }
  }

  test("b22 as-of join plans as a window pass — no join operator at all") {
    val p = plan("b22_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("Join"), "as-of should be the union+window shape, not a join")
  }

  test("b24 range join stays on the bucketed equi-join (no nested loop)") {
    val p = plan("b24_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join fell back to a non-equi nested loop")
  }

  test("b26 cube plans as ONE expand + aggregate (no per-grouping-set union)") {
    val p = plan("b26_cube")
    assert(p.contains("Expand"))
    assert(p.linesIterator.count(_.contains("Expand")) == 1,
      "cube expanded into more than one Expand node")
    assert(!p.contains("Union"), "cube fell back to a union of grouping sets")
  }

  test("b27 UDAF rides partial aggregation (map-side histogram combine)") {
    val p = plan("b27_udaf_wmedian")
    assert(p.contains("ObjectHashAggregate"), "typed Aggregator lost its hash-agg plan")
    assert(p.toLowerCase.contains("partial_weightedmedian"),
      "UDAF is not partially aggregated — every row would shuffle")
  }

  test("b28 ALL-semantics set ops plan as aggregates, not joins") {
    val p = plan("b28_set_ops_all")
    assert(!p.contains("Join"), "intersectAll/exceptAll planned a join")
    assert(p.contains("Generate"), "count-based replication (Generate) missing")
  }

  test("b32/d15/d20: window passes AND any aggregate ride ONE data shuffle") {
    // the only other Exchange is the final ORDER BY's range partitioning
    for (q <- Seq("b32_sessionize", "d15_stratified_split", "d20_pack_sequences")) {
      val p = plan(q)
      val exchanges = p.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("ReusedExchange"))
      assert(exchanges == 2, s"$q: expected data+sort exchanges only, got $exchanges")
    }
  }

  test("d56: the funnel's repeated stage frames REUSE exchanges, not recompute") {
    // gate is counted in rows 1 AND 2, kept in rows 2 AND 3 — the
    // "cannot disagree with the pipeline" doc implicitly relies on the
    // second reference of each stage reusing the first's result (cost ≈
    // d22 + ε). Under AQE the reuse materializes at RUNTIME as reused
    // query stages (the initial plan shows none), so execute first and
    // inspect the final adaptive plan; a plan change that ever splits
    // the stage subtrees turns a silent 2× recompute into a failure here
    val df = graft.SparkEntry.queries("d56_pipeline_funnel")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val reused = p.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("ReusedQueryStage") ||
        l.contains("StageReuse") || l.contains("reused"))
    assert(reused >= 2,
      s"expected the gate and kept stages to be reused (>= 2), got $reused\n$p")
  }

  test("d19: benchmark-source predicate and column pruning reach the parquet scan") {
    val p = plan("d19_decontaminate")
    assert(p.contains("PushedFilters: [IsNotNull(source)"),
      "source filter not pushed to the documents scan")
    assert(!p.contains("n_chars"),
      "documents scan reads columns the query never uses")
  }

  test("d33: ADC shortlist prunes map-side (partial WindowGroupLimit at C)") {
    // the shortlist bound under adversarial density is a PLAN property:
    // the top-C rank filter must apply per-task BEFORE the qid exchange,
    // so a dense embedding region can never send more than C rows per
    // query per task into the shuffle (the volume half of the skew story;
    // the recall half is measured in PipelineOpsSpec's dense-cell test)
    val p = plan("d33_ann_pq")
    assert(p.contains("row_number(), 50, Partial"),
      "ADC top-C must prune before the exchange")
    assert(p.contains("row_number(), 5, Final"), "rerank top-5 limit")
  }

  test("d93: both keep stages prune map-side (two WindowGroupLimits); c14 is shuffle-free") {
    // the compose's scale claim made structural: d92's keeper rule and
    // d91's cap rule must BOTH plan as WindowGroupLimit (≤ k rows per
    // key per task into each exchange), and c14's harvest must be a pure
    // per-row projection — its only exchange the presentation sort
    val p93 = plan("d93_url_pipeline_e2e")
    val wgl = p93.linesIterator.count(_.contains("WindowGroupLimit"))
    assert(wgl >= 2, s"expected both keep stages as WindowGroupLimit, saw $wgl")
    val p14 = plan("c14_outlink_harvest")
    val exchanges = p14.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))
    assert(exchanges == 1, s"c14 must be scan-side up to the presentation " +
      s"sort, saw $exchanges exchanges:\n" +
      p14.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!p14.contains("Join") && !p14.contains("HashAggregate"),
      "c14 must not join or aggregate")
  }

  test("d97: robots parse is HOST-grouped; cap prunes map-side; one sort feeds both windows") {
    // c15's scale note made structural (r20): the robots construct+parse
    // must consume the domains-sized DISTINCT frame — at 100 TB the
    // difference between parsing billions of identical texts (docs) and
    // millions of distinct ones (hosts) — with decisions broadcast back.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
    val qe = graft.SparkEntry.queries("d97_fetch_plan")(spark, sf)
      .queryExecution
    val parseNodes = qe.optimizedPlan.collect { case p: Project
      if p.projectList.exists(_.toString.contains("Disallow")) => p }
    assert(parseNodes.nonEmpty, "robots construct/parse projection not found")
    parseNodes.foreach { p =>
      assert(p.child.collect { case a: Aggregate => a }.nonEmpty,
        "the robots parse must sit above the domains DISTINCT, " +
          "not on the URL frame")
    }
    val pp = qe.executedPlan.toString
    assert(pp.contains("WindowGroupLimit"),
      "the per-host cap must prune map-side")
    assert(pp.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("Inner")),
      "host decisions must broadcast back to the URL rows")
    // the cumsum window rides the cap window's sort: exactly the cap's
    // two sorts (partial+final around its exchange) plus the
    // presentation sort — no sort of its own
    val sorts = pp.linesIterator.count(l => l.trim.startsWith("+- Sort") ||
      l.trim.startsWith(":- Sort") || l.trim.startsWith("Sort "))
    assert(sorts <= 3, s"cumsum must reuse the cap's sort order, saw $sorts:\n" +
      pp.linesIterator.filter(_.contains("Sort")).mkString("\n"))
  }

  test("c17: sitemap construct/walk is HOST-grouped; census join broadcasts") {
    // the d97 discipline at the sitemap input: the robots/urlset
    // construction and both extractions must consume the domains-sized
    // groupBy frame, never the doc frame — at 100 TB a per-doc sitemap
    // construct would re-render the same XML docs/host times
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
    val qe = graft.SparkEntry.queries("c17_sitemap_discover")(spark, sf)
      .queryExecution
    // the construct may live in a Project ABOVE the per-domain groupBy
    // or collapse INTO the Aggregate's own expressions (optimizer-
    // version dependent) — both are host-grouped; on the doc frame it
    // would sit under no Aggregate at all
    val constructNodes = qe.optimizedPlan.collect {
      case p: Project
        if p.projectList.exists(_.toString.contains("sitemap.xml")) =>
          p.child
      case a: Aggregate
        if a.aggregateExpressions.exists(
          _.toString.contains("sitemap.xml")) => a
    }
    assert(constructNodes.nonEmpty,
      "sitemap construct/walk node not found")
    constructNodes.foreach { n =>
      assert(n.collect { case a: Aggregate => a }.nonEmpty,
        "the sitemap construct must sit on or above the per-domain " +
          "groupBy, not on the doc frame")
    }
    val pp = qe.executedPlan.toString
    assert(pp.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("Inner")),
      "the domains-sized census join must broadcast")
  }

  test("d100: cleaned corpus rides the checkpoint barrier; schedule keeps d97's shapes") {
    // the d99-rule barrier is load-bearing for COST here (without it
    // both gopher-join sides re-run construct+markup — measured 10.1 vs
    // 7.9 s at sf0.1) and the schedule must keep d97's map-side cap and
    // broadcast-back shapes
    val pp = graft.SparkEntry.queries("d100_gated_frontier_plan")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pp.contains("ExistingRDD"),
      "the cleaned corpus must sit behind the lazy-checkpoint barrier " +
        "(LogicalRDD leaf)")
    assert(pp.contains("WindowGroupLimit"),
      "the per-host cap must prune map-side")
    assert(pp.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("Inner")),
      "host decisions must broadcast back to the URL rows")
  }

  test("d44/d46: attribution and keep-best rules plan as WindowGroupLimit") {
    // d44's top-1 benchmark attribution and d46's one-survivor-per-cluster
    // rule must both prune map-side before their shuffles — at 100 TB the
    // pair/cluster frames are the big relations, the survivors tiny
    assert(plan("d44_contamination_report").contains("WindowGroupLimit"))
    assert(plan("d46_dedup_keep_best").contains("WindowGroupLimit"))
  }

  test("d48: exact kNN top-5 runs as partial+final heap operators") {
    // the triangular block self-join emits O(n²/B²) rows per task; the
    // top-5 must prune per task BEFORE the qid exchange (partial heap,
    // ≤5 rows per (query, task) into the shuffle) with the final heap
    // after — the b37 operator pair, O(rows) vs the window plan's
    // per-task sorts (measured 7.8 → 2.1 s at sf0.1)
    val p = plan("d48_label_knn")
    assert("TopKPerGroup".r.findAllIn(p).size >= 2,
      "both partial and final heap stages expected")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "all-pairs must meet on block equi-keys, not a cross")
  }

  test("d16/d17: rank-limited queries plan as WindowGroupLimit") {
    assert(plan("d16_tfidf").contains("WindowGroupLimit"))
    assert(plan("d17_quota_sample").contains("WindowGroupLimit"),
      "quota cap must drop beyond-K rows before the shuffle")
  }

  test("d50: global-max-quota pre-prune plans as WindowGroupLimit") {
    // the varying per-source cap itself can't be a WindowGroupLimit; the
    // rank ≤ k_max literal (read from the sources-row stat action) must
    // be — it bounds the shuffle at k_max rows per (source, task) before
    // the exact per-source filter
    assert(plan("d50_temperature_sample").contains("WindowGroupLimit"))
  }

  test("no B/C/D query plans a nested loop except the intended small-broadcast crosses") {
    // c3 broadcasts a 1-row query vector, d3 a bounded query set, d11 the
    // centroid table, d16 a 1-row corpus-count aggregate — a cross against
    // a broadcast tiny side is the right plan. Everything else must stay
    // on equi-keys.
    // d33 broadcasts the bounded query set against PQ-reconstructed
    // vectors (d3's pattern, stage 1 of the two-stage retrieval);
    // d27/d39 broadcast the k-row centroid table for the serving-path
    // argmin assignment (d11's centroid pattern); d36's brute/pre
    // branches broadcast the bounded query set (d35's pattern)
    // d45 broadcasts the same 1-row corpus-count aggregate as d16
    // d50 crosses the sources-row quota frame with 1-row corpus-count
    // and weight-sum aggregates (d16's pattern, twice)
    val allowedCross = Set("c3_similarity_topk", "d3_knn_join", "d11_ann_ivf",
      "d16_tfidf", "d33_ann_pq", "d35_filtered_knn", "d27_kmeans",
      "d39_semdedup", "d36_filtered_ann", "d45_token_rarity",
      "d50_temperature_sample",
      // d51 broadcasts the centroid rows (d27's serving argmin) and a
      // 1-row totals aggregate
      "d51_embedding_drift",
      // d56 crosses pairs of 1-row stage-count aggregates (d16's pattern,
      // three times — the whole report is 3 rows)
      "d56_pipeline_funnel",
      // d62 broadcasts the bounded query set against the corpus with the
      // self-pair exclusion as the join condition (d3's exact pattern)
      "d62_hard_negatives",
      // d60 inherits d11's broadcast-centroid cross through
      // ivfCandidatePairs (cell assignment scores every vector against
      // the broadcast centroid table)
      "d60_ann_ivfpq",
      // d66 crosses each ≤5-row top-k frame with its 1-row total
      // aggregate (d16's pattern, once per profiled key)
      "d66_skew_report",
      // d72 crosses the per-source frame with the 1-row corpus-total
      // aggregate (d16's pattern)
      "d72_source_divergence",
      // b49 crosses customers with the 1-row global-average aggregate,
      // b50 the per-supplier revenue frame with the 1-row max — both
      // d16's broadcast-scalar pattern (round 14)
      "b49_tpch_q22", "b50_tpch_q15",
      // b59 crosses the per-part value frame with the 1-row nation
      // total (Q11's global threshold — b49's pattern, round 16)
      "b59_tpch_q11",
      // c10 crosses each modality's 1-row census aggregates (d16's
      // pattern, once per card row — the whole report is 6 rows)
      "c10_media_dedup_card",
      // d90 crosses five 1-row stage aggregates into the ONE metrics
      // row its 4 funnel rows inline-explode from (d56's pattern +
      // c10's volume columns, round 18)
      "d90_media_pipeline_e2e",
      // d93 crosses four 1-row stage aggregates into its URL-funnel
      // metrics row (d90's pattern at the URL modality, round 19)
      "d93_url_pipeline_e2e",
      // d94 crosses four 1-row stage aggregates per modality (d90's
      // pattern at the audio/video modalities, round 19)
      "d94_av_pipeline_e2e",
      // d96 crosses five 1-row stage aggregates into its crawl-ingest
      // funnel metrics row (d90's pattern, round 19)
      "d96_crawl_ingest_e2e",
      // d99 is d96's funnel re-entered from the WARC walk — the same
      // five 1-row stage-aggregate crosses (round 20)
      "d99_warc_pipeline_e2e")
    val swept = (GroupB.queries.keySet ++ GroupC.queries.keySet ++
      GroupD.queries.keySet) -- allowedCross
    for (q <- swept.toSeq.sorted) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }
}
