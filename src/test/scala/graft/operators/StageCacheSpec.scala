package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.GroupD

/** Pins the long-lived-cluster shared-frame policy (StageCache): with the
  * drivers' gate set, d22/d56/d61 serve their shared stage frames from ONE
  * persisted materialization per corpus, with output value-identical to
  * the raw declarative plans the suites otherwise exercise.
  */
class StageCacheSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("policy off by default in specs; on, results identical and cached") {
    assert(!StageCache.enabled)
    val rawPipeline = rows(GroupD.d22PipelineE2e(spark, sf))
    val rawFunnel = rows(GroupD.d56PipelineFunnel(spark, sf))
    val rawBudget = rows(GroupD.d61BudgetAssembly(spark, sf))
    sys.props("graft.model.cache") =
      TestSpark.tempDir("stage-cache-models").toString
    try {
      StageCache.clear()
      assert(StageCache.enabled)
      assert(rows(GroupD.d22PipelineE2e(spark, sf)) === rawPipeline)
      assert(rows(GroupD.d56PipelineFunnel(spark, sf)) === rawFunnel)
      assert(rows(GroupD.d61BudgetAssembly(spark, sf)) === rawBudget)
      // the funnel's plan must read the persisted stage frames, not
      // re-derive the dedup graph: InMemoryTableScan present
      val plan = GroupD.d56PipelineFunnel(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"))
    } finally {
      StageCache.clear()
      sys.props.remove("graft.model.cache")
    }
    assert(!StageCache.enabled)
  }

  test("the near-dup cluster family shares pairs + labels (round 13)") {
    assert(!StageCache.enabled)
    val rawPairs = rows(GroupD.d1DedupMinhashLsh(spark, sf))
    val rawClusters = rows(GroupD.d14DedupClusters(spark, sf))
    val rawKeepBest = rows(GroupD.d46DedupKeepBest(spark, sf))
    sys.props("graft.model.cache") =
      TestSpark.tempDir("stage-cache-models3").toString
    try {
      StageCache.clear()
      assert(rows(GroupD.d1DedupMinhashLsh(spark, sf)) === rawPairs)
      assert(rows(GroupD.d14DedupClusters(spark, sf)) === rawClusters)
      assert(rows(GroupD.d46DedupKeepBest(spark, sf)) === rawKeepBest)
      // keep-best must consume the persisted cluster frame, not re-run
      // the iterative propagation
      val plan = GroupD.d46DedupKeepBest(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"))
    } finally {
      StageCache.clear()
      sys.props.remove("graft.model.cache")
    }
  }

  test("a second persisted() call serves the same frame instance") {
    sys.props("graft.model.cache") =
      TestSpark.tempDir("stage-cache-models2").toString
    try {
      StageCache.clear()
      var builds = 0
      def build = {
        builds += 1
        spark.range(3).toDF("id")
      }
      val a = StageCache.persisted("k#one")(build)
      val b = StageCache.persisted("k#one")(build)
      assert(builds === 1)
      assert(a eq b)
      assert(a.storageLevel.useMemory || a.storageLevel.useDisk)
    } finally {
      StageCache.clear()
      sys.props.remove("graft.model.cache")
    }
  }

  test("release(corpus) unpins ONE corpus; others keep serving (round 14)") {
    sys.props("graft.model.cache") =
      TestSpark.tempDir("stage-cache-models4").toString
    try {
      StageCache.clear()
      var buildsA, buildsB = 0
      def bA = { buildsA += 1; spark.range(4).toDF("id") }
      def bB = { buildsB += 1; spark.range(5).toDF("id") }
      val a1 = StageCache.persisted("corpusA#stage")(bA)
      val b1 = StageCache.persisted("corpusB#stage")(bB)
      a1.count(); b1.count()
      assert(a1.storageLevel.useMemory || a1.storageLevel.useDisk)

      StageCache.release("corpusA")
      // corpusA's frame is unpinned (async unpersist → level eventually
      // NONE; the MARK is dropped immediately so a re-request rebuilds)
      val a2 = StageCache.persisted("corpusA#stage")(bA)
      assert(buildsA === 2, "released corpus must rebuild on next touch")
      assert(a2 ne a1)
      // corpusB untouched: same instance, no rebuild
      val b2 = StageCache.persisted("corpusB#stage")(bB)
      assert(buildsB === 1)
      assert(b2 eq b1)
      // releasing an unknown corpus is a no-op
      StageCache.release("corpusZ")
      assert(StageCache.persisted("corpusB#stage")(bB) eq b1)
    } finally {
      StageCache.clear()
      sys.props.remove("graft.model.cache")
    }
  }
}
