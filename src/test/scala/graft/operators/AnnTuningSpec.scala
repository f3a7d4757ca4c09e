package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnTuning.{ConfigStats, LshConfig, Tuned}

/** Pure-policy tests for the ANN tuner: choose()'s three-tier selection
  * and the measured-stats cap decision, independent of any Spark job
  * (the sampled-stats integration is pinned in PipelineOpsSpec).
  */
class AnnTuningSpec extends AnyFunSuite {
  private def s(t: Int, b: Int, frac: Double, rec: Double) =
    ConfigStats(LshConfig(t, b), frac, rec)

  test("choose picks the CHEAPEST config meeting recall within budget") {
    val stats = Seq(
      s(24, 3, 0.90, 0.99), s(20, 4, 0.20, 0.95),
      s(16, 5, 0.10, 0.92), s(8, 8, 0.01, 0.40))
    // both 20x4 and 16x5 meet recall 0.9 within budget 0.25 → cheapest wins
    assert(AnnTuning.choose(stats, 0.9, 0.25).config == LshConfig(16, 5))
  }

  test("choose lets recall win when the budget is unreachable") {
    val stats = Seq(
      s(24, 3, 0.95, 0.99), s(20, 4, 0.72, 0.96), s(8, 8, 0.04, 0.16))
    // nothing meets recall 0.9 at fraction <= 0.25 → cheapest recall-meeting
    assert(AnnTuning.choose(stats, 0.9, 0.25).config == LshConfig(20, 4))
  }

  test("choose falls back to best recall when the target is unreachable") {
    val stats = Seq(s(20, 4, 0.30, 0.55), s(8, 8, 0.05, 0.62))
    assert(AnnTuning.choose(stats, 0.9, 0.25).config == LshConfig(8, 8))
    // tie on recall → cheaper fraction wins
    val tied = Seq(s(20, 4, 0.30, 0.60), s(8, 8, 0.05, 0.60))
    assert(AnnTuning.choose(tied, 0.9, 0.25).config == LshConfig(8, 8))
  }

  test("effectiveCap engages only when a bucket would actually exceed it") {
    // sampled max bucket 6% of a 10k corpus = 600 rows < 2048/2 headroom
    val small = Tuned(ConfigStats(LshConfig(20, 4), 0.7, 0.95, 0.06), 10000L)
    assert(AnnTuning.effectiveCap(small) == Int.MaxValue)
    // same fraction on a 100k corpus = 6000 rows → guard on
    val big = Tuned(ConfigStats(LshConfig(20, 4), 0.7, 0.95, 0.06), 100000L)
    assert(AnnTuning.effectiveCap(big) == AnnTuning.DefaultBucketCap)
  }
}
