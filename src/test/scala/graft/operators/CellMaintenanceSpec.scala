package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.concurrent.Eventually.{eventually, timeout}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}

import graft.TestSpark

/** [[CellMaintenance.splitCells]]: the drift-triggered cell split must
  * leave unflagged cells bit-identical, separate a planted drifted mode
  * into its own cell (recall preserved, probe cost down — the IVF win),
  * stay deterministic, and touch only flagged members after the one
  * assignment scan.
  */
class CellMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 16
  private def unit(v: Array[Double]) = {
    val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
  }
  /** 4 well-separated directions; ref occupies 0–2, the delta drifts into
    * direction 3 (a NEW mode the standing model has never seen).
    */
  private lazy val bases = {
    val rnd = new scala.util.Random(5353)
    Array.fill(4)(unit(Array.fill(dim)(rnd.nextGaussian())))
  }
  private def cluster(c: Int, n: Int, idBase: Long, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(m => (idBase + m,
      unit(bases(c).map(_ + 0.01 * rnd.nextGaussian())).map(_.toFloat)))
  }
  private lazy val refVecs = cluster(0, 40, 0L, 1) ++ cluster(1, 40, 100L, 2) ++
    cluster(2, 40, 200L, 3)
  private lazy val deltaVecs = cluster(3, 30, 1000L, 4)
  private def df(rows: Seq[(Long, Array[Float])]) =
    spark.createDataFrame(rows).toDF("vec_id", "embedding")

  private def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = -1; var bestD = Double.PositiveInfinity
    for (c <- cents.indices) {
      var d = 0.0; var i = 0
      while (i < dim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
    }
    best
  }

  private def fitStanding(): KMeans.Model = KMeans.fit(df(refVecs), k = 3, iters = 5)

  test("planted drifted mode gets its own cell; unflagged cells stay bit-identical") {
    val model = fitStanding()
    // the cell the drifted mass lands in (driver math, same argmin)
    val hot = nearest(model.centroids, unit(bases(3)))
    val combined = df(refVecs ++ deltaVecs)
    val res = CellMaintenance.splitCells(combined, model.centroids, Seq(hot))
    assert(res.centroids.length == 4)
    assert(res.children == Map(hot -> ((hot, 3))))
    for (c <- 0 until 3 if c != hot)
      assert(res.centroids(c).toSeq == model.centroids(c).toSeq,
        s"unflagged cell $c must be bit-identical")
    // the split must separate the two modes: every delta vector in one
    // child, every original member of the hot cell in the other
    val all = (refVecs ++ deltaVecs).map { case (id, e) =>
      id -> e.map(_.toDouble) }.toMap
    val hotRef = refVecs.filter { case (_, e) =>
      nearest(model.centroids, e.map(_.toDouble)) == hot }.map(_._1)
    val deltaCells = deltaVecs.map { case (id, _) =>
      nearest(res.centroids, all(id)) }.distinct
    val refCells = hotRef.map(id => nearest(res.centroids, all(id))).distinct
    assert(deltaCells.length == 1 && refCells.length == 1 &&
      deltaCells.head != refCells.head,
      s"split must separate the modes: delta→$deltaCells, ref→$refCells")

    // IVF probe economics: nprobe=1 recall non-decreasing, probe cost down.
    // True top-1 neighbor of each delta vector is another delta vector
    // (tight mode), so recall@1cell is 1.0 before AND after — the win is
    // the probed cell's size: before = hot cell (ref members + delta),
    // after = the delta mode's own cell.
    def cellSizes(cents: Array[Array[Double]]) =
      (refVecs ++ deltaVecs).groupBy { case (_, e) =>
        nearest(cents, e.map(_.toDouble)) }.view.mapValues(_.size).toMap
    val before = cellSizes(model.centroids)
    val after = cellSizes(res.centroids)
    def recallAndProbe(cents: Array[Array[Double]],
        sizes: Map[Int, Int]): (Int, Double) = {
      var hits = 0; var probed = 0.0
      for ((id, e) <- deltaVecs) {
        val v = e.map(_.toDouble)
        val trueNn = (refVecs ++ deltaVecs).filter(_._1 != id)
          .minBy { case (_, o) =>
            val w = o.map(_.toDouble)
            (v.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum, id)
          }._1
        val qc = nearest(cents, v)
        if (nearest(cents, all(trueNn)) == qc) hits += 1
        probed += sizes(qc)
      }
      (hits, probed / deltaVecs.size)
    }
    val (hitsBefore, probeBefore) = recallAndProbe(model.centroids, before)
    val (hitsAfter, probeAfter) = recallAndProbe(res.centroids, after)
    info(s"recall $hitsBefore→$hitsAfter/30, probed rows $probeBefore→$probeAfter")
    assert(hitsAfter >= hitsBefore, "maintenance must not cost recall")
    assert(probeAfter < probeBefore,
      s"split must shrink the probed cell: $probeBefore → $probeAfter")
  }

  test("deterministic across reruns and ModelStore/serving compatible") {
    val model = fitStanding()
    val hot = nearest(model.centroids, unit(bases(3)))
    val combined = df(refVecs ++ deltaVecs)
    val a = CellMaintenance.splitCells(combined, model.centroids, Seq(hot))
    val b = CellMaintenance.splitCells(combined, model.centroids, Seq(hot))
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    assert(a.children == b.children)
    // the maintained model round-trips through the standard store/serve
    // path (zero-retrain discipline is ModelStoreSpec's listener pin)
    val dir = TestSpark.tempDir("cm-model").toString
    ModelStore.saveKMeans(spark, dir, CellMaintenance.toModel(combined, a))
    val loaded = ModelStore.loadKMeans(spark, dir, combined)
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      a.centroids.map(_.toSeq).toSeq)
  }

  test("a flagged cell with fewer than two members stays unsplit (no dead duplicate centroid)") {
    val rnd = new scala.util.Random(5454)
    val lone = unit(Array.fill(dim)(rnd.nextGaussian()))
    val cents = Array(bases(0), bases(1), lone)
    val corpus = df(cluster(0, 20, 0L, 7) ++ cluster(1, 20, 100L, 8) ++
      Seq((999L, lone.map(_.toFloat))))
    val res = CellMaintenance.splitCells(corpus, cents, Seq(2))
    assert(res.centroids.length == 3 && res.children.isEmpty,
      "single-member cell must not append a permanently-empty child")
    assert(res.centroids.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
  }

  test("a cell whose min-id member is the farthest still splits into two live children (r18)") {
    // pre-fix: sa (min vec_id) and sb (max d2) were the SAME outlier
    // vector, the strict-< tie-break sent every member to child A, and
    // the "split" appended a dead duplicate centroid; now child B seeds
    // from a remaining member and the outlier separates from the core
    val outlier = Seq((1L, bases(3).map(_.toFloat))) // smallest id, far mode
    val core = cluster(0, 20, 100L, 9)
    val corpus = df(outlier ++ core)
    val cents = Array(bases(0), bases(1))
    val res = CellMaintenance.splitCells(corpus, cents, Seq(0))
    assert(res.children.contains(0), "flagged cell must split")
    val (ca, cb) = res.children(0)
    val byCell = KMeans.assignWith(corpus, res.centroids)
      .groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byCell.getOrElse(ca, 0L) > 0L && byCell.getOrElse(cb, 0L) > 0L,
      s"both children must receive members, got $byCell for ($ca, $cb)")
    // the outlier sits alone in its child
    val outCell = KMeans.assignWith(corpus, res.centroids)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 1L)
      .select("cluster").collect()(0).getInt(0)
    assert(byCell(outCell) == 1L, s"outlier must separate, got $byCell")
  }

  test("no flagged cells is a no-op without jobs; job count is bounded when flagged") {
    val model = fitStanding()
    val combined = df(refVecs ++ deltaVecs)
    val noop = jobsDuring {
      val r = CellMaintenance.splitCells(combined, model.centroids, Nil)
      assert(r.centroids.map(_.toSeq).toSeq ==
        model.centroids.map(_.toSeq).toSeq && r.children.isEmpty)
    }
    assert(noop.isEmpty, s"no-op must launch zero jobs, saw: $noop")
    // flagged: one assignment+seed pass plus a constant number of jobs
    // per Lloyd round (agg + broadcast of the flagged-sized seed frame) —
    // NEVER a full retrain (whose job count scales with iters over the
    // whole corpus AND pays k-sized shuffles; here the loop reads only
    // the persisted flagged members)
    val hot = nearest(model.centroids, unit(bases(3)))
    val jobs = jobsDuring {
      CellMaintenance.splitCells(combined, model.centroids, Seq(hot), iters = 3)
    }
    info(s"splitCells jobs: ${jobs.size}")
    // observed: assignment+persist+seeds ≈ 3, then ≤3 jobs per round
    // (seed-frame broadcast, AQE-staged aggregate) — constant in k and in
    // the unflagged corpus either way
    assert(jobs.size <= 4 + 3 * 3,
      s"job count ${jobs.size} exceeds the bounded-maintenance contract")
  }

  /** ModelStoreSpec's group-tagged job counter (see the rationale there). */
  private def jobsDuring(body: => Unit): Seq[String] = {
    val sc = spark.sparkContext
    val seen = new ConcurrentLinkedQueue[String]()
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        seen.add(js.properties.getProperty("spark.jobGroup.id", "") + "|" +
          js.properties.getProperty("spark.job.description", ""))
    }
    sc.addSparkListener(l)
    try {
      sc.setJobGroup("__cellmaint_body", "maintenance window")
      try body finally sc.clearJobGroup()
      sc.setJobDescription("__cellmaint_post")
      spark.range(1).count()
      sc.setJobDescription(null)
      eventually(timeout(Span(30, Seconds))) {
        assert(iterate(seen).exists(_.endsWith("|__cellmaint_post")))
      }
      iterate(seen).filter(_.startsWith("__cellmaint_body|"))
    } finally sc.removeSparkListener(l)
  }
  private def iterate(q: ConcurrentLinkedQueue[String]): Seq[String] = {
    val it = q.iterator(); val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
}
