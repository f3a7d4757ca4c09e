package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench harness for A/B plan tuning:
  * `tools/run_main.sh graft.BenchOne <query> [passes] [sfDir]` — prints one
  * time per pass plus the min, without paying the full Bench sweep.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // match Bench's cache policy (r19): without this, a hub-consuming
    // query like c10 re-derives every StageCache'd pair frame per pass
    // and the isolated time measures the hubs, not the query — pass 1
    // shows population + query, later passes the steady state
    graft.operators.ModelCache.enableDefaultIfUnset()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val ts = (1 to passes).map { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"pass $i: $t%.2f s")
      t
    }
    println(f"min: ${ts.min}%.2f s")
    spark.stop()
  }
}
