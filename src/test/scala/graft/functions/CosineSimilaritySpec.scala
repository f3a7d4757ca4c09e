package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Native cosine expression: numerics bit-equal with the higher-order-fold
  * formulation (the DuckDB-verified reference semantics), null-safe, and
  * codegen-compatible.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofCosine(a: String, b: String) = {
    val dot = s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    val na = s"aggregate($a, 0D, (acc, x) -> acc + x * x)"
    val nb = s"aggregate($b, 0D, (acc, x) -> acc + x * x)"
    expr(s"greatest(-1D, least(1D, $dot / (sqrt($na) * sqrt($nb))))")
  }

  private def vecs() = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 200).map(i => (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "v")
      .withColumn("q", expr("transform(v, x -> x * 0.5 + 0.1)"))
  }

  test("bit-equal with the higher-order-fold formulation on random vectors") {
    val df = vecs().select(
      expr(s"${GraftFunctions.CosineName}(v, q)").as("native"),
      hofCosine("v", "q").as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("self-similarity is ~1 and the clamp never lets it exceed 1.0") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val sims = vecs().select(expr(s"${GraftFunctions.CosineName}(v, v)").as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(s => s <= 1.0 && s > 1.0 - 1e-12))
    assert(sims.contains(1.0)) // at least one raw value >= 1 got clamped
  }

  test("null input yields null, not a crash") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
      .select(expr(s"${GraftFunctions.CosineName}(a, b)").as("s"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("mismatched array lengths yield null (no silent min-length truncation)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0)))
      .toDF("a", "b")
      .select(expr(s"${GraftFunctions.CosineName}(a, b)").as("s"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("a zero-norm vector yields null (cosine undefined; NaN must not pass the clamp)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq((Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(expr(s"${GraftFunctions.CosineName}(a, b)").as("s"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("opposite vectors clamp to exactly -1.0") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val v = Seq((Array(1.0, 2.0, -3.0), Array(-1.0, -2.0, 3.0)))
      .toDF("a", "b")
      .select(expr(s"${GraftFunctions.CosineName}(a, b)").as("s"))
      .collect().head.getDouble(0)
    assert(v == -1.0)
  }
}
