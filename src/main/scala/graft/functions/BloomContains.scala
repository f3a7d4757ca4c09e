package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized [[BloomFilter]] — the map-side
  * pre-filter of a semi-join, Spark's own runtime-row-filter pattern
  * expressed as a reusable function. `left` must be a FOLDABLE binary
  * column holding `BloomFilter.writeTo` bytes (a literal baked into the
  * plan, shipped once per executor with the task binary); `right` is the
  * 64-bit join key to probe. May return false positives (callers must
  * keep an exact verify join downstream); never false negatives.
  *
  * Why this beats joining directly at 100 TB: the probe runs BEFORE the
  * shuffle, at scan speed, inside whole-stage codegen — at a 1% FP rate
  * the exchange that feeds the semi-join carries ~1% of the non-matching
  * rows instead of all of them. The filter size scales with the SMALL
  * (build) side only, independent of corpus size.
  *
  * The filter deserializes once per executor (transient lazy val on the
  * plan-shipped expression) and is probed lock-free (`mightContainLong`
  * only reads the bit array).
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: the filter argument must be a literal (foldable)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bits: Any, value: Any): Any =
    filter.mightContainLong(value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, value) => {
      // a NULL literal filter must not NPE at PLANNING time by forcing
      // the lazy deserialization (r18 review); nullSafeCodeGen's null
      // check short-circuits this body for every row, so the emitted
      // statement never runs — it only has to compile
      if (left.eval() == null) s"${ev.value} = false;"
      else {
        val f = ctx.addReferenceObj("graftBloom", filter,
          classOf[BloomFilter].getName)
        s"${ev.value} = $f.mightContainLong($value);"
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  /** Build a bloom filter over a bigint column and return its serialized
    * bytes, ready to embed as a binary literal. Two small actions on the
    * BUILD side only (a count to size the filter exactly, then the sketch
    * aggregate) — by construction the build side of a bloom-pruned
    * semi-join is the small one, so neither action touches the corpus.
    */
  def serialized(df: org.apache.spark.sql.DataFrame, colName: String,
      fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(1000L, df.count())
    val bf = df.stat.bloomFilter(colName, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
