package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency estimate from a serialized [[CountMinSketch]] — the
  * fixed-size stand-in for a frequency TABLE. `left` must be a FOLDABLE
  * binary column holding `CountMinSketch.toByteArray` bytes (a literal
  * baked into the plan, shipped once per executor); `right` is the 64-bit
  * key to probe. The estimate NEVER undercounts (CMS error is one-sided:
  * estimate ≥ true count, within ε·N at the configured confidence), so a
  * `estimate < floor` gate can only move items from out-of-vocabulary to
  * in-vocabulary — callers reason about exactly one error direction.
  *
  * Why this beats materializing the frequency table at 100 TB: a corpus
  * vocabulary table scales with DISTINCT keys (and must shuffle + join),
  * while the sketch is a fixed depth×width counter grid (a few MB at
  * ε=10⁻⁴) that broadcasts with the task binary and is probed at scan
  * speed inside whole-stage codegen — [[BloomContains]]'s discipline with
  * counts instead of membership.
  */
case class CmsCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: the sketch argument must be a literal (foldable)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_count"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(left.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(bits: Any, value: Any): Any =
    sketch.estimateCount(value.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, value) => {
      // NULL-literal sketch: don't force the lazy deserialization at
      // planning time (BloomContains' r18 rule — the body never runs)
      if (left.eval() == null) s"${ev.value} = 0L;"
      else {
        val f = ctx.addReferenceObj("graftCms", sketch,
          classOf[CountMinSketch].getName)
        s"${ev.value} = $f.estimateCount((Object) java.lang.Long.valueOf($value));"
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsCount =
    copy(left = newLeft, right = newRight)
}

object CmsCount {
  /** Build a count-min sketch over a bigint column and return its
    * serialized bytes, ready to embed as a binary literal. One pass over
    * the build side; the result size is depth×width counters regardless
    * of input size. Fixed seed ⇒ deterministic (counter merges are
    * additive, so partitioning cannot change the result).
    */
  def serialized(df: org.apache.spark.sql.DataFrame, colName: String,
      eps: Double = 1e-4, confidence: Double = 0.99): Array[Byte] =
    df.stat.countMinSketch(colName, eps, confidence, seed = 42).toByteArray
}
