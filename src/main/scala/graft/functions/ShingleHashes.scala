package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit word-3-gram shingle hashes of a text column — the
  * whole `xxhash64(concat_ws(' ', ts[i], ts[i+1], ts[i+2]))` over
  * `split(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' '))), ' ')`
  * pipeline (GroupC.shingles' per-doc semantics) fused into ONE native
  * scan, bit-identical to the declarative formulation (pinned in
  * ShingleHashesSpec against the SQL pipeline on real documents).
  *
  * Why a native expression and not the HOF chain: any consumer that puts
  * the shingle array's ALIAS into a filter condition (StreamDecon's
  * "drop flagged docs" filter — the d43 inline trap's pushdown variant)
  * gets the alias SUBSTITUTED into the per-element lambda by predicate
  * pushdown, re-running the regex tokenizer ~3× per array element per
  * row (measured 32 s for a 45k-doc tag-and-filter at sf0.1). This
  * expression tokenizes with one linear character scan — no regex, no
  * per-element re-evaluation — so it stays cheap WHEREVER Catalyst
  * copies it (measured 1.1 s, same result).
  *
  * Tokenizer equivalence argument (why the char scan = the regex
  * pipeline): `regexp_replace('[^a-zA-Z0-9]+', ' ')` collapses every
  * non-alphanumeric run to one space, `trim` drops boundary spaces, and
  * `split(' ')` then yields exactly the maximal ASCII-alphanumeric runs
  * in order — which is what the scan collects directly. A text with no
  * alphanumerics becomes [''] (one empty token) in the SQL form: size 1
  * < 3 → no shingles, same as the scan's empty token list. Lowercasing
  * only ever sees [A-Za-z0-9] characters, where ASCII toLowerCase and
  * UTF8String.toLowerCase agree.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      ShingleHashes.scan(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(
         |    graft.functions.ShingleHashes.scan($text));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** One linear pass: collect lowercased alphanumeric runs, hash each
    * consecutive 3-gram (space-joined, xxhash64 seed 42 — Spark's
    * `xxhash64` default), keep first occurrences. Static so generated
    * code calls it directly. Never null: no shingles = empty array.
    */
  def scan(text: UTF8String): Array[Long] = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9')
      if (alnum) sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      else if (sb.length > 0) { toks.add(sb.toString); sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) toks.add(sb.toString)
    val n = toks.size
    if (n < 3) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j + 2 < n) {
      val tri = toks.get(j) + " " + toks.get(j + 1) + " " + toks.get(j + 2)
      seen.add(XxHash64Function.hash(
        UTF8String.fromString(tri), StringType, 42L))
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}
