package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** REAL grid-luma feature extraction from image bytes
  * (`array<double>`, 72 elements; NULL when no native decode accepts
  * the container) — the multimodal mandate's feature-extract step run
  * on the engine's own pixel decodes instead of the rolling-hash stub:
  * the vector IS the row-major 8×9 box-averaged integer luma grid the
  * dHash family compresses to 64 bits ([[BmpDhash.cells]] /
  * [[PngDhash.cells]] / [[GifDhash.cells]] — one definition per
  * format, the [[Dhash64]] sharing discipline one level up), so
  * features from a BMP, a PNG and a GIF of the SAME pixels are
  * IDENTICAL and the downstream embedding machinery (cosine dedup,
  * kNN/ANN, k-means) dedups across container formats for free.
  *
  * Format dispatch is by signature, exactly [[graft.queries.GroupD]]'s
  * d86 `coalesce` pattern collapsed into one kernel: each decode
  * refuses foreign containers at its magic bytes, so ONE real decode
  * runs per asset. Values are exact small integers (0–255 luma means)
  * carried as doubles, so every downstream dot/norm accumulation is
  * EXACT (all partial sums far inside 2⁵³) and an oracle can re-derive
  * the features arithmetically — the constructed-bytes discipline
  * extends from hashes to feature vectors.
  */
case class GridLumaCells(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_grid_luma"

  override def nullSafeEval(input: Any): Any = {
    val v = GridLumaCells.scan(input.asInstanceOf[Array[Byte]])
    if (v == null) null else UnsafeArrayData.fromPrimitiveArray(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val v = ctx.freshName("cells")
      s"""
         |double[] $v = graft.functions.GridLumaCells.scan($bytes);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : GridLumaCells = copy(child = newChild)
}

object GridLumaCells {
  /** Signature-dispatched cell decode; static so generated code calls
    * it directly. Returns the 72 luma cells as exact-integer doubles,
    * or null when no format leg accepts the bytes.
    */
  def scan(b: Array[Byte]): Array[Double] = {
    var c = BmpDhash.cells(b)
    if (c == null) c = PngDhash.cells(b)
    if (c == null) c = GifDhash.cells(b)
    if (c == null) return null
    val out = new Array[Double](c.length)
    var i = 0
    while (i < c.length) {
      out(i) = c(i).toDouble
      i += 1
    }
    out
  }
}

/** REAL energy/luma ENVELOPE feature extraction from audio/video bytes
  * (`array<double>`, 65 elements; NULL when neither sample decode
  * accepts the container) — [[GridLumaCells]]'s sibling for the time
  * axis: the vector is the 65-window envelope the perceptual hashes
  * compare ([[WavEnergyHash.envelope]] — Σ|sample| per window — for
  * PCM WAV, [[Y4mEnvelopeHash.envelope]] — per-frame luma sums per
  * window — for YUV4MPEG2), over the stream trimmed to a multiple of
  * 65 so windows are equal-sized and the raw integer sums are a
  * positive scalar multiple of the window MEANS: scale-invariant
  * consumers (cosine, the ANN family) see exactly the mean envelope
  * while every value stays an exact integer.
  *
  * Window sums can exceed float32's 24-bit exact-integer range (a
  * window of 2¹⁶ samples at full scale sums to ~2³¹), so the envelope
  * rides doubles end to end — exact to 2⁵³, which the
  * [[WavEnergyHash]] work caps keep every sum far inside.
  */
case class MediaEnvelope(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_media_envelope"

  override def nullSafeEval(input: Any): Any = {
    val v = MediaEnvelope.scan(input.asInstanceOf[Array[Byte]])
    if (v == null) null else UnsafeArrayData.fromPrimitiveArray(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val v = ctx.freshName("env")
      s"""
         |double[] $v = graft.functions.MediaEnvelope.scan($bytes);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MediaEnvelope = copy(child = newChild)
}

object MediaEnvelope {
  /** Signature-dispatched envelope decode; static so generated code
    * calls it directly. Returns the 65 window sums as exact-integer
    * doubles, or null when neither format leg accepts the bytes.
    */
  def scan(b: Array[Byte]): Array[Double] = {
    var e = WavEnergyHash.envelope(b)
    if (e == null) e = Y4mEnvelopeHash.envelope(b)
    if (e == null) return null
    val out = new Array[Double](e.length)
    var i = 0
    while (i < e.length) {
      out(i) = e(i).toDouble
      i += 1
    }
    out
  }
}
