package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine-similarity expression over two `array<double>` columns.
  *
  * Replaces the `zip_with` + three `aggregate` higher-order folds the
  * declarative formulation needs: HOFs evaluate one interpreted lambda
  * call per element and allocate an intermediate array per row, while this
  * expression emits one fused whole-stage-codegen loop — no allocation,
  * no virtual calls — which is what a 100 TB similarity scan needs.
  *
  * Numerics on equal-length, nonzero-norm inputs are IDENTICAL to the fold
  * formulation and to DuckDB's `list_cosine_similarity` (verified
  * bit-equal): each accumulator (dot, |a|², |b|²) receives the same
  * additions in the same left-to-right order, then
  * `dot / (sqrt(na) * sqrt(nb))`, clamped to [-1, 1].
  *
  * Edge-case contract (explicit, where DuckDB raises an error):
  *   - mismatched array lengths → NULL (never a silent min-length truncation);
  *   - a zero-norm input vector → NULL (cosine is undefined; NaN must not
  *     leak through the clamp).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // NULL is produced for defined inputs (mismatch / zero norm), not only
  // propagated from null children.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      // NULL, never NaN (r18 review): Inf/Inf (both accumulators
      // overflowing) and NaN lanes previously leaked NaN through the
      // clamp, poisoning downstream comparisons the doc promises are
      // clamped; a finite-overflow quotient (Inf/finite) still clamps
      val r = dot / denom
      if (denom == 0.0 || java.lang.Double.isNaN(r)) null
      else math.max(-1.0, math.min(1.0, r))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  double ${denom}_r = $dot / $denom;
         |  if ($denom == 0.0 || java.lang.Double.isNaN(${denom}_r)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = java.lang.Math.max(-1.0, java.lang.Math.min(1.0, ${denom}_r));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native expressions into a session's function
  * registry, so `expr("graft_cosine(a, b)")` resolves like a builtin.
  * Idempotent — call per query; temp functions are session-scoped.
  */
object GraftFunctions {
  val CosineName = "graft_cosine"
  val MinHashName = "graft_minhash64"
  val LshKeysName = "graft_lsh_keys"
  val LshProbeKeysName = "graft_lsh_probe_keys"
  val SimHashName = "graft_simhash32"
  val PlainDoubleName = "graft_plain_double"
  val BloomName = "graft_bloom_contains"
  val JpegDimsName = "graft_jpeg_dims"
  val WebpDimsName = "graft_webp_dims"
  val BmpDhashName = "graft_bmp_dhash"
  val PngDhashName = "graft_png_dhash"
  val GifDhashName = "graft_gif_dhash"
  val BmpResizeName = "graft_bmp_resize"
  val WavEnergyHashName = "graft_wav_ehash"
  val Y4mEnvelopeHashName = "graft_y4m_ehash"
  val JpegExifOrientationName = "graft_jpeg_exif_orientation"
  val CmsCountName = "graft_cms_count"
  val SigMatchName = "graft_sig_matches"
  val WavMetaName = "graft_wav_meta"
  val Mp4MetaName = "graft_mp4_meta"
  val FlacMetaName = "graft_flac_meta"
  val Mp3MetaName = "graft_mp3_meta"
  val OpusMetaName = "graft_opus_meta"
  val MkvMetaName = "graft_mkv_meta"
  val NearestCentroidName = "graft_nearest_centroid"
  val ShingleHashesName = "graft_shingle_hashes"
  val GridLumaCellsName = "graft_grid_luma"
  val MediaEnvelopeName = "graft_media_envelope"

  /** Fixed seeded permutation constants for the 64-perm MinHash (a < 2³¹
    * keeps the affine product inside a long; see [[MinHashSignature]]).
    */
  val (minhashA, minhashB): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(42)
    (Seq.fill(64)(1L + rnd.nextInt(Int.MaxValue - 1)),
      Seq.fill(64)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Literal int extraction shared by every registration taking scalar
    * int parameters (one definition — review finding r14; the Long case
    * range-checks instead of silently truncating).
    */
  private def intArg(fn: String)(e: Expression, name: String): Int = {
    require(e.foldable, s"$fn: '$name' must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long =>
        require(l.isValidInt, s"$fn: '$name' out of int range: $l")
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: '$name' must be an integer literal, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(CosineName,
      { exprs =>
        require(exprs.length == 2, s"$CosineName expects 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction(NearestCentroidName,
      { exprs =>
        require(exprs.length == 2,
          s"$NearestCentroidName expects (array<double>, array<array<double>>)")
        NearestCentroid(exprs.head, exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction(MinHashName,
      { exprs =>
        require(exprs.length == 1, s"$MinHashName expects 1 argument")
        MinHashSignature(exprs.head, minhashA, minhashB)
      }, "built-in")
    reg.createOrReplaceTempFunction(SimHashName,
      { exprs =>
        require(exprs.length == 1, s"$SimHashName expects 1 argument")
        SimHashSignature(exprs.head, 32)
      }, "built-in")
    reg.createOrReplaceTempFunction(PlainDoubleName,
      { exprs =>
        require(exprs.length == 1, s"$PlainDoubleName expects 1 argument")
        PlainDoubleString(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(LshKeysName,
      { exprs =>
        require(exprs.length == 3,
          s"$LshKeysName expects (array<double>, tables, bits)")
        val arg = intArg(LshKeysName) _
        HyperplaneLshKeys(exprs.head,
          arg(exprs(1), "tables"), arg(exprs(2), "bits"))
      }, "built-in")
    reg.createOrReplaceTempFunction(LshProbeKeysName,
      { exprs =>
        require(exprs.length == 4,
          s"$LshProbeKeysName expects (array<double>, tables, bits, probes)")
        val arg = intArg(LshProbeKeysName) _
        HyperplaneLshProbeKeys(exprs.head, arg(exprs(1), "tables"),
          arg(exprs(2), "bits"), arg(exprs(3), "probes"))
      }, "built-in")
    reg.createOrReplaceTempFunction(BloomName,
      { exprs =>
        require(exprs.length == 2, s"$BloomName expects (binary, bigint)")
        BloomContains(exprs.head, exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction(JpegDimsName,
      { exprs =>
        require(exprs.length == 1, s"$JpegDimsName expects 1 argument")
        JpegDims(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(WebpDimsName,
      { exprs =>
        require(exprs.length == 1, s"$WebpDimsName expects 1 argument")
        WebpDims(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(BmpDhashName,
      { exprs =>
        require(exprs.length == 1, s"$BmpDhashName expects 1 argument")
        BmpDhash(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(PngDhashName,
      { exprs =>
        require(exprs.length == 1, s"$PngDhashName expects 1 argument")
        PngDhash(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(GifDhashName,
      { exprs =>
        require(exprs.length == 1, s"$GifDhashName expects 1 argument")
        GifDhash(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(WavEnergyHashName,
      { exprs =>
        require(exprs.length == 1, s"$WavEnergyHashName expects 1 argument")
        WavEnergyHash(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(Y4mEnvelopeHashName,
      { exprs =>
        require(exprs.length == 1, s"$Y4mEnvelopeHashName expects 1 argument")
        Y4mEnvelopeHash(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(BmpResizeName,
      { exprs =>
        require(exprs.length == 3,
          s"$BmpResizeName expects (binary, targetW, targetH)")
        val arg = intArg(BmpResizeName) _
        BmpResize(exprs.head, arg(exprs(1), "targetW"),
          arg(exprs(2), "targetH"))
      }, "built-in")
    reg.createOrReplaceTempFunction(JpegExifOrientationName,
      { exprs =>
        require(exprs.length == 1,
          s"$JpegExifOrientationName expects 1 argument")
        JpegExifOrientation(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(CmsCountName,
      { exprs =>
        require(exprs.length == 2, s"$CmsCountName expects (binary, bigint)")
        CmsCount(exprs.head, exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction(SigMatchName,
      { exprs =>
        require(exprs.length == 2,
          s"$SigMatchName expects (array<bigint>, array<bigint>)")
        SigMatchCount(exprs.head, exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction(WavMetaName,
      { exprs =>
        require(exprs.length == 1, s"$WavMetaName expects 1 argument")
        WavMeta(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(Mp4MetaName,
      { exprs =>
        require(exprs.length == 1, s"$Mp4MetaName expects 1 argument")
        Mp4Meta(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(FlacMetaName,
      { exprs =>
        require(exprs.length == 1, s"$FlacMetaName expects 1 argument")
        FlacMeta(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(Mp3MetaName,
      { exprs =>
        require(exprs.length == 1, s"$Mp3MetaName expects 1 argument")
        Mp3Meta(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(OpusMetaName,
      { exprs =>
        require(exprs.length == 1, s"$OpusMetaName expects 1 argument")
        OggOpusMeta(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(MkvMetaName,
      { exprs =>
        require(exprs.length == 1, s"$MkvMetaName expects 1 argument")
        MkvMeta(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(ShingleHashesName,
      { exprs =>
        require(exprs.length == 1, s"$ShingleHashesName expects 1 argument")
        ShingleHashes(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(GridLumaCellsName,
      { exprs =>
        require(exprs.length == 1, s"$GridLumaCellsName expects 1 argument")
        GridLumaCells(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction(MediaEnvelopeName,
      { exprs =>
        require(exprs.length == 1, s"$MediaEnvelopeName expects 1 argument")
        MediaEnvelope(exprs.head)
      }, "built-in")
  }
}
