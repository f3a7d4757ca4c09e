package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** MinHash signature over an array of element hashes: for each of
  * `numPerms` seeded affine permutations `(a·h32 + b) mod (2⁶¹−1)` keep
  * the minimum. The fused codegen loop replaces a nested
  * `transform(sequence, i -> array_min(transform(hs, ...)))` pair whose
  * interpreted lambdas box a long per element per permutation — the
  * difference between O(n·perms) primitive ops and O(n·perms) allocations.
  *
  * Seeds are constructor parameters (baked into the plan), so equal
  * expressions stay equal for plan canonicalization, and the signature is
  * deterministic run-to-run. Inputs are masked to 32 bits so the affine
  * product never overflows a long under ANSI semantics.
  */
case class MinHashSignature(child: Expression, seedsA: Seq[Long], seedsB: Seq[Long])
    extends UnaryExpression {
  require(seedsA.length == seedsB.length && seedsA.nonEmpty)
  private val numPerms = seedsA.length
  private val P = 2305843009213693951L // 2^61 - 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val aArr = seedsA.toArray
  @transient private lazy val bArr = seedsB.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var k = 0
    while (k < n) {
      val h = hs.getLong(k) & 4294967295L
      var i = 0
      while (i < numPerms) {
        val v = (aArr(i) * h + bArr(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val b = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $c.getLong($k) & 4294967295L;
         |  for (int $i = 0; $i < $numPerms; $i++) {
         |    long $v = ($a[$i] * $h + $b[$i]) % ${P}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket keys for a double vector: `tables` keys of
  * `bits` sign bits each. Hyperplane component (t, j, k) is ±1 derived
  * from a splitmix64 mix of the indices — deterministic, no stored model,
  * identical across runs and cluster sizes. Replaces a triple-nested
  * higher-order-function expression (aggregate ∘ aggregate ∘ transform)
  * with one fused primitive loop.
  */
case class HyperplaneLshKeys(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {
  require(tables > 0 && bits > 0 && bits < 63)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_keys"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < bits) {
        var dot = 0.0
        var k = 0
        while (k < dim) {
          dot += v.getDouble(k) * HyperplaneLshKeys.sign(t, j, k)
          k += 1
        }
        if (dot > 0) key |= (1L << j)
        j += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val dim = ctx.freshName("dim"); val keys = ctx.freshName("keys")
      val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val dot = ctx.freshName("dot")
      val key = ctx.freshName("key")
      val cls = HyperplaneLshKeys.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $dim = $c.numElements();
         |long[] $keys = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double $dot = 0.0;
         |    for (int $k = 0; $k < $dim; $k++) {
         |      $dot += $c.getDouble($k) * $cls.sign($t, $j, $k);
         |    }
         |    if ($dot > 0) $key |= (1L << $j);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshKeys =
    copy(child = newChild)
}

/** SimHash signature from weighted token hashes: input is
  * `array<struct<h: bigint, cnt: bigint>>` (one element per distinct
  * token), output the `bits`-wide signature as a long. Bit j is set when
  * the count-weighted vote of all tokens' j-th hash bits is positive —
  * identical semantics to the SQL formulation (`sum(cnt * (2*((h>>j)&1)-1))
  * > 0`) the DuckDB oracle runs, but as one fused loop instead of an
  * explode to tokens × bits rows through two aggregations.
  */
case class SimHashSignature(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits < 63)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _)
        if s.length == 2 && s.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<bigint,bigint>>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      // a null struct element votes for nothing, it must not NPE the
      // query (r18 review; the sibling array kernels likewise tolerate
      // null elements)
      if (row == null) { i += 1 }
      else {
      val h = row.getLong(0)
      val cnt = row.getLong(1)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += cnt else votes(j) -= cnt
        j += 1
      }
      i += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt"); val votes = ctx.freshName("votes")
      val row = ctx.freshName("row"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $c.numElements();
         |long[] $votes = new long[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $c.getStruct($i, 2);
         |  long $h = $row.getLong(0);
         |  long $cnt = $row.getLong(1);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $votes[$j] += $cnt; else $votes[$j] -= $cnt;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object HyperplaneLshKeys {
  /** splitmix64 finalizer over the packed indices → ±1. Public + stable:
    * called from generated code.
    */
  def sign(t: Int, j: Int, k: Int): Double = {
    var z = t.toLong * 1000003L + j.toLong * 8191L + k.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 1L) 1.0 else -1.0
  }
}

/** Multiprobe hyperplane-LSH bucket keys (Lv et al., VLDB 2007, public):
  * for each table, the exact `bits`-bit sign key plus the `probes`
  * cheapest perturbations — bucket keys obtained by flipping the one or
  * two sign bits whose hyperplane margins |dot| are smallest (the bits a
  * true near neighbor is most likely to disagree on). Probing those
  * buckets on the QUERY side buys per-table recall that would otherwise
  * need more tables — the tuner can then pick fewer tables at an equal
  * recall target, cutting candidate volume.
  *
  * Keys are TABLE-QUALIFIED: `(t << bits) | key`, so a key is globally
  * unique across tables and the candidate join runs on ONE long column
  * (no (tbl, bucket) pair) — query-side rows join index-side rows built
  * with `probes = 0`. Same deterministic splitmix64 hyperplanes as
  * [[HyperplaneLshKeys]] (no stored model); perturbation order is total
  * (margin sum, then flip mask), so output is identical run-to-run and
  * eval/codegen share one helper by construction.
  */
case class HyperplaneLshProbeKeys(child: Expression, tables: Int, bits: Int,
    probes: Int) extends UnaryExpression {
  require(tables > 0 && bits > 0 && bits < 48 && probes >= 0 &&
    probes <= bits * (bits + 1) / 2,
    s"need 0 <= probes <= bits(bits+1)/2, got tables=$tables bits=$bits probes=$probes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_probe_keys"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HyperplaneLshProbeKeys.keys(
      input.asInstanceOf[ArrayData], tables, bits, probes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = HyperplaneLshProbeKeys.getClass.getName.stripSuffix("$") + "$.MODULE$"
      // one static helper shared with eval: the per-row work (tables ×
      // bits × dim multiply-adds + a ≤ b(b+1)/2-candidate selection) dwarfs
      // the single call, and parity is structural rather than copied code
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$cls.keys($c, $tables, $bits, $probes));"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshProbeKeys =
    copy(child = newChild)
}

object HyperplaneLshProbeKeys {
  /** The fused kernel: qualified exact key + `probes` cheapest 1- or
    * 2-bit perturbations per table, laid out
    * `[t*(1+probes) .. t*(1+probes)+probes]`. Public + stable: called
    * from generated code.
    */
  def keys(v: ArrayData, tables: Int, bits: Int, probes: Int): Array[Long] = {
    val dim = v.numElements()
    val out = new Array[Long]((1 + probes) * tables)
    val dots = new Array[Double](bits)
    // perturbation candidates: bits single flips + C(bits,2) double flips
    val nCand = bits + bits * (bits - 1) / 2
    val cost = new Array[Double](nCand)
    val mask = new Array[Long](nCand)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < bits) {
        var dot = 0.0
        var k = 0
        while (k < dim) {
          dot += v.getDouble(k) * HyperplaneLshKeys.sign(t, j, k)
          k += 1
        }
        dots(j) = if (dot < 0) -dot else dot
        if (dot > 0) key |= (1L << j)
        j += 1
      }
      val base = t * (1 + probes)
      out(base) = (t.toLong << bits) | key
      if (probes > 0) {
        var c = 0
        j = 0
        while (j < bits) {
          cost(c) = dots(j); mask(c) = 1L << j; c += 1
          var l = j + 1
          while (l < bits) {
            cost(c) = dots(j) + dots(l); mask(c) = (1L << j) | (1L << l); c += 1
            l += 1
          }
          j += 1
        }
        // selection sort of the `probes` cheapest perturbations — total
        // order (cost, then mask) keeps the output deterministic on ties
        var p = 0
        while (p < probes) {
          var best = p
          var i = p + 1
          while (i < nCand) {
            if (cost(i) < cost(best) ||
              (cost(i) == cost(best) && mask(i) < mask(best))) best = i
            i += 1
          }
          val cb = cost(best); cost(best) = cost(p); cost(p) = cb
          val mb = mask(best); mask(best) = mask(p); mask(p) = mb
          out(base + 1 + p) = (t.toLong << bits) | (key ^ mask(p))
          p += 1
        }
      }
      t += 1
    }
    out
  }
}

/** Count of positions where two equal-length signature arrays agree — the
  * MinHash Jaccard estimator's numerator (matches/perms ≈ J, Broder 1997,
  * public). A native fused loop instead of
  * `size(filter(zip_with(a, b, eq), id))`: the HOF chain is
  * CodegenFallback, so when Catalyst inlines the single-use alias into a
  * join condition (d43's screen) every probe pays interpreted lambda
  * dispatch per element, and any projection containing it drops out of
  * whole-stage codegen. This expression stays inside codegen anywhere it
  * lands. (Note: d43's 33 s → 2.3 s screen fix was the signature-frame
  * LINEAGE, not this swap — see [[graft.queries.GroupD.d43Sigs]]; this
  * expression keeps the probe itself branch-tight either way.)
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sig_matches"

  // Length-mismatched signatures (wrong perm count) are a malformed model,
  // not a weak match: comparing the shorter prefix would bias the Jaccard
  // estimate low silently. Surface NULL instead — NearestCentroid's
  // malformed-model contract.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var c = 0L
    var i = 0
    while (i < n) {
      if (xs.getLong(i) == ys.getLong(i)) c += 1L
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0L;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getLong($i) == $b.getLong($i)) ${ev.value}++;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}
