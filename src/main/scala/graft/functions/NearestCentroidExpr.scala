package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment over a BOUNDED literal codebook —
  * the round-6 replacement for the O(N·K) candidate-pair machinery of the
  * ANN tiers (broadcast pair join → per-pair score row → max_by hash
  * aggregation → per-key re-attach join). The codebook of an IVF/PQ index
  * is bounded model state by construction (cells ∝ √N, K ≤ 256 per
  * subspace), so it rides into the expression as literal children exactly
  * like [[DotProductExpr]]'s zero-UDF discipline: one fused generated loop
  * per row inside whole-stage codegen, no Scala closure, no pair table.
  *
  * PARITY IS LOAD-BEARING (same contract as [[DotProductExpr]]): each
  * score is the IDENTICAL IEEE expression tree the relational form
  * evaluated —
  *   cosine:  `dot(v, cv_m) / (nv * ncv_m)` with the strictly
  *            left-to-right dot fold;
  *   neg-L2:  `-((nsv - (2.0 * dot(sv, scv))) + nscv)` with
  *            `nsv = dot(sv, sv)` folded once per subspace —
  * and the winner is chosen with the exact semantics of
  * `max_by(cent_id, struct(score, -cent_id))`: doubles compare nan-safely
  * (NaN > everything, NaN = NaN, -0.0 = 0.0 — `SQLOrderingUtil`
  * semantics), ties break to the LOWEST cent_id. A null score (null
  * element / length mismatch) skips that centroid, matching MaxBy's
  * null-ordering skip on dense data; no centroid scorable → null.
  */
trait CentroidCodebook { self: Expression =>

  /** children(offset), children(offset+1), children(offset+2) must be the
    * foldable (ids, cents, norms) literal columns. */
  protected def codebookOffset: Int

  private def lit(i: Int): Any = {
    val c = children(codebookOffset + i)
    require(c.foldable, s"codebook child $i must be foldable, got $c")
    c.eval(InternalRow.empty)
  }

  /** cent ids, sorted order not required — the win test is order-free. */
  @transient protected final lazy val cbIds: Array[Int] =
    lit(0).asInstanceOf[ArrayData].toIntArray()
  @transient protected final lazy val cbVecs: Array[Array[Double]] = {
    val a = lit(1).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(m => a.getArray(m).toDoubleArray())
  }
  @transient protected final lazy val cbNorms: Array[Double] =
    lit(2).asInstanceOf[ArrayData].toDoubleArray()

  protected final def codebookTypesOk: Boolean =
    children(codebookOffset).dataType == ArrayType(IntegerType, containsNull = false) &&
      (children(codebookOffset + 1).dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _                                      => false
      }) &&
      (children(codebookOffset + 2).dataType match {
        case ArrayType(DoubleType, _) => true
        case _                        => false
      })

  /** max_by(id, struct(score, -id)) winner update, shared by eval paths. */
  protected final def win(has: Boolean, s: Double, id: Int, bs: Double, bid: Int): Boolean =
    if (!has) true
    else if (java.lang.Double.isNaN(s)) !java.lang.Double.isNaN(bs) || id < bid
    else if (java.lang.Double.isNaN(bs)) false
    else s > bs || (s == bs && id < bid)

  /** Generated-Java fragment of [[win]] (primitive locals only). */
  protected final def winJava(has: String, s: String, id: String,
      bs: String, bid: String): String =
    s"""(!$has ||
       |  (Double.isNaN($s) ? (!Double.isNaN($bs) || $id < $bid)
       |    : (!Double.isNaN($bs) && ($s > $bs || ($s == $bs && $id < $bid)))))""".stripMargin
}

/** `nearest_centroid_cos(v, nv, ids, cents, norms)` → the cent_id whose
  * cosine `dot(v, cents[m]) / (nv * norms[m])` is max_by-largest (ties →
  * lowest id). Replaces the IVF assignment pair join + aggregation. */
case class NearestCentroidCosExpr(children: Seq[Expression])
    extends Expression with CentroidCodebook {

  override protected def codebookOffset: Int = 2
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid_cos"

  /** Semantically deterministic, but declared non-deterministic as the
    * optimizer-duplication guard (optimization guide §4.4): with the flag
    * on, an O(K·dim) call is never substituted through CollapseProject or
    * a pushed-down filter — the join's inferred isnotnull(cell) predicate
    * was measured re-evaluating the whole argmax (plus its transform()
    * arguments, three times over) at the scan. Evaluation order of the
    * surviving single call is unchanged, so results are identical. */
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 5 &&
      children(0).dataType.isInstanceOf[ArrayType] &&
      children(0).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
      children(1).dataType == DoubleType && codebookTypesOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroid_cos expects (array<double>, double, array<int>, " +
        "array<array<double>>, array<double>)")

  private def vMayHaveNullElements: Boolean = children(0).dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  }

  override def eval(input: InternalRow): Any = {
    val vAny = children(0).eval(input)
    val nvAny = children(1).eval(input)
    if (vAny == null || nvAny == null) return null
    val v = vAny.asInstanceOf[ArrayData]
    val nv = nvAny.asInstanceOf[Double]
    val n = v.numElements()
    if (vMayHaveNullElements) {
      var i = 0
      while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    }
    var has = false
    var bs = 0.0
    var bid = 0
    var m = 0
    while (m < cbIds.length) {
      val cv = cbVecs(m)
      if (cv.length == n) {
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getDouble(i) * cv(i); i += 1 }
        val sc = acc / (nv * cbNorms(m))
        val id = cbIds(m)
        if (win(has, sc, id, bs, bid)) { has = true; bs = sc; bid = id }
      }
      m += 1
    }
    if (has) bid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vEv = children(0).genCode(ctx)
    val nvEv = children(1).genCode(ctx)
    val ids = ctx.addReferenceObj("ncIds", cbIds, "int[]")
    val vecs = ctx.addReferenceObj("ncVecs", cbVecs, "double[][]")
    val norms = ctx.addReferenceObj("ncNorms", cbNorms, "double[]")
    val n = ctx.freshName("n")
    val has = ctx.freshName("has")
    val bs = ctx.freshName("bs")
    val bid = ctx.freshName("bid")
    val m = ctx.freshName("m")
    val cv = ctx.freshName("cv")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    val sc = ctx.freshName("sc")
    val id = ctx.freshName("id")
    val nullElemCheck =
      if (vMayHaveNullElements)
        s"""for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
           |  if (${vEv.value}.isNullAt($i)) { ${ev.isNull} = true; }
           |}""".stripMargin
      else ""
    val code =
      code"""
        |${vEv.code}
        |${nvEv.code}
        |boolean ${ev.isNull} = ${vEv.isNull} || ${nvEv.isNull};
        |int ${ev.value} = 0;
        |if (!${ev.isNull}) {
        |  final int $n = ${vEv.value}.numElements();
        |  $nullElemCheck
        |  boolean $has = false;
        |  double $bs = 0.0;
        |  int $bid = 0;
        |  if (!${ev.isNull}) {
        |    for (int $m = 0; $m < $ids.length; $m++) {
        |      final double[] $cv = $vecs[$m];
        |      if ($cv.length != $n) continue;
        |      double $acc = 0.0;
        |      for (int $i = 0; $i < $n; $i++) {
        |        $acc += ${vEv.value}.getDouble($i) * $cv[$i];
        |      }
        |      final double $sc = $acc / (${nvEv.value} * $norms[$m]);
        |      final int $id = $ids[$m];
        |      if (${winJava(has, sc, id, bs, bid)}) {
        |        $has = true; $bs = $sc; $bid = $id;
        |      }
        |    }
        |  }
        |  if (!$has) { ${ev.isNull} = true; } else { ${ev.value} = $bid; }
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestCentroidCosExpr =
    copy(children = newChildren)
}

/** Shared core of the per-subspace PQ argmin: children are
  * (v, ids2d, cents3d, norms2d) plus a constructor subDim; for each
  * subspace m the winner of `-((nsv - (2.0·dot)) + nscv)` is found with
  * the max_by semantics of [[CentroidCodebook.win]]. */
sealed abstract class PqExprBase extends Expression {

  def children: Seq[Expression]
  def subDim: Int

  override def nullable: Boolean = true

  /** See [[NearestCentroidCosExpr.deterministic]] — the same
    * anti-duplication guard for the O(M·K·subDim) PQ loops. */
  override lazy val deterministic: Boolean = false

  private def lit(i: Int): Any = {
    val c = children(i)
    require(c.foldable, s"pq codebook child $i must be foldable, got $c")
    c.eval(InternalRow.empty)
  }

  /** ids(m)(k), vecs(m)(k)(d), norms(m)(k) — ragged per m (empty training
    * cells are dropped upstream exactly as in the relational form). */
  @transient protected final lazy val pqIds: Array[Array[Int]] = {
    val a = lit(1).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(m => a.getArray(m).toIntArray())
  }
  @transient protected final lazy val pqVecs: Array[Array[Array[Double]]] = {
    val a = lit(2).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { m =>
      val b = a.getArray(m)
      Array.tabulate(b.numElements())(k => b.getArray(k).toDoubleArray())
    }
  }
  @transient protected final lazy val pqNorms: Array[Array[Double]] = {
    val a = lit(3).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(m => a.getArray(m).toDoubleArray())
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 4 &&
      (children(0).dataType match {
        case ArrayType(DoubleType, _) => true
        case _                        => false
      }) &&
      (children(1).dataType match {
        case ArrayType(ArrayType(IntegerType, _), _) => true
        case _                                       => false
      }) &&
      (children(2).dataType match {
        case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
        case _                                                    => false
      }) &&
      (children(3).dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _                                      => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<array<int>>, " +
        "array<array<array<double>>>, array<array<double>>)")

  protected def vMayHaveNullElements: Boolean = children(0).dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  }

  /** Per-subspace winner indices into pqIds(m)/pqVecs(m), or null if any
    * subspace is unscorable (slice short / null element / empty book) —
    * matching the relational pipeline where such rows contribute null
    * cells and a missing subspace would shorten the reconstruction. */
  protected final def winners(v: ArrayData): Array[Int] = {
    val n = v.numElements()
    val mCount = pqIds.length
    val out = new Array[Int](mCount)
    val checkNulls = vMayHaveNullElements
    var m = 0
    while (m < mCount) {
      val base = m * subDim
      if (base + subDim > n) return null
      if (checkNulls) {
        var i = 0
        while (i < subDim) {
          if (v.isNullAt(base + i)) return null
          i += 1
        }
      }
      var nsv = 0.0
      var i = 0
      while (i < subDim) {
        val x = v.getDouble(base + i)
        nsv += x * x
        i += 1
      }
      val ids = pqIds(m)
      val vecs = pqVecs(m)
      val norms = pqNorms(m)
      var has = false
      var bs = 0.0
      var bid = 0
      var bk = -1
      var k = 0
      while (k < ids.length) {
        val scv = vecs(k)
        if (scv.length == subDim) {
          var acc = 0.0
          var j = 0
          while (j < subDim) { acc += v.getDouble(base + j) * scv(j); j += 1 }
          val nd = -((nsv - (2.0 * acc)) + norms(k))
          val id = ids(k)
          val better =
            if (!has) true
            else if (java.lang.Double.isNaN(nd)) !java.lang.Double.isNaN(bs) || id < bid
            else if (java.lang.Double.isNaN(bs)) false
            else nd > bs || (nd == bs && id < bid)
          if (better) { has = true; bs = nd; bid = id; bk = k }
        }
        k += 1
      }
      if (!has) return null
      out(m) = bk
      m += 1
    }
    out
  }

  /** Generated-Java version of [[winners]]: fills `$outVar` (int[] of
    * winner INDICES) or sets `$failVar` true. */
  protected final def winnersJava(ctx: CodegenContext, v: String,
      ids2: String, vecs3: String, norms2: String,
      outVar: String, failVar: String): String = {
    val n = ctx.freshName("n")
    val m = ctx.freshName("m")
    val base = ctx.freshName("base")
    val nsv = ctx.freshName("nsv")
    val x = ctx.freshName("x")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val k = ctx.freshName("k")
    val ids = ctx.freshName("ids")
    val vecs = ctx.freshName("vecs")
    val norms = ctx.freshName("norms")
    val has = ctx.freshName("has")
    val bs = ctx.freshName("bs")
    val bid = ctx.freshName("bid")
    val bk = ctx.freshName("bk")
    val scv = ctx.freshName("scv")
    val acc = ctx.freshName("acc")
    val nd = ctx.freshName("nd")
    val id = ctx.freshName("id")
    val better = ctx.freshName("better")
    val nullElemCheck =
      if (vMayHaveNullElements)
        s"""for (int $i = 0; $i < $subDim && !$failVar; $i++) {
           |  if ($v.isNullAt($base + $i)) { $failVar = true; }
           |}
           |if ($failVar) break;""".stripMargin
      else ""
    s"""
       |final int $n = $v.numElements();
       |for (int $m = 0; $m < $ids2.length; $m++) {
       |  final int $base = $m * $subDim;
       |  if ($base + $subDim > $n) { $failVar = true; break; }
       |  $nullElemCheck
       |  double $nsv = 0.0;
       |  for (int $i = 0; $i < $subDim; $i++) {
       |    final double $x = $v.getDouble($base + $i);
       |    $nsv += $x * $x;
       |  }
       |  final int[] $ids = $ids2[$m];
       |  final double[][] $vecs = $vecs3[$m];
       |  final double[] $norms = $norms2[$m];
       |  boolean $has = false;
       |  double $bs = 0.0;
       |  int $bid = 0;
       |  int $bk = -1;
       |  for (int $k = 0; $k < $ids.length; $k++) {
       |    final double[] $scv = $vecs[$k];
       |    if ($scv.length != $subDim) continue;
       |    double $acc = 0.0;
       |    for (int $j = 0; $j < $subDim; $j++) {
       |      $acc += $v.getDouble($base + $j) * $scv[$j];
       |    }
       |    final double $nd = -(($nsv - (2.0 * $acc)) + $norms[$k]);
       |    final int $id = $ids[$k];
       |    final boolean $better = (!$has ||
       |      (Double.isNaN($nd) ? (!Double.isNaN($bs) || $id < $bid)
       |        : (!Double.isNaN($bs) && ($nd > $bs || ($nd == $bs && $id < $bid)))));
       |    if ($better) { $has = true; $bs = $nd; $bid = $id; $bk = $k; }
       |  }
       |  if (!$has) { $failVar = true; break; }
       |  $outVar[$m] = $bk;
       |}
     """.stripMargin
  }
}

/** `pq_codes(v, ids, cents, norms)` → array<int> of the winning cent_id
  * per subspace (the PQ code word). Replaces the training-assignment pair
  * join of [[graft.queries.PipelineQueries]]'s pqReconstruct. */
case class PqCodesExpr(children: Seq[Expression], subDim: Int)
    extends PqExprBase {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def eval(input: InternalRow): Any = {
    val vAny = children(0).eval(input)
    if (vAny == null) return null
    val w = winners(vAny.asInstanceOf[ArrayData])
    if (w == null) return null
    val out = new Array[Int](w.length)
    var m = 0
    while (m < w.length) { out(m) = pqIds(m)(w(m)); m += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vEv = children(0).genCode(ctx)
    val ids2 = ctx.addReferenceObj("pqIds", pqIds, "int[][]")
    val vecs3 = ctx.addReferenceObj("pqVecs", pqVecs, "double[][][]")
    val norms2 = ctx.addReferenceObj("pqNorms", pqNorms, "double[][]")
    val wIdx = ctx.freshName("wIdx")
    val fail = ctx.freshName("fail")
    val codesArr = ctx.freshName("codes")
    val m = ctx.freshName("mm")
    val core = winnersJava(ctx, vEv.value.toString, ids2, vecs3, norms2, wIdx, fail)
    val code =
      code"""
        |${vEv.code}
        |boolean ${ev.isNull} = ${vEv.isNull};
        |ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  final int[] $wIdx = new int[$ids2.length];
        |  boolean $fail = false;
        |  $core
        |  if ($fail) { ${ev.isNull} = true; } else {
        |    final int[] $codesArr = new int[$ids2.length];
        |    for (int $m = 0; $m < $ids2.length; $m++) {
        |      $codesArr[$m] = $ids2[$m][$wIdx[$m]];
        |    }
        |    ${ev.value} =
        |      new org.apache.spark.sql.catalyst.util.GenericArrayData($codesArr);
        |  }
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqCodesExpr =
    copy(children = newChildren)
}

/** `pq_reconstruct(v, ids, cents, norms)` → array<double>: the winning
  * subspace centroids concatenated in subspace order (the ADC
  * reconstruction `rhat`). Replaces the final-assignment pair join +
  * collect_list/flatten of pqReconstruct. */
case class PqReconstructExpr(children: Seq[Expression], subDim: Int)
    extends PqExprBase {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override def eval(input: InternalRow): Any = {
    val vAny = children(0).eval(input)
    if (vAny == null) return null
    val w = winners(vAny.asInstanceOf[ArrayData])
    if (w == null) return null
    val out = new Array[Double](w.length * subDim)
    var m = 0
    while (m < w.length) {
      System.arraycopy(pqVecs(m)(w(m)), 0, out, m * subDim, subDim)
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vEv = children(0).genCode(ctx)
    val ids2 = ctx.addReferenceObj("pqIds", pqIds, "int[][]")
    val vecs3 = ctx.addReferenceObj("pqVecs", pqVecs, "double[][][]")
    val norms2 = ctx.addReferenceObj("pqNorms", pqNorms, "double[][]")
    val wIdx = ctx.freshName("wIdx")
    val fail = ctx.freshName("fail")
    val rhat = ctx.freshName("rhat")
    val m = ctx.freshName("mm")
    val core = winnersJava(ctx, vEv.value.toString, ids2, vecs3, norms2, wIdx, fail)
    val code =
      code"""
        |${vEv.code}
        |boolean ${ev.isNull} = ${vEv.isNull};
        |ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  final int[] $wIdx = new int[$ids2.length];
        |  boolean $fail = false;
        |  $core
        |  if ($fail) { ${ev.isNull} = true; } else {
        |    final double[] $rhat = new double[$ids2.length * $subDim];
        |    for (int $m = 0; $m < $ids2.length; $m++) {
        |      System.arraycopy($vecs3[$m][$wIdx[$m]], 0, $rhat, $m * $subDim, $subDim);
        |    }
        |    ${ev.value} =
        |      new org.apache.spark.sql.catalyst.util.GenericArrayData($rhat);
        |  }
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqReconstructExpr =
    copy(children = newChildren)
}

object NearestCentroidExpr {

  /** Idempotent per-session registration ([[DotProductExpr]] discipline).
    * pq_* take a 5th literal arg: the subspace dimension. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_centroid_cos",
      { exprs => NearestCentroidCosExpr(exprs) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_codes",
      { exprs => PqCodesExpr(exprs.take(4), subDimOf(exprs)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_reconstruct",
      { exprs => PqReconstructExpr(exprs.take(4), subDimOf(exprs)) },
      "scala_udf")
  }

  private def subDimOf(exprs: Seq[Expression]): Int = exprs(4) match {
    case Literal(v: Int, IntegerType) => v
    case e => e.eval(InternalRow.empty).asInstanceOf[Int]
  }

  def nearestCos(v: Column, nv: Column, ids: Column, cents: Column,
      norms: Column): Column =
    call_function("nearest_centroid_cos", v, nv, ids, cents, norms)

  def pqCodes(v: Column, ids: Column, cents: Column, norms: Column,
      subDim: Column): Column =
    call_function("pq_codes", v, ids, cents, norms, subDim)

  def pqReconstruct(v: Column, ids: Column, cents: Column, norms: Column,
      subDim: Column): Column =
    call_function("pq_reconstruct", v, ids, cents, norms, subDim)
}
