package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two `array<double>` columns — the hot
  * kernel of every ANN tier and the embedding near-dup path. The built-in
  * composition `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a
  * higher-order-function chain that falls OUT of codegen (interpreted
  * lambda per element) and materializes the products array per row; this
  * expression generates a single fused loop inside whole-stage codegen.
  *
  * PARITY IS LOAD-BEARING: the sum runs STRICTLY left-to-right — index
  * 0,1,2,… — the exact IEEE addition order of both the replaced fold and
  * DuckDB's `list_dot_product`, so every query result stays bit-identical
  * under the driver's hash gate (the same reason the fold was written
  * left-first). Null semantics match the fold it replaces: a null array, a
  * length mismatch (zip_with would pad-null and poison the sum), or a null
  * ELEMENT (zip_with's product is null, and the aggregate's `acc + null`
  * poisons the whole sum) all yield null. The element check is compiled
  * out when both input types declare `containsNull = false`; our
  * embeddings are fixed-dim and dense so none of the three occurs in data.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  /** True when either input MAY hold null elements (per its type); only
    * then do eval/codegen pay the per-element null branch. */
  private def mayHaveNullElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = mayHaveNullElements
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (mayHaveNullElements)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Idempotent per-session registration (decode_record discipline). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      { exprs => DotProductExpr(exprs.head, exprs(1)) },
      "scala_udf")

  /** Column-level helper: resolves through the registry at analysis time,
    * so `register(spark)` must have run in the session first. */
  def dot(a: Column, b: Column): Column = call_function("dot_product", a, b)
}
