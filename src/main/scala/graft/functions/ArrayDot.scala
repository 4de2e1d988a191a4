package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two numeric-array columns in
  * double precision (SURVEY §2.M custom-function surface, same extension
  * point as ArrayJaccard).
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation in the
  * similarity hot paths: higher-order array functions are interpreted
  * (CodegenFallback), while this expression participates in whole-stage
  * codegen — one tight loop per row, no closure dispatch per element.
  *
  * Semantics are BIT-IDENTICAL to the higher-order form (which cross-engine
  * oracles rely on): elements are cast to double individually (exact for
  * float), products are accumulated LEFT-TO-RIGHT from 0.0, a length
  * mismatch or null element yields null (as zip_with's null padding does).
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  private def elemKind(dt: DataType): Option[String] = dt match {
    case ArrayType(FloatType, _) => Some("float")
    case ArrayType(DoubleType, _) => Some("double")
    case ArrayType(IntegerType, _) => Some("int")
    case ArrayType(LongType, _) => Some("long")
    case ArrayType(ShortType, _) => Some("short")
    case ArrayType(ByteType, _) => Some("byte")
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemKind(left.dataType).isDefined && elemKind(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of float/double/int/long/short/byte elements, " +
        s"got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemKind(left.dataType).get, elemKind(right.dataType).get)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ArrayDot.getClass.getName.stripSuffix("$") + "$"
    val lk = elemKind(left.dataType).get; val rk = elemKind(right.dataType).get
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""java.lang.Double $r = $cls.MODULE$$.compute($a, $b, "$lk", "$rk");
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayDot {
  private def get(x: ArrayData, i: Int, kind: String): Double = kind match {
    case "float" => x.getFloat(i).toDouble
    case "double" => x.getDouble(i)
    case "int" => x.getInt(i).toDouble
    case "long" => x.getLong(i).toDouble
    case "short" => x.getShort(i).toDouble
    case "byte" => x.getByte(i).toDouble
  }

  /** Shared by interpreted eval and generated code. Left-to-right fold from
    * 0.0 — the summation order every mirrored oracle assumes. Integral
    * elements cast exactly (the old higher-order form's per-element cast). */
  def compute(x: ArrayData, y: ArrayData, xk: String, yk: String): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += get(x, i, xk) * get(y, i, yk)
      i += 1
    }
    acc
  }

  /** Column API. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ArrayDot(org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Register as SQL function `array_dot`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
}
