package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaccard similarity of two string-array columns
  * treated as sets — `|A∩B| / |A∪B|` (0.0 when both empty, null if either
  * input is null).
  *
  * This is the engine's custom-predicate extension point (the analogue of a
  * custom `TitanPredicate`, tc/graphdb/query/TitanPredicate.java — SURVEY §2.M):
  * a full `Expression` with `doGenCode` so it participates in whole-stage
  * codegen instead of falling back to a black-box UDF. Used by the dedup
  * verify stage where it evaluates once per candidate pair in the hot loop.
  *
  * The generated code builds a HashSet from the smaller array and probes with
  * the larger — O(|A|+|B|) per row, no per-row allocation beyond the set.
  */
case class ArrayJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "array_jaccard"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    ArrayJaccard.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ArrayJaccard.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.MODULE$$.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayJaccard {
  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements(); val ny = y.numElements()
    if (nx == 0 && ny == 0) return 0.0
    val (small, large) = if (nx <= ny) (x, y) else (y, x)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    val smallDistinct = set.size
    val probed = new java.util.HashSet[UTF8String](small.numElements() * 2)
    val largeSet = new java.util.HashSet[UTF8String](large.numElements() * 2)
    var inter = 0
    i = 0
    while (i < large.numElements()) {
      if (!large.isNullAt(i)) {
        val s = large.getUTF8String(i)
        if (largeSet.add(s) && set.contains(s) && probed.add(s)) inter += 1
      }
      i += 1
    }
    val union = smallDistinct + largeSet.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Column API. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ArrayJaccard(org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Register as SQL function `array_jaccard`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_jaccard", exprs => ArrayJaccard(exprs(0), exprs(1)), "built-in")
}
