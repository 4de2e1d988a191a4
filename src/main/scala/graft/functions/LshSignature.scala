package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the full `bits`-bit random-hyperplane LSH
  * signature of a numeric-array column in ONE pass (SURVEY §2.M custom-
  * function surface, same extension point as ArrayDot/ArrayJaccard).
  *
  * Replaces the previous formulation — `bits` separate ArrayDot projections
  * reduced with `+` — which re-traversed the array (and re-entered the
  * UnsafeArrayData accessors) once per direction. Here each element is read
  * and widened ONCE and updates all `bits` accumulators, so the hot loop is
  * element-major with a flat double[] of accumulators: ~`bits`× fewer array
  * reads on the signature stage of every LSH similarity join.
  *
  * Semantics are BIT-IDENTICAL to the ArrayDot formulation (cross-engine
  * oracles rely on it): accumulator b sums x(i)·dir(b)(i) left-to-right in
  * element order from 0.0 — exactly ArrayDot's fold order — and a null
  * input, null element, or direction/vector length mismatch yields signature
  * 0L (each ArrayDot projection went null, every `when(proj > 0, bit)` fell
  * to `otherwise(0)`, and the sum of zeros was 0 — never null). */
case class LshSignature(child: Expression, dirs: Array[Array[Double]])
    extends UnaryExpression {
  require(dirs.nonEmpty && dirs.forall(_.length == dirs(0).length),
    "LshSignature needs >= 1 equal-length directions")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_signature"

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
    if (elemKind(child.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array of float/double/int/long/short/byte elements, " +
        s"got ${child.dataType}")

  // non-null-propagating (a null vector maps to signature 0, see Scaladoc) —
  // so eval is overridden directly instead of nullSafeEval
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshSignature.compute(v.asInstanceOf[ArrayData], dirs, elemKind(child.dataType).get)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cls = LshSignature.getClass.getName.stripSuffix("$") + "$"
    val dirsRef = ctx.addReferenceObj("lshDirs", dirs, "double[][]")
    val k = elemKind(child.dataType).get
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          ${ev.value} = $cls.MODULE$$.compute(${c.value}, $dirsRef, "$k");
        }
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignature {
  private def get(x: ArrayData, i: Int, kind: String): Double = kind match {
    case "float" => x.getFloat(i).toDouble
    case "double" => x.getDouble(i)
    case "int" => x.getInt(i).toDouble
    case "long" => x.getLong(i).toDouble
    case "short" => x.getShort(i).toDouble
    case "byte" => x.getByte(i).toDouble
  }

  /** Shared by interpreted eval and generated code. Element-major: one read
    * per element, all direction accumulators updated per read; per-direction
    * accumulation order (and therefore every rounding step) is identical to
    * the direction-major ArrayDot fold. */
  def compute(x: ArrayData, dirs: Array[Array[Double]], kind: String): Long = {
    val n = x.numElements()
    if (n != dirs(0).length) return 0L
    val bits = dirs.length
    val accs = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return 0L
      val xi = get(x, i, kind)
      var b = 0
      while (b < bits) { accs(b) += xi * dirs(b)(i); b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (accs(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Column API. */
  def apply(vec: Column, dirs: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      LshSignature(org.apache.spark.sql.GraftColumnBridge.expression(vec), dirs))
}
