package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SQ8 asymmetric-distance cosine as a NATIVE Catalyst expression
  * (SURVEY §4.4 / C11): cosine(query, decode(codes)) in ONE fused
  * codegen'd loop — decode, dot, and both squared norms accumulate per
  * element with no materialized decoded array. The column formulation it
  * replaces (`transform`-decode into a `dv` column, then HOF
  * `aggregate`/`zip_with` dot and norms) runs INTERPRETED and iterates
  * the vector four times, allocating the decoded array per row — on the
  * ADC scan, the per-(query, vector) hot loop of the whole SQ8 path at
  * 100 TB.
  *
  * Arithmetic is BIT-IDENTICAL to the column form (the gate hashes are
  * load-bearing): dv_i = lo_i + (code_i · (hi_i − lo_i)) / 255.0 in that
  * exact operation order ([[graft.operators.Similarity]] sq8Decode), all
  * three sums accumulate in element order (the HOF fold order), and the
  * result is dot / (√Σq² · √Σdv²) — one division, same association. The
  * frozen (lo, hi) bounds ride as flattened reference objects, the
  * [[IvfAssignExpr]] pattern.
  */
object Sq8AdcFn {

  def compute(q: ArrayData, qFloat: Boolean, codes: ArrayData,
      lo: Array[Double], hi: Array[Double]): Double = {
    val n = math.min(q.numElements(),
      math.min(codes.numElements(), lo.length))
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = if (qFloat) q.getFloat(i).toDouble else q.getDouble(i)
      val l = lo(i)
      val h = hi(i)
      val dv = l + codes.getInt(i).toDouble * (h - l) / 255.0
      ab += x * dv
      aa += x * x
      bb += dv * dv
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}

/** `sq8_adc_cosine(qvec, codes)` under fitted (lo, hi) bounds — null iff
  * either side is null; qvec FLOAT or DOUBLE array, codes INT array.
  */
case class Sq8AdcCosineExpr(left: Expression, right: Expression,
    lo: Array[Double], hi: Array[Double]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "sq8_adc_cosine expects (array<float|double>, array<int>), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  private def qFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_adc_cosine"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    Sq8AdcFn.compute(q.asInstanceOf[ArrayData], qFloat,
      codes.asInstanceOf[ArrayData], lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sq8lo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("sq8hi", hi, "double[]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.Sq8AdcFn.compute($q, $qFloat, $c, $loRef, $hiRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8AdcCosineExpr =
    copy(left = newLeft, right = newRight)
}
