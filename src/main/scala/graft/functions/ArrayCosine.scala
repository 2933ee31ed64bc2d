package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two numeric arrays as a NATIVE Catalyst expression
  * (SURVEY §4.4 / C11): one fused loop accumulating dot and both squared
  * norms, inlined into whole-stage codegen via a static call. The
  * higher-order-function formulation (`aggregate(zip_with(...))`) runs
  * INTERPRETED — measured ~20× slower per row on this engine's minhash
  * path — so the hot similarity operators use this expression instead.
  *
  * Arithmetic is double-precision and element-order-sequential, summing
  * in index order exactly like the HOF version it replaces, so scores are
  * bit-identical and oracle hashes are unaffected.
  */
object ArrayCosineFn {

  /** Sequential-order cosine; arrays are expected equal-length (the
    * shared prefix is used — embedding columns are fixed-width).
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}

/** `array_cosine(a, b)` — null iff either side is null; elements must be
  * FLOAT or DOUBLE arrays (mixed is fine, floats are widened).
  */
case class ArrayCosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "array_cosine expects two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_cosine"
  // deterministic pure function ⇒ constant-foldable over literal inputs
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayCosineFn.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayCosineFn.compute($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosineExpr =
    copy(left = newLeft, right = newRight)
}

object ArrayMaxCosineFn {
  /** Max of [[ArrayCosineFn.compute]] over the vectors of `vecs`.
    *
    * Null entries are skipped, like `array_max` over a transform with a
    * null-propagating lambda. NaN cosines (a zero-norm vector on either
    * side: 0/0) are ALWAYS skipped — including in first position — so a
    * degenerate benchmark vector can never decide a decontamination
    * verdict. This deliberately diverges from the
    * `array_max(transform(...))` spelling it replaced, where Spark's
    * ordering treats NaN as greater than every value: there a single
    * zero-norm vector would mark EVERY probe contaminated, which is the
    * wrong semantics for max-similarity. Null when no non-null,
    * non-NaN entry exists.
    */
  def compute(vecs: ArrayData, q: ArrayData,
      vFloat: Boolean, qFloat: Boolean): Any = {
    val n = vecs.numElements()
    var best = Double.NegativeInfinity
    var any = false
    var i = 0
    while (i < n) {
      if (!vecs.isNullAt(i)) {
        val c = ArrayCosineFn.compute(vecs.getArray(i), q, vFloat, qFloat)
        if (!java.lang.Double.isNaN(c) && (!any || c > best)) {
          best = c; any = true
        }
      }
      i += 1
    }
    if (any) best else null
  }
}

/** `array_max_cosine(vecs, q)` — max cosine of `q` against an array of
  * vectors, as ONE fused codegen'd loop.
  *
  * Exists for two reasons. (1) Performance: the equivalent
  * `array_max(transform(vecs, v -> array_cosine(q, v)))` allocates and
  * runs the lambda machinery per element. (2) Correctness under
  * optimization: Spark's optimizer does not count an outer attribute
  * referenced ONLY inside a higher-order-function lambda body toward the
  * predicate's references, so a filter of that shape sitting on a
  * cross/broadcast join gets pushed to the join side that lacks the
  * attribute — an invalid `!Filter` that fails reference binding at
  * execution (observed on the decontaminateSemantic count()-pruned plan,
  * Spark 4.1.2). With both inputs as plain children there is no lambda
  * and the references are exact. Arithmetic is [[ArrayCosineFn.compute]]
  * per element + plain double max — bit-identical to the HOF form.
  */
case class ArrayMaxCosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def innerOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(inner, _), r) if innerOk(inner) && innerOk(r) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "array_max_cosine expects (array<array<float|double>>, array<float|double>), got " +
        s"${l.catalogString} / ${r.catalogString}")
  }

  private def vFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType
  private def qFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on empty/all-null vecs
  override def prettyName: String = "array_max_cosine"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(vs: Any, q: Any): Any =
    ArrayMaxCosineFn.compute(vs.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      vFloat, qFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vs, q) => {
      val tmp = ctx.freshName("maxCos")
      s"""
         |Object $tmp = graft.functions.ArrayMaxCosineFn.compute($vs, $q, $vFloat, $qFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $tmp).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayMaxCosineExpr =
    copy(left = newLeft, right = newRight)
}
