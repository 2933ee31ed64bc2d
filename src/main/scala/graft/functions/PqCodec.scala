package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization codec kernels as NATIVE Catalyst expressions
  * (SURVEY §4.4 / C11). The first implementation unrolled the codebook
  * into ~1k-term Column expressions per subspace — whole-stage codegen
  * then spent SECONDS compiling the generated megamorphic code on every
  * plan (measured: 4 s to encode a 2000-row corpus, ~14 s for the full
  * PQ top-k — all compile time). A fused loop behind one static call
  * generates a few lines of Java instead: compile cost vanishes and the
  * per-row work is a tight primitive loop.
  *
  * Arithmetic is element-order-sequential double precision, identical to
  * the unrolled form (normalize → subtract → square → accumulate in
  * index order), so codes and LUT values are bit-for-bit unchanged.
  *
  * The codebook rides along as a FLATTENED `double[]` reference object
  * (`cb[(s·kcodes + c)·sub + j]`), not an expression child: it is
  * quantizer state fitted once per corpus ([[graft.operators.Similarity.
  * pqCodebooks]]), shipped to executors inside the serialized expression
  * exactly like a broadcast literal.
  */
object PqFn {

  private def normalized(v: ArrayData, isFloat: Boolean, dims: Int): Array[Double] = {
    val n = math.min(v.numElements(), dims)
    val x = new Array[Double](dims)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val e = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      x(i) = e
      ss += e * e
      i += 1
    }
    val nrm = math.sqrt(ss)
    if (nrm != 0.0) {
      i = 0
      while (i < dims) { x(i) /= nrm; i += 1 }
    }
    x
  }

  /** argmin-per-subspace code assignment (first minimum wins — the same
    * tie-break as `array_position(d, array_min(d))`).
    */
  def encode(v: ArrayData, isFloat: Boolean, cb: Array[Double],
      m: Int, kcodes: Int, sub: Int): ArrayData = {
    val x = normalized(v, isFloat, m * sub)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kcodes) {
        val off = (s * kcodes + c) * sub
        var d = 0.0
        var j = 0
        while (j < sub) { val t = x(s * sub + j) - cb(off + j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-query asymmetric-distance table: lut(s)(c) = ‖q_s − cb(s)(c)‖²
    * over the normalized query.
    */
  def lut(v: ArrayData, isFloat: Boolean, cb: Array[Double],
      m: Int, kcodes: Int, sub: Int): ArrayData = {
    val x = normalized(v, isFloat, m * sub)
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val dists = new Array[Double](kcodes)
      var c = 0
      while (c < kcodes) {
        val off = (s * kcodes + c) * sub
        var d = 0.0
        var j = 0
        while (j < sub) { val t = x(s * sub + j) - cb(off + j); d += t * t; j += 1 }
        dists(c) = d
        c += 1
      }
      rows(s) = new GenericArrayData(dists)
      s += 1
    }
    new GenericArrayData(rows)
  }
}

/** Shared shape/typecheck logic for the two PQ codec expressions. */
sealed abstract class PqCodecExpr extends UnaryExpression {
  def cbFlat: Array[Double]
  def m: Int
  def kcodes: Int
  final def sub: Int = cbFlat.length / (m * kcodes)

  final protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${dt.catalogString}")
  }
}

/** `pq_encode(vec)` → array<int> of length m. */
case class PqEncodeExpr(child: Expression, cbFlat: Array[Double],
    m: Int, kcodes: Int) extends PqCodecExpr {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    PqFn.encode(v.asInstanceOf[ArrayData], isFloat, cbFlat, m, kcodes, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbFlat, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.PqFn.encode($a, $isFloat, $cbRef, $m, $kcodes, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** `pq_lut(qvec)` → array<array<double>> of shape m × kcodes. */
case class PqLutExpr(child: Expression, cbFlat: Array[Double],
    m: Int, kcodes: Int) extends PqCodecExpr {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(v: Any): Any =
    PqFn.lut(v.asInstanceOf[ArrayData], isFloat, cbFlat, m, kcodes, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbFlat, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.PqFn.lut($a, $isFloat, $cbRef, $m, $kcodes, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}
