package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane-projection LSH band keys as one native fused loop
  * (SURVEY §4.4 / C10). The Column formulation — posexplode the
  * embedding, join a broadcast (k, i, gaussian) table, two groupBy
  * aggregations — materializes n·dims·nbits rows (tens of millions at
  * sf0.1) to produce n·nbands band keys. This expression computes all
  * nbits seeded-gaussian projections and packs the sign bits per band in
  * one pass over each vector.
  *
  * Parity with the column form: hyperplane components come from the same
  * `java.util.Random(seed).nextGaussian()` sequence in the same k-major
  * order, and bit packing is the same `1L << (k % rowsPerBand)` per
  * band k/rowsPerBand. Only the dot-product SUMMATION ORDER differs
  * (index order here vs shuffle order in the aggregate) — immaterial for
  * LSH keys (a sign flip needs a projection within float-noise of the
  * hyperplane) and the op is rows-only with a recall spec, not
  * hash-compared.
  */
object RhpBandsFn {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Long, Int, Int), Array[Double]]()

  /** nbits·dims N(0,1) components, generated once per executor per
    * (seed, nbits, dims) — a few hundred KB, never shuffled or broadcast.
    */
  private def planes(seed: Long, nbits: Int, dims: Int): Array[Double] =
    cache.computeIfAbsent((seed, nbits, dims), _ => {
      val rnd = new java.util.Random(seed)
      Array.fill(nbits * dims)(rnd.nextGaussian())
    })

  def compute(arr: ArrayData, nbits: Int, rowsPerBand: Int, seed: Long,
      isFloat: Boolean): ArrayData = {
    val dims = arr.numElements()
    val h = planes(seed, nbits, dims)
    val out = new Array[Long](nbits / rowsPerBand)
    var k = 0
    while (k < nbits) {
      val base = k * dims
      var dot = 0.0
      var i = 0
      while (i < dims) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * h(base + i)
        i += 1
      }
      if (dot > 0) out(k / rowsPerBand) |= 1L << (k % rowsPerBand)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `rhp_bands(embedding, nbits, rows_per_band, seed)` — array of
  * nbits/rows_per_band packed sign-bit band keys; null for null input.
  */
case class RhpBandsExpr(child: Expression, nbits: Int, rowsPerBand: Int,
    seed: Long) extends UnaryExpression {
  require(nbits % rowsPerBand == 0,
    s"nbits=$nbits must be a multiple of rows_per_band=$rowsPerBand")
  require(rowsPerBand <= 63, "band keys are signed longs: rows_per_band <= 63")

  private val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rhp_bands expects array<float|double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_bands"

  override protected def nullSafeEval(v: Any): Any =
    RhpBandsFn.compute(v.asInstanceOf[ArrayData], nbits, rowsPerBand, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.RhpBandsFn.compute($a, $nbits, $rowsPerBand, ${seed}L, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): RhpBandsExpr =
    copy(child = newChild)
}
