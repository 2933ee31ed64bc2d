package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF coarse-cell assignment as a NATIVE Catalyst expression (SURVEY
  * §4.4 / C11), the same fused-loop pattern as [[PqEncodeExpr]].
  *
  * The first implementation assigned cells with an exploded-dimension
  * join: (n·dims) element rows ⋈ broadcast (ncells·dims) centroid
  * elements → hash-aggregate over n·ncells groups. Fine at 8 cells; at
  * the cell counts near-dup pruning needs (cells ∝ corpus, ~300 at
  * sf0.1) the join inflates to n·ncells·dims intermediate rows — a
  * shuffle that GROWS with the index resolution. This expression does
  * the same arithmetic in one codegen'd pass over the corpus: per row,
  * ncells·dims multiply-adds, zero extra rows moved. At 100 TB that is
  * the difference between a map and a quadratic-ish shuffle.
  *
  * Arithmetic is BIT-IDENTICAL to the join formulation it replaces:
  * dot products accumulate in element order (the join's per-(vec,cell)
  * partial aggregation also saw products in posexplode index order);
  * `euclid = true` scores dot − ‖c‖²/2 (argmin squared distance),
  * `euclid = false` scores dot / ‖c‖ (cosine up to the vector's own
  * constant norm); ties rank the LOWER cell first, matching the
  * `row_number() OVER (ORDER BY cscore DESC, cell ASC)` the join form
  * used. Centroids ride as a flattened row-major `double[]` reference
  * object, like the PQ codebook.
  */
object IvfFn {

  /** Top-`n` cells by (score desc, cell asc). */
  def assign(v: ArrayData, isFloat: Boolean, cents: Array[Double],
      ncells: Int, dims: Int, n: Int, euclid: Boolean): ArrayData = {
    val m = math.min(v.numElements(), dims)
    val x = new Array[Double](dims)
    var i = 0
    while (i < m) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val scores = new Array[Double](ncells)
    var k = 0
    while (k < ncells) {
      var dot = 0.0
      var ss = 0.0
      var j = 0
      val off = k * dims
      while (j < dims) {
        val c = cents(off + j)
        dot += x(j) * c
        ss += c * c
        j += 1
      }
      scores(k) = if (euclid) dot - ss / 2 else dot / math.sqrt(ss)
      k += 1
    }
    val out = new Array[Int](math.min(n, ncells))
    val used = new Array[Boolean](ncells)
    var o = 0
    while (o < out.length) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var k2 = 0
      while (k2 < ncells) {
        if (!used(k2) && scores(k2) > bestS) { bestS = scores(k2); best = k2 }
        k2 += 1
      }
      used(best) = true
      out(o) = best
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** `ivf_cells(vec)` → array<int> of the `nassign` nearest cells,
  * nearest first.
  */
case class IvfAssignExpr(child: Expression, centsFlat: Array[Double],
    ncells: Int, nassign: Int, euclid: Boolean) extends UnaryExpression {

  private def dims: Int = centsFlat.length / ncells

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${dt.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    IvfFn.assign(v.asInstanceOf[ArrayData], isFloat, centsFlat, ncells, dims,
      nassign, euclid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfcents", centsFlat, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.IvfFn.assign($a, $isFloat, $ref, $ncells, $dims, $nassign, $euclid)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssignExpr =
    copy(child = newChild)
}
