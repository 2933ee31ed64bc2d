package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-feature linear scoring (the fastText/CCNet quality-classifier
  * SHAPE): every token hashes into a `dim`-bucket weight table and the
  * document's raw score is the sum of its tokens' weights. A real
  * deployment loads trained weights; here the table is md5-DERIVED so
  * the DuckDB oracle reproduces every weight from the same literals —
  * the operator under test is the scoring infrastructure (hash, lookup,
  * accumulate at scan speed), not the training.
  *
  * Determinism: the accumulator is a LONG — bucket j's weight is
  * `(md5hex15("qw-" + j) >> 20) − 2^39`, an integer in ±2^39 — so the
  * sum is accumulation-order-free (the SimHash discipline; a double
  * accumulator would tie the result to partition order). |sum| stays
  * under 2^39·n_tokens, far inside Long for any real document. The
  * caller turns the integer into a logit with one multiply and one
  * divide (both IEEE-exact), never exp/pow whose last ulp differs
  * across libm implementations.
  */
object HashedLinearFn {

  /** Lazily built weight tables, one per dim (tiny: 8·dim bytes). */
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  def weights(dim: Int): Array[Long] =
    tables.computeIfAbsent(dim, d => Array.tabulate(d)(j =>
      (MinHash61Fn.md5hex15(s"qw-$j") >> 20) - (1L << 39)))

  /** Σ weight(md5hex15(token) mod dim) over the space-split tokens. */
  def score(text: UTF8String, dim: Int): Long = {
    val w = weights(dim)
    val parts = text.toString.split(" ", -1)
    var sum = 0L
    var i = 0
    while (i < parts.length) {
      sum += w((MinHash61Fn.md5hex15(parts(i)) % dim).toInt)
      i += 1
    }
    sum
  }
}

/** `hlin_sum(text, dim)` — integer hashed-linear score of the text's
  * space-split tokens (null text → null).
  */
case class HashedLinearExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hlin_sum expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hlin_sum"

  override protected def nullSafeEval(v: Any): Any =
    HashedLinearFn.score(v.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashedLinearFn.score($a, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedLinearExpr =
    copy(child = newChild)
}
