package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-bigram COUNTS as one native fused loop
  * (SURVEY §4.4 / C13). The Column formulation — explode one row per
  * character position, then hash-aggregate (doc_id, bigram) — makes the
  * engine materialize and aggregate |text| rows per document before the
  * first useful row exists; at sf0.1 that explode+agg dominated
  * `text_lm_typicality` (the slowest text gate). This expression emits
  * the per-doc (bigram, count) pairs directly, so the pipeline starts at
  * distinct-bigrams-per-doc cardinality (≲ a few hundred) instead of
  * characters-per-doc (thousands).
  *
  * Value parity: bigrams are consecutive CODE-POINT pairs — the same
  * slices `substr(text, i, 2)` produces (Spark and DuckDB both count
  * substr positions in characters, not bytes) — so counts equal the
  * explode formulation's `groupBy(doc_id, bigram).count()` exactly
  * (TextOpsSpec pins the equivalence).
  */
object CharBigramCountsFn {

  private val emptyResult = new GenericArrayData(Array.empty[Any])

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    if (s.length < 2) return emptyResult
    // code-point start offsets: substr semantics are per character, and
    // a surrogate pair must stay one "character"
    val starts = new Array[Int](s.codePointCount(0, s.length) + 1)
    var (idx, k) = (0, 0)
    while (idx < s.length) {
      starts(k) = idx
      idx += Character.charCount(s.codePointAt(idx))
      k += 1
    }
    starts(k) = s.length
    if (k < 2) return emptyResult
    val counts = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < k - 1) {
      counts.merge(s.substring(starts(i), starts(i + 2)), 1L, Long.box(_) + _)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `char_bigram_counts(text)` — array of (bigram, cnt) structs, one per
  * DISTINCT consecutive-character pair; `[]` for texts shorter than 2
  * chars, null for null text.
  */
case class CharBigramCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"char_bigram_counts expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bigram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "char_bigram_counts"
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(v: Any): Any =
    CharBigramCountsFn.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CharBigramCountsFn.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): CharBigramCountsExpr =
    copy(child = newChild)
}
