package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string's UTF-8 bytes — the
  * compression-ratio quality signal (Gopher/CCNet-class: highly
  * repetitive or templated text compresses far below prose; near-random
  * noise barely compresses at all). Emitting the LENGTH rather than the
  * ratio keeps the expression integer-valued and composition free:
  * `deflate_len(text) / octet_length(text)` is the ratio, and both
  * operands stay exact.
  *
  * Raw deflate (no zlib/gzip header) at the JDK default level, one
  * Deflater per call — level and strategy fixed so the value is
  * deterministic for a given input. No SQL oracle exists (DuckDB cannot
  * deflate), so the gate is rows-only; TextOpsSpec pins exact vectors
  * (replayed directly against the JDK Deflater) plus the ordering
  * properties that make the signal useful.
  */
object DeflateLenFn {
  def compute(text: UTF8String): Long = {
    val input = text.getBytes
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      defl.setInput(input)
      defl.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!defl.finished()) total += defl.deflate(buf)
      total
    } finally defl.end()
  }
}

/** `deflate_len(text)` — raw-DEFLATE byte length of the UTF-8 text. */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(v: Any): Any =
    DeflateLenFn.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.DeflateLenFn.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}
