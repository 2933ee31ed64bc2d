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
  * Raw deflate (no zlib/gzip header) at the JDK default level — level
  * and strategy fixed so the value is deterministic for a given input
  * WITHIN a zlib build. (Output length is NOT contractual across
  * JDK/zlib versions: the gate stays rows-only/spec-replayed against
  * the running JDK's Deflater, never digest-pinned.) No SQL oracle
  * exists (DuckDB cannot deflate); TextOpsSpec pins exact replay
  * vectors plus the ordering properties that make the signal useful.
  *
  * The Deflater is a per-thread native handle, `reset()` between rows:
  * this is a 100 TB scan-rate map, and a per-row allocate/end cycle is
  * a JNI malloc/free that dominates short documents. Task threads are
  * pooled and long-lived in every Spark deployment; the handles live
  * as long as their thread and are reclaimed by a Cleaner if one dies.
  */
object DeflateLenFn {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      // free the native handle when the owning thread is collected
      // (end() is idempotent and safe from the cleaner thread)
      cleaner.register(Thread.currentThread(), () => d.end())
      d
    }
  }
  private val cleaner = java.lang.ref.Cleaner.create()

  def compute(text: UTF8String): Long = {
    val input = text.getBytes
    val defl = local.get()
    defl.reset()
    defl.setInput(input)
    defl.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!defl.finished()) total += defl.deflate(buf)
    total
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
