package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of the whitespace token multiset as ONE native pass
  * (tokenize → count → md5 per distinct token → signed bit sums → pack).
  *
  * Bit-identical to the Column pipeline it replaces (Dedup.simhashSigs's
  * explode(60)/two-groupBy formulation — kept as the readable spec and
  * asserted equal in DedupSpec): the per-token hash is the same
  * `conv(substr(md5(t),1,15),16,10)` 60-bit value, and the per-bit sums
  * are integer so accumulation order cannot matter. The pipeline version
  * multiplies the corpus ×60 through two shuffles; this is a map.
  */
object SimHash60Fn {

  private def hash60(token: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = top 7.5 bytes, big-endian, as a 60-bit long
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def compute(text: UTF8String): Long = {
    val parts = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Integer]
    var i = 0
    while (i < parts.length) {
      counts.merge(parts(i), 1, (a, b) => a + b)
      i += 1
    }
    val sums = new Array[Int](60)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = hash60(e.getKey)
      val cnt = e.getValue.intValue()
      var j = 0
      while (j < 60) {
        sums(j) += (if (((h >> j) & 1L) == 1L) cnt else -cnt)
        j += 1
      }
    }
    var res = 0L
    var j = 0
    while (j < 60) {
      if (sums(j) > 0) res |= 1L << j
      j += 1
    }
    res
  }
}

/** `simhash60(text)` — 60-bit SimHash over whitespace tokens. */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(v: Any): Any =
    SimHash60Fn.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash60Fn.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}
