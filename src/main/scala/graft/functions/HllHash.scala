package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog register coordinates of a value — `hll_bucket_rho(s)`
  * packs (bucket, rho) into one long as `bucket << 6 | rho` (rho ≤ 49
  * fits 6 bits). Bit-for-bit the same registers as the original
  * md5-hex pipeline (`conv(substring(md5(s),1,3),16,10)` bucket;
  * leading-zero-nibble regexp + nibble CASE rho) — the bucket is md5
  * nibbles 0–2 and rho = CLZ of the 48-bit nibble-3..14 suffix + 1,
  * which is exactly what the hex-digit arithmetic computed — but
  * straight from the digest BYTES: no hex encode, no regexp, no conv
  * string walk per row. This is the HLL scan-rate path at 100 TB; the
  * string chain was the cost. SketchesSpec pins packed-value parity
  * against the hex-chain formulation on real data, and the SQL oracle
  * (which replays the hex spelling) keeps hash-checking the estimates.
  *
  * MessageDigest is per-thread (the DeflateLen pattern): task threads
  * are pooled and long-lived; reset() between rows.
  */
object HllHashFn {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[functions] def localDigest(): java.security.MessageDigest = local.get()

  /** (bucket << 6 | rho) from a 16-byte md5 digest. */
  private[functions] def pack(d: Array[Byte]): Long = {
    val bucket = ((d(0) & 0xff) << 4) | ((d(1) & 0xf0) >>> 4)
    val v = ((d(1) & 0x0fL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
    val rho = if (v == 0L) 49L
      else java.lang.Long.numberOfLeadingZeros(v) - 16L + 1L
    (bucket.toLong << 6) | rho
  }

  def compute(text: UTF8String): Long = {
    val md = local.get()
    md.reset()
    pack(md.digest(text.getBytes))
  }
}

/** Fused word-n-gram HLL coordinates — one packed (bucket << 6 | rho)
  * long per shingle POSITION, md5 computed over the text's own byte
  * range (the [[NGramPosHashFn]] trick: single-space tokenization makes
  * the canonical shingle bytes a contiguous range of the text, and 0x20
  * never occurs inside a UTF-8 multibyte sequence), so values equal
  * `hll_bucket_rho(shingle_string)` with ZERO string allocation per
  * position. The trigram-string explode was measured at 3.2–4.4 s of
  * the text_hll_vocab gate's 4.2 s at sf0.1 — the digest was never the
  * cost, the per-position String was.
  */
object HllNgramFn {
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes // one copy per document, not per position
    val numBytes = bytes.length
    var cnt = 1
    var i = 0
    while (i < numBytes) {
      if (bytes(i) == 0x20) cnt += 1
      i += 1
    }
    if (cnt < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](cnt)
    val ends = new Array[Int](cnt)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < numBytes) {
      if (bytes(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = numBytes
    val md = HllHashFn.localDigest()
    val out = new Array[Long](cnt - n + 1)
    var k = 0
    while (k <= cnt - n) {
      md.reset()
      md.update(bytes, starts(k), ends(k + n - 1) - starts(k))
      out(k) = HllHashFn.pack(md.digest())
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `hll_ngram_bucket_rho(text, n)` — packed HLL coordinates per word
  * n-gram position (values == `hll_bucket_rho` of each shingle string).
  */
case class HllNgramExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hll_ngram_bucket_rho expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hll_ngram_bucket_rho"

  override protected def nullSafeEval(v: Any): Any =
    HllNgramFn.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HllNgramFn.compute($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): HllNgramExpr =
    copy(child = newChild)
}

/** `hll_bucket_rho(s)` — md5-derived HLL (bucket << 6 | rho). */
case class HllHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hll_bucket_rho expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_bucket_rho"

  override protected def nullSafeEval(v: Any): Any =
    HllHashFn.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HllHashFn.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): HllHashExpr =
    copy(child = newChild)
}
