package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle HASHES as one native fused loop
  * (SURVEY §4.4 / C10). The Column formulation —
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))` —
  * runs its lambda INTERPRETED per position (the known HOF pitfall);
  * profiled at 4.3 s just to shingle 10 k docs at sf0.1, the single
  * largest cost in the minhash-LSH pipeline. This expression tokenizes,
  * builds each shingle, and xxhash64-es it in one pass.
  *
  * Hash parity: values equal `xxhash64(concat_ws(" ", tokens[i..i+n-1]))`
  * (same UTF-8 bytes, same seed 42) — the minhash/banding pipeline
  * downstream is unchanged. Distinctness is hash-set distinct (vs
  * distinct-then-hash upstream): identical output unless two DISTINCT
  * shingles of one document collide in 64 bits (~2⁻⁶⁴ per pair —
  * and a collision would only merge one bucket key).
  */
object NGramHashFn {

  def compute(text: UTF8String, n: Int): ArrayData = {
    val parts = text.toString.split(" ", -1)
    if (parts.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= parts.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(parts(i + j))
        j += 1
      }
      seen.add(XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** POSITIONAL sibling of [[NGramHashFn]]: element k (0-based) is the
  * xxhash64 of the shingle starting at token k — every position kept,
  * no distinct — so `posexplode(ngram_pos_hashes(text, n))` yields the
  * (position, shingle-hash) pairs substring-level span operators need.
  * Replaces the `explode(sequence) → slice → array_join → md5` pipeline
  * in [[graft.operators.Dedup.removeSharedSpans]], which allocated an
  * 8-token string + digest PER POSITION; same fused-loop rationale as
  * [[NGramHashFn]] (hash parity with it by construction: same shingle
  * bytes, same seed).
  */
object NGramPosHashFn {

  def compute(text: UTF8String, n: Int): ArrayData = {
    // Zero-allocation-per-position: because the tokenizer splits on a
    // SINGLE space, every separator is exactly one 0x20 byte (which
    // never occurs inside a UTF-8 multibyte sequence), so the canonical
    // shingle `tokens[i..i+n-1].mkString(" ")` is byte-for-byte the
    // text's own range [start(i), end(i+n-1)) — hash the range directly
    // with the same XXH64 the string path uses and the values are
    // identical to `xxhash64(shingle_string)` with seed 42 (pinned in
    // NGramHashSpec), with no String round-trip or re-encoding per
    // position.
    val numBytes = text.numBytes
    var cnt = 1
    var i = 0
    while (i < numBytes) {
      if (text.getByte(i) == 0x20) cnt += 1
      i += 1
    }
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](cnt)
    val ends = new Array[Int](cnt)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < numBytes) {
      if (text.getByte(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val out = new Array[Long](cnt - n + 1)
    var k = 0
    while (k <= cnt - n) {
      out(k) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        base, off + starts(k), ends(k + n - 1) - starts(k), 42L)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `ngram_pos_hashes(text, n)` — per-position xxhash64 shingle hashes;
  * `[]` for docs shorter than n tokens, null for null text.
  */
case class NGramPosHashExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_pos_hashes expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_pos_hashes"
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(v: Any): Any =
    NGramPosHashFn.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NGramPosHashFn.compute($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramPosHashExpr =
    copy(child = newChild)
}

/** `ngram_hashes(text, n)` — distinct xxhash64 values of the text's word
  * n-grams; `[]` for docs shorter than n tokens, null for null text.
  */
case class NGramHashExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(v: Any): Any =
    NGramHashFn.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NGramHashFn.compute($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramHashExpr =
    copy(child = newChild)
}
