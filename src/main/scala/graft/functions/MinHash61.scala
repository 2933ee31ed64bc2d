package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SQL-REPLAYABLE minhash family (C10 oracle graduation).
  *
  * The production family ([[MinHashSigFn]]) hashes with Spark's
  * xxhash64 + Murmur3 — fast, but not expressible in the DuckDB oracle,
  * which kept the LSH gates rows-only. This family swaps the two hash
  * primitives for arithmetic DuckDB can replay EXACTLY, the same move
  * that graduated SimHash and RHP:
  *
  *  - base shingle hash: the first 15 hex chars of md5(shingle) as a
  *    60-bit long — SQL: `CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)`
  *  - permutation k: the classical affine scheme
  *    `(a_k * h + b_k) mod (2^61 - 1)` with
  *    `a_k = md5hex15("mh-a-" + k) | 1` and `b_k = md5hex15("mh-b-" + k)`
  *    — SQL: HUGEINT multiply + `%`; here: 128-bit via multiplyHigh
  *    with a Mersenne fold (bit-identical, MinHash61Spec pins vectors)
  *
  * Everything downstream (banding, candidate join, Jaccard verify) is
  * the SAME pipeline code for both families; only the hash primitive
  * swaps. The banding theory is family-independent, so the gates run
  * this family hash-checked end-to-end while the production paths keep
  * the fast one (pinned by MinHashSigSpec bit-equality and the DedupSpec
  * recall floors).
  */
object MinHash61Fn {

  /** 2^61 − 1 (Mersenne): `mod` is two shifts and an add. */
  val P: Long = (1L << 61) - 1

  // MessageDigest is not thread-safe and getInstance allocates — this
  // runs per SHINGLE and per TOKEN on the replayable/scoring paths, so
  // one digest per thread, reset per call
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5(s) as a long — 60 bits, < P. */
  def md5hex15(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex chars = 7.5 bytes: bytes 0..6 plus the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Per-permutation affine coefficients, derived from md5 so the oracle
    * can derive the identical literals in SQL. Grown on demand, cached
    * (flat paired array: [a0, b0, a1, b1, …] — no boxing in the loop).
    */
  @volatile private var coefCache: Array[Long] = Array.empty
  private def coefs(numPerms: Int): Array[Long] = {
    val c = coefCache
    if (c.length >= 2 * numPerms) c
    else synchronized {
      if (coefCache.length < 2 * numPerms) {
        val fresh = new Array[Long](2 * numPerms)
        var k = 0
        while (k < numPerms) {
          fresh(2 * k) = md5hex15(s"mh-a-$k") | 1L
          fresh(2 * k + 1) = md5hex15(s"mh-b-$k")
          k += 1
        }
        coefCache = fresh
      }
      coefCache
    }
  }

  /** (a * x + b) mod P for a, b, x < 2^60 — exact 128-bit product via
    * multiplyHigh, reduced with the Mersenne fold (2^61 ≡ 1, 2^64 ≡ 8).
    */
  def affineMod(a: Long, x: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // a, x < 2^60 ⇒ product < 2^120, hi < 2^56
    val lo = a * x // low 64 bits (unsigned semantics)
    // value = hi·2^64 + lo ≡ hi·8 + (lo >>> 61) + (lo & P)  (mod P)
    var r = hi * 8 + (lo >>> 61) + (lo & P) + b // < 2^63
    r = (r & P) + (r >>> 61)
    if (r >= P) r - P else r
  }

  /** Distinct 60-bit md5 shingle hashes of the text's word n-grams —
    * the replayable sibling of [[NGramHashFn]]: same tokenizer (split on
    * single spaces), same n-gram join with spaces, same distinct-set
    * semantics; only the hash differs.
    */
  def ngramHashes(text: UTF8String, n: Int): ArrayData = {
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
      seen.add(md5hex15(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Signature from a precomputed [[ngramHashes]] array; null when the
    * set is empty (shingle-less docs), like the production family.
    */
  def fromHashes(hashes: ArrayData, numPerms: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return null
    val cs = coefs(numPerms)
    val out = new Array[Long](numPerms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      // the affine arithmetic's bounds assume 60-bit inputs — the
      // ngram_hashes_md5 contract; anything else must fail, not wrap
      if ((h & ~((1L << 60) - 1)) != 0)
        throw new IllegalArgumentException(
          s"minhash61 input $h is not a 60-bit ngram_hashes_md5 value")
      var k = 0
      while (k < numPerms) {
        val v = affineMod(cs(2 * k), h, cs(2 * k + 1))
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `ngram_hashes_md5(text, n)` — distinct 60-bit md5-derived hashes of
  * the text's word n-grams; `[]` for docs shorter than n tokens.
  */
case class NGramMd5Expr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes_md5 expects a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes_md5"

  override protected def nullSafeEval(v: Any): Any =
    MinHash61Fn.ngramHashes(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MinHash61Fn.ngramHashes($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramMd5Expr =
    copy(child = newChild)
}

/** `minhash61(hashes, num_perms)` — replayable-family minhash signature
  * as array<long>[num_perms] over a precomputed `ngram_hashes_md5` array;
  * null for empty sets.
  */
case class MinHash61Expr(child: Expression, numPerms: Int)
    extends UnaryExpression {
  require(numPerms >= 1, s"num_perms must be >= 1, got $numPerms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash61 expects an array<bigint> column, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash61"

  override protected def nullSafeEval(v: Any): Any =
    MinHash61Fn.fromHashes(v.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
      |${ev.value} = graft.functions.MinHash61Fn.fromHashes($a, $numPerms);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash61Expr =
    copy(child = newChild)
}
