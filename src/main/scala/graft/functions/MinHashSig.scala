package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3HashFunction, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Complete minhash signature as one native fused loop (SURVEY §4.4 /
  * C10). The Column formulation — explode the shingle hashes, then
  * `numPerms` static `min(hash(h, k))` aggregates — materializes one row
  * per shingle and runs a hash aggregate over all of them; profiled at
  * ~4 s for 10 k docs at sf0.1, the dominant stage of the minhash-LSH
  * gate. This expression shingles (via [[NGramHashFn]]), permute-hashes,
  * and min-reduces in one pass per document.
  *
  * BIT-IDENTICAL to `min(hash(h, lit(k)))` for k < numPerms: Spark's
  * `hash(...)` is Murmur3 folded over the children from seed 42, so each
  * permutation value is
  * `Murmur3(k: int, Murmur3(h: long, 42))`, reproduced here with the
  * same catalyst `Murmur3HashFunction` (MinHashSigSpec pins equality).
  * Docs with no shingles return null (the aggregate formulation emitted
  * no row) — callers filter nulls.
  */
object MinHashSigFn {

  def compute(text: UTF8String, n: Int, numPerms: Int): ArrayData =
    fromHashes(NGramHashFn.compute(text, n), numPerms)

  /** Signature from an already-shingled hash array (the [[NGramHashFn]]
    * output a caller has cached for the Jaccard-verify stage) — skips the
    * second tokenize+shingle pass over the text.
    */
  def fromHashes(hashes: ArrayData, numPerms: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return null
    val out = new Array[Int](numPerms)
    java.util.Arrays.fill(out, Int.MaxValue)
    var i = 0
    while (i < m) {
      val inner = Murmur3HashFunction.hash(hashes.getLong(i), LongType, 42L)
      var k = 0
      while (k < numPerms) {
        val v = Murmur3HashFunction.hash(k, IntegerType, inner).toInt
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash32(text_or_hashes, n, num_perms)` — the document's minhash
  * signature as array<int>[num_perms]; null for docs with fewer than n
  * tokens. The child is either the text (shingled internally) or an
  * already-computed `ngram_hashes` array (n ignored) — callers that cache
  * the shingle-hash sets for Jaccard verification derive signatures from
  * them without a second shingling pass.
  */
case class MinHashSigExpr(child: Expression, n: Int, numPerms: Int)
    extends UnaryExpression {
  require(n >= 1 && numPerms >= 1, "minhash32 needs n >= 1, num_perms >= 1")

  private val fromHashes: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash32 expects a string or array<bigint> column, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // null for shingle-less docs
  override def prettyName: String = "minhash32"

  override protected def nullSafeEval(v: Any): Any =
    if (fromHashes) MinHashSigFn.fromHashes(v.asInstanceOf[ArrayData], numPerms)
    else MinHashSigFn.compute(v.asInstanceOf[UTF8String], n, numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // not defineCodeGen: compute() returns null for shingle-less docs and
    // the generated isNull must track that, not just the child's null
    nullSafeCodeGen(ctx, ev, a => {
      val call =
        if (fromHashes) s"graft.functions.MinHashSigFn.fromHashes($a, $numPerms)"
        else s"graft.functions.MinHashSigFn.compute($a, $n, $numPerms)"
      s"""
      |${ev.value} = $call;
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
