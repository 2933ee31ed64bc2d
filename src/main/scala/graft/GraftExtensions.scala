package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayCosineExpr, Uuid5Expr}

/** Engine extensions, injected via spark.sql.extensions (GraftSession).
  *
  * Registers the custom Catalyst expressions so they are usable from both
  * the DataFrame API (`call_function("uuid5_dns", …)`) and SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Evaluate a foldable scalar parameter, rejecting null and non-numeric
    * foldables (e.g. a string literal) with an error naming the function
    * and the offending value — instead of the bare NullPointerException /
    * ClassCastException a blind `asInstanceOf[Number]` would raise.
    */
  private def foldableNum(fn: String, what: String, e: Expression): Number = {
    require(e.foldable, s"$fn: $what must be a literal")
    e.eval() match {
      case n: Number => n
      case null => throw new IllegalArgumentException(
        s"$fn: $what must be a non-null numeric literal, got NULL")
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a numeric literal, got " +
          s"$other (${e.dataType.simpleString})")
    }
  }
  private def foldableInt(fn: String, what: String, e: Expression): Int =
    foldableNum(fn, what, e).intValue()
  private def foldableLong(fn: String, what: String, e: Expression): Long =
    foldableNum(fn, what, e).longValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("uuid5_dns"),
      new ExpressionInfo("graft.functions.Uuid5Expr", null, "uuid5_dns",
        "uuid5_dns(name) - RFC 4122 v5 UUID of `name` in the DNS namespace.",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "uuid5_dns expects exactly one argument")
        Uuid5Expr(children.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("array_cosine"),
      new ExpressionInfo("graft.functions.ArrayCosineExpr", null, "array_cosine",
        "array_cosine(a, b) - cosine similarity of two float/double arrays " +
          "(codegen'd fused loop; element-order-sequential double arithmetic).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_cosine expects exactly two arguments")
        ArrayCosineExpr(children.head, children(1))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("array_max_cosine"),
      new ExpressionInfo("graft.functions.ArrayMaxCosineExpr", null,
        "array_max_cosine",
        "array_max_cosine(vecs, q) - max cosine of q against an array of " +
          "vectors (one fused codegen'd loop; lambda-free, so optimizer " +
          "reference tracking stays exact).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_max_cosine expects exactly two arguments")
        graft.functions.ArrayMaxCosineExpr(children.head, children(1))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("array_l1"),
      new ExpressionInfo("graft.functions.L1DistExpr", null, "array_l1",
        "array_l1(a, b) - L1 (Manhattan) distance of two int arrays " +
          "(codegen'd fused loop).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_l1 expects exactly two arguments")
        graft.functions.L1DistExpr(children.head, children(1))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("hll_bucket_rho"),
      new ExpressionInfo("graft.functions.HllHashExpr", null, "hll_bucket_rho",
        "hll_bucket_rho(s) - md5-derived HyperLogLog register coordinates " +
          "packed as bucket << 6 | rho; bit-identical to the hex-chain " +
          "spelling but computed from digest bytes (no regexp/conv per row).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "hll_bucket_rho expects exactly one argument")
        graft.functions.HllHashExpr(children.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("hll_ngram_bucket_rho"),
      new ExpressionInfo("graft.functions.HllNgramExpr", null,
        "hll_ngram_bucket_rho",
        "hll_ngram_bucket_rho(text, n) - packed HLL (bucket << 6 | rho) per " +
          "word n-gram position, md5 over the text's own byte ranges (no " +
          "shingle-string allocation; values == hll_bucket_rho(shingle)).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "hll_ngram_bucket_rho expects two arguments")
        graft.functions.HllNgramExpr(children.head,
          foldableInt("hll_ngram_bucket_rho", "ngram size", children(1)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo("graft.functions.SimHash60Expr", null, "simhash60",
        "simhash60(text) - 60-bit SimHash of the whitespace token multiset " +
          "(fused tokenize+count+md5+pack loop).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash60 expects exactly one argument")
        graft.functions.SimHash60Expr(children.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo("graft.functions.NGramHashExpr", null, "ngram_hashes",
        "ngram_hashes(text, n) - distinct xxhash64 values of the text's " +
          "word n-grams (fused tokenize+shingle+hash loop).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "ngram_hashes expects (text, n)")
        graft.functions.NGramHashExpr(children.head,
          foldableInt("ngram_hashes", "ngram size", children(1)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("ngram_pos_hashes"),
      new ExpressionInfo("graft.functions.NGramPosHashExpr", null,
        "ngram_pos_hashes",
        "ngram_pos_hashes(text, n) - per-position xxhash64 values of the " +
          "text's word n-grams (fused tokenize+shingle+hash loop, " +
          "position = array index).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "ngram_pos_hashes expects (text, n)")
        graft.functions.NGramPosHashExpr(children.head,
          foldableInt("ngram_pos_hashes", "ngram size", children(1)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("char_bigram_counts"),
      new ExpressionInfo("graft.functions.CharBigramCountsExpr", null,
        "char_bigram_counts",
        "char_bigram_counts(text) - array of (bigram, cnt) structs, one " +
          "per distinct consecutive-character pair (fused count loop).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "char_bigram_counts expects (text)")
        graft.functions.CharBigramCountsExpr(children.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("rhp_bands"),
      new ExpressionInfo("graft.functions.RhpBandsExpr", null, "rhp_bands",
        "rhp_bands(embedding, nbits, rows_per_band, seed) - packed " +
          "sign-bit band keys of seeded random-hyperplane projections " +
          "(fused project+pack loop).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "rhp_bands expects (embedding, nbits, rows_per_band, seed)")
        def intArg(what: String, i: Int) =
          foldableInt("rhp_bands", what, children(i))
        graft.functions.RhpBandsExpr(children.head, intArg("nbits", 1),
          intArg("rows_per_band", 2),
          foldableLong("rhp_bands", "seed", children(3)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("minhash32"),
      new ExpressionInfo("graft.functions.MinHashSigExpr", null, "minhash32",
        "minhash32(text, n, num_perms) - minhash signature over word " +
          "n-gram shingles (fused shingle+permute+min loop; bit-identical " +
          "to min(hash(shingle_hash, k)) aggregates).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 3, "minhash32 expects (text, n, num_perms)")
        graft.functions.MinHashSigExpr(children.head,
          foldableInt("minhash32", "ngram size", children(1)),
          foldableInt("minhash32", "num_perms", children(2)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hashes_md5"),
      new ExpressionInfo("graft.functions.NGramMd5Expr", null,
        "ngram_hashes_md5",
        "ngram_hashes_md5(text, n) - distinct 60-bit md5-derived hashes " +
          "of the text's word n-grams (the SQL-replayable family).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "ngram_hashes_md5 expects (text, n)")
        graft.functions.NGramMd5Expr(children.head,
          foldableInt("ngram_hashes_md5", "ngram size", children(1)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("minhash61"),
      new ExpressionInfo("graft.functions.MinHash61Expr", null, "minhash61",
        "minhash61(hashes, num_perms) - SQL-replayable minhash signature " +
          "(affine permutations mod 2^61-1 over ngram_hashes_md5 values).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash61 expects (hashes, num_perms)")
        graft.functions.MinHash61Expr(children.head,
          foldableInt("minhash61", "num_perms", children(1)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("hlin_sum"),
      new ExpressionInfo("graft.functions.HashedLinearExpr", null, "hlin_sum",
        "hlin_sum(text, dim) - integer hashed-feature linear score " +
          "(md5-derived weight table, order-free Long accumulator).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "hlin_sum expects (text, dim)")
        graft.functions.HashedLinearExpr(children.head,
          foldableInt("hlin_sum", "dim", children(1)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      new FunctionIdentifier("deflate_len"),
      new ExpressionInfo("graft.functions.DeflateLenExpr", null, "deflate_len",
        "deflate_len(text) - raw-DEFLATE byte length of the UTF-8 text " +
          "(fixed level/strategy; the compression-ratio quality signal).",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "deflate_len expects exactly one argument")
        graft.functions.DeflateLenExpr(children.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    // §4.4c optimizer rule: size(filter(arr,f)) > 0 → exists(arr,f)
    // (short-circuit instead of materialize-and-count)
    ext.injectOptimizerRule(_ => graft.plans.SimplifyArrayExistence)
    // §4.4c whole-operator plan: native bounded-heap top-k per key
    // (logical node + strategy + partial/final SparkPlan pair), plus the
    // rule that rewrites the standard window row_number-filter-drop idiom
    // onto it transparently
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
  }
}
