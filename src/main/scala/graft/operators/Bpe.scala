package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair encoding over the document corpus — REAL trained BPE (the
  * GPT-2/sentencepiece family's algorithm), replacing approximations:
  * learn a merge table from corpus word frequencies, then tokenize by
  * replaying the merges in rank order.
  *
  * Scale shape: the corpus is touched ONCE (the word-frequency
  * aggregation — a shuffle on word, heavy-tail bounded by minCount);
  * every training iteration then runs on the VOCABULARY table
  * (vocab-scale, orders of magnitude smaller than the corpus, cached),
  * so K merges cost K small jobs, not K corpus passes — the standard
  * frequency-table formulation of BPE training at 100 TB. Tie-breaks
  * are (count desc, pair lexicographic), making the merge table a pure
  * function of the corpus.
  */
object Bpe {

  /** End-of-word sentinel appended to each word's symbol sequence so
    * merges can distinguish word-final pairs (the classic `</w>`).
    */
  val Eow = "</w>"

  /** Driver-side training-vocabulary bound (contract, like
    * `Similarity.sampleCap`): the word-frequency table collected for the
    * merge loop is capped at the `vocabCap` most frequent words
    * (tie-break: word ascending — deterministic). A web-scale corpus has
    * 10⁸–10⁹ distinct whitespace tokens; an uncapped collect is a driver
    * OOM at the 100 TB design point, while top-N-words is the standard
    * practical BPE training regime (rare-tail words contribute ~nothing
    * to pair statistics). 1M words × ~20 B ≈ tens of MB on the driver.
    */
  val DefaultVocabCap: Int = 1 << 20

  /** Learn `numMerges` merges from the corpus. Returns the ordered
    * merge table: rank r = the pair merged at round r.
    */
  def train(docs: DataFrame, numMerges: Int,
      minCount: Long = 2L,
      vocabCap: Int = DefaultVocabCap): Array[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE corpus pass: word frequencies (lowercased whitespace words).
    // The orderBy+limit keeps the collect bounded by vocabCap (top-N by
    // count, word-ascending tie-break) — Spark plans it as a TopK
    // (TakeOrderedAndProject), not a global sort.
    val wordCounts = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("w"))
      .limit(vocabCap)
      .as[(String, Long)].collect()
    // vocabulary as symbol sequences; driver-side loop — the vocab is
    // metadata-scale (bounded further by minCount), the corpus is not
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (charSymbols(w) :+ Eow, c)
    }
    val merges = Array.newBuilder[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      for ((syms, cnt) <- vocab; i <- 0 until syms.length - 1)
        pairCounts.merge((syms(i), syms(i + 1)), cnt, _ + _)
      if (pairCounts.isEmpty) round = numMerges
      else {
        var best: ((String, String), Long) = null
        val it = pairCounts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val cand = (e.getKey, e.getValue.longValue())
          if (best == null || cand._2 > best._2 ||
            (cand._2 == best._2 &&
              (cand._1._1 < best._1._1 ||
                (cand._1._1 == best._1._1 && cand._1._2 < best._1._2))))
            best = cand
        }
        merges += best._1
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best._1), c) }
        round += 1
      }
    }
    merges.result()
  }

  private def mergePair(syms: Array[String],
      pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize one word with a rank table: repeatedly merge the
    * lowest-rank adjacent pair (the standard BPE apply loop).
    */
  /** Split on Unicode CODE POINTS, not UTF-16 units — a surrogate pair
    * must stay one symbol, matching Spark's `split(w, "")` in
    * [[firstMergePlan]] (and not emitting mojibake token halves).
    */
  private def charSymbols(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  def encodeWord(word: String,
      ranks: java.util.Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = charSymbols(word) :+ Eow
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrDefault((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = mergePair(syms,
        (syms(bestAt), syms(bestAt + 1))) // merges ALL occurrences of the pair
    }
    syms
  }

  /** THE tokenization — one definition: (doc_id, tokens ARRAY) under a
    * frozen merge table; the rank map builds once per partition
    * (mapPartitions, the MediaCodec pattern — per-word work is
    * imperative by nature). Both
    * public faces ([[encodeDocs]] counts, [[tokenLines]] the digestable
    * stream) derive from this declaratively, so the token stream the
    * replay-digest gate verifies and the token counts sample_pack_bpe
    * packs by can never drift apart.
    */
  private def tokenStream(docs: DataFrame,
      merges: Array[(String, String)]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("toks", ArrayType(StringType))))
    val enc = Encoders.row(outSchema)
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .mapPartitions { rows =>
        val ranks = new java.util.HashMap[(String, String), Int]()
        merges.zipWithIndex.foreach { case (p, r) => ranks.put(p, r) }
        rows.map { r =>
          val words = r.getString(1).split("\\s+").filter(_.nonEmpty)
          Row(r.getLong(0), words.flatMap(encodeWord(_, ranks)).toSeq)
        }
      }(enc)
  }

  /** Tokenize the corpus with a trained merge table: per-doc token
    * count, distinct-token count, and the first/last tokens (enough to
    * pin which merges fired without hashing engine-specific renderings).
    */
  def encodeDocs(docs: DataFrame,
      merges: Array[(String, String)]): DataFrame =
    tokenStream(docs, merges).select(
      col("doc_id"),
      size(col("toks")).cast(LongType).as("n_tokens"),
      size(array_distinct(col("toks"))).cast(LongType)
        .as("n_distinct_tokens"),
      when(size(col("toks")) > 0, element_at(col("toks"), 1))
        .as("first_token"),
      when(size(col("toks")) > 0, element_at(col("toks"), -1))
        .as("last_token"))

  /** Per-document token STREAM under a frozen merge table — (doc_id,
    * tokens) with tokens space-joined in word order, the exact line body
    * tools/bpe_replay.py digests. Emitting the stream (not just counts)
    * is what lets the text_bpe_tokens gate digest-verify against the
    * independent replay at any scale.
    */
  def tokenLines(docs: DataFrame,
      merges: Array[(String, String)]): DataFrame =
    tokenStream(docs, merges).select(
      col("doc_id"), array_join(col("toks"), " ").as("tokens"))

  /** The FIRST merge decision as a declarative plan (explode characters
    * → adjacent pairs weighted by word count → argmax) — BPE round 1
    * expressed in SQL-equivalent form, which gives the training
    * algorithm a DuckDB-oracle-checkable face.
    */
  def firstMergePlan(docs: DataFrame, minCount: Long = 2L): DataFrame = {
    val words = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    words
      .select(col("cnt"), concat(split(col("w"), ""), array(lit(Eow))).as("s"))
      // adjacent pairs from the symbol array directly — no window, no
      // per-word sort; the only shuffle is the pair-count aggregation
      .select(col("cnt"), explode(expr(
        "transform(sequence(0, size(s) - 2), " +
          "i -> struct(s[i] AS a, s[i + 1] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("pair_count"))
      .orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(1)
  }
}
