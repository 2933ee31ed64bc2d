package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM-corpus curation (SURVEY C13): token and
  * length statistics, term frequency, heuristic language ID, quality
  * scoring, and document fingerprinting.
  *
  * Everything is codegen'd Column arithmetic over integer token counts —
  * deterministic at any partitioning, no UDFs, engine-reproducible (the
  * DuckDB oracles compute the same formulas).
  */
object TextOps {

  def tokens(text: Column): Column = split(text, " ")

  /** Per-document surface statistics. */
  def stats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("n_chars"),
      size(toks).cast(LongType).as("n_tokens"),
      size(array_distinct(toks)).cast(LongType).as("n_uniq"),
      (size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("ttr"),
      round((length(col("text")) - size(toks) + 1).cast(DoubleType) / size(toks), 6)
        .as("avg_token_len"))
  }

  /** Whole-corpus term frequency, top `k` by (count desc, token). The
    * explode → partial-agg pattern: the shuffle carries (token, partial
    * count), not documents.
    */
  def termFrequency(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Stopword tables for the heuristic language scorer. Tiny, inlined as
    * literal arrays (broadcast-free).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast(LongType)

  /** Heuristic n-gram/stopword language ID: score = stopword hits per
    * language; predict the argmax (fixed tie order en>de>es>fr via
    * greatest-of-structs), "und" (undetermined) when no hits at all.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    val scored = docs.select(col("doc_id"),
      hitCount(toks, stopwords("en")).as("s_en"),
      hitCount(toks, stopwords("de")).as("s_de"),
      hitCount(toks, stopwords("fr")).as("s_fr"),
      hitCount(toks, stopwords("es")).as("s_es"))
    scored.withColumn("predicted",
      when(greatest(col("s_en"), col("s_de"), col("s_fr"), col("s_es")) === 0, lit("und"))
        .when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es")), lit("en"))
        .when(col("s_de") >= greatest(col("s_fr"), col("s_es")), lit("de"))
        .when(col("s_es") >= col("s_fr"), lit("es"))
        .otherwise(lit("fr")))
  }

  /** Quality score in [0,1]: length component (saturating at 200 tokens),
    * lexical diversity (type-token ratio), stopword-rate component.
    * The formula is arbitrary but FIXED — reproducibility is the contract.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), qualityCol(col("text")).as("quality"))

  /** The quality formula as a COLUMN over any text column — per-row, so
    * pipelines add it MAP-SIDE instead of joining a derived (doc_id,
    * quality) frame back onto themselves (a self-join that shuffles the
    * corpus twice for a row-local computation).
    */
  def qualityCol(text: Column): Column = {
    val toks = tokens(lower(text))
    val nTok = size(toks).cast(DoubleType)
    val ttr = size(array_distinct(toks)).cast(DoubleType) / nTok
    val stopRate = hitCount(toks, stopwords("en")).cast(DoubleType) / nTok
    round(least(nTok / 200.0, lit(1.0)) * 0.5 + ttr * 0.3 +
      least(stopRate * 5.0, lit(1.0)) * 0.2, 6)
  }

  /** Per-document DEFLATE compression ratio — the Gopher/CCNet-class
    * boilerplate/noise heuristic the other quality signals don't cover:
    * templated or repetitive text compresses far below prose (low
    * ratio), near-random noise barely compresses (ratio ≈ 1). Pure
    * map-side: one native `deflate_len` pass per row, zero shuffle, so
    * at 100 TB this is a scan-rate filter like the other signals.
    * Output: doc_id, n_bytes (UTF-8), deflate_bytes, ratio (rounded).
    */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val dlen = call_function("deflate_len", col("text"))
    val nb = octet_length(col("text"))
    docs.select(
      col("doc_id"),
      nb.cast(LongType).as("n_bytes"),
      dlen.as("deflate_bytes"),
      // empty doc: no bytes to compress, ratio undefined -> null
      // (explicit guard, not try_divide: ANSI-mode safe either way)
      when(nb > 0, round(dlen.cast(DoubleType) / nb, 6)).as("ratio"))
  }

  /** GPT-2-style pre-tokenizer regex, restricted to a lookahead-free,
    * ASCII form so the SAME pattern runs identically under Java regex
    * (Spark) and RE2 (DuckDB oracle; RE2 has no lookarounds): contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation runs,
    * residual whitespace. This is the cheap token-budget estimator a
    * corpus pipeline runs before the real BPE merge table is applied.
    */
  val BpeSplitPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+|\\s+"

  /** Whitespace vs BPE-ish token counts per document + their ratio (the
    * usual chars-per-token sanity metric).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val ws = size(tokens(col("text"))).cast(LongType)
    val bpe = size(regexp_extract_all(lower(col("text")),
      lit(BpeSplitPattern), lit(0))).cast(LongType)
    docs.select(col("doc_id"), ws.as("n_ws_tokens"), bpe.as("n_bpe_tokens"),
      round(length(col("text")).cast(DoubleType) / bpe, 6).as("chars_per_token"))
  }

  /** Character-bigram corpus-typicality score — the n-gram-LM quality
    * filter of a training-data pipeline, in its exactly-reproducible form:
    * the "model" is the corpus' own conditional bigram frequencies
    * P(c₂|c₁) = cnt(c₁c₂)/cnt(c₁·), a document scores the MEAN probability
    * of its bigrams under that model (higher = more corpus-typical; junk
    * and boilerplate outliers score low). Probabilities are integer-count
    * ratios (bit-identical IEEE division in any engine) and the per-doc
    * mean uses the exact-decimal sum, so scores hash-match an independent
    * engine — the property a log-space perplexity cannot give (ln differs
    * in the last ulp across math libraries).
    *
    * Plan shape: one explode over character positions, immediately
    * collapsed to per-(doc, bigram) COUNTS — a document reuses its
    * bigrams heavily (~4× here, more in prose), so everything downstream
    * of that first partial-aggregated groupBy carries weighted rows, not
    * bigram instances. The model aggregation, the broadcast scoring join,
    * and the per-doc weighted mean all run on the collapsed frame; only
    * the explode itself ever sees instance-cardinality data, and it
    * feeds straight into a map-side combine. No driver materialization.
    */
  def lmTypicality(docs: DataFrame): DataFrame = {
    import graft.functions.Exact.dsum
    // per-doc (bigram, count) pairs from the fused native expression —
    // the explode-per-character + hash-agg formulation this replaces
    // materialized |text| rows per doc before the first useful row
    // existed (chars-per-doc vs distinct-bigrams-per-doc is ~10-50×).
    // Cached: the model aggregation and the scoring join both consume it.
    val bgCounts = docs
      .select(col("doc_id"),
        explode(call_function("char_bigram_counts", col("text"))).as("bc"))
      .select(col("doc_id"), col("bc.bigram").as("bigram"),
        col("bc.cnt").as("dcnt"))
      .cache()
    graft.util.Scratch.register(bgCounts): Unit // result-reachable; see Scratch
    val counts = bgCounts.groupBy("bigram").agg(sum(col("dcnt")).as("b_cnt"))
    val prefixTotals = counts
      .groupBy(substring(col("bigram"), 1, 1).as("prefix"))
      .agg(sum(col("b_cnt")).as("p_cnt"))
    val model = counts.withColumn("prefix", substring(col("bigram"), 1, 1))
      .join(prefixTotals, "prefix")
      .select(col("bigram"), (col("b_cnt").cast(DoubleType) / col("p_cnt")).as("p"))
    // weighted mean over instances: Σ dcnt·p / Σ dcnt. The product is one
    // IEEE multiply before the exact-decimal sum — the oracle computes
    // the identical expression, so parity is bit-for-bit.
    bgCounts.join(broadcast(model), "bigram")
      .groupBy("doc_id")
      .agg(round(
        dsum(col("dcnt").cast(DoubleType) * col("p"), 12) /
          sum(col("dcnt")).cast(DoubleType), 6).as("typicality"))
  }

  /** Word-bigram STUPID-BACKOFF log-probability — the CCNet-class
    * reference-model quality filter, and the word-level sibling of
    * [[lmTypicality]] (char bigrams measure script/orthography
    * typicality; word bigrams measure phrase fluency against a REFERENCE
    * corpus, which is how production pipelines actually run the filter:
    * train on trusted text, score candidates, keep the fluent band).
    * Unlike [[lmTypicality]]'s self-trained model, `train` and `scored`
    * are separate — so backoff genuinely fires on unseen bigrams instead
    * of being dead code.
    *
    * Per transition (prev, w) in a scored doc:
    * `log10(B(prev,w)/U(prev))` when the bigram was seen in train, else
    * `log10(alpha · (U(w) | 0.5)/T)` (stupid backoff, Brants et al.;
    * 0.5 is the OOV pseudo-count). Output: (doc_id, n_trans, avg_logp)
    * with avg_logp = exact-decimal Σlp / n rounded to 6 dp (perplexity
    * = 10^-avg_logp, monotone — the band thresholds apply directly).
    *
    * Scale shape: transitions come from one lag window per doc
    * (partition-parallel, no self-join); unigram/bigram model tables
    * join back on high-cardinality keys (w, (pw,w)) — nothing is
    * broadcast, because a 100 TB reference vocabulary isn't
    * broadcastable; each lp is a single IEEE expression summed exactly
    * (the dsum parity pattern), so a SQL oracle reproduces the hash.
    */
  def stupidBackoffScore(train: DataFrame, scored: DataFrame,
      alpha: Double = 0.4): DataFrame = {
    import graft.functions.Exact.dsum
    // token transitions come MAP-SIDE from the split array (adjacent
    // elements zipped) — the r20 shape derived them with a per-doc
    // lag() window, paying a shuffle + sort of every token row on BOTH
    // corpora for what is a row-local adjacency. The train token total
    // likewise rides as a broadcast 1-row aggregate instead of a
    // driver-side count action (alpha/total evaluates to the identical
    // IEEE double either way).
    def bigrams(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), split(col("text"), " ").as("wa"))
        .select(col("doc_id"), explode(zip_with(
          slice(col("wa"), lit(1), greatest(size(col("wa")) - 1, lit(0))),
          slice(col("wa"), lit(2), greatest(size(col("wa")) - 1, lit(0))),
          (a, b) => struct(a.as("pw"), b.as("w")))).as("t"))
        .select(col("doc_id"), col("t.pw").as("pw"), col("t.w").as("w"))
    val trainArr = graft.util.Scratch.cached(
      train.select(col("doc_id"), split(col("text"), " ").as("wa")))
    val uniCounts = trainArr.select(explode(col("wa")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("u"))
    val totalDf = broadcast(
      trainArr.agg(sum(size(col("wa"))).cast(DoubleType).as("_total")))
    val bgCounts = trainArr
      .select(col("doc_id"), explode(zip_with(
        slice(col("wa"), lit(1), greatest(size(col("wa")) - 1, lit(0))),
        slice(col("wa"), lit(2), greatest(size(col("wa")) - 1, lit(0))),
        (a, b) => struct(a.as("pw"), b.as("w")))).as("t"))
      .groupBy(col("t.pw").as("pw"), col("t.w").as("w"))
      .agg(count(lit(1)).as("b"))
    bigrams(scored)
      .join(bgCounts, Seq("pw", "w"), "left")
      .join(uniCounts.select(col("w").as("pw"), col("u").as("u_pw")), Seq("pw"), "left")
      .join(uniCounts, Seq("w"), "left")
      .crossJoin(totalDf)
      .withColumn("lp",
        when(col("b").isNotNull, log10(col("b").cast(DoubleType) / col("u_pw")))
          .otherwise(log10(coalesce(col("u").cast(DoubleType), lit(0.5)) *
            (lit(alpha) / col("_total")))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"),
        round(dsum(col("lp"), 12) / count(lit(1)), 6).as("avg_logp"))
  }

  /** BM25 retrieval: score every document against a fixed bag of query
    * terms and keep the top k. The inverted structure is implicit: the
    * explode feeds a map-side-combined (doc, term) count, document
    * frequencies are a tiny per-term aggregate joined back by broadcast,
    * and the per-doc score sum runs on ≤|terms| rows per doc. Top-k is
    * orderBy+limit — TakeOrdered, each partition keeps k rows, no global
    * sort. Per-term score terms are single IEEE expressions summed
    * exactly in decimal (the lmTypicality parity pattern), so the DuckDB
    * oracle reproduces the hash bit-for-bit.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.functions.Exact.dsum
    val lengths = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast(DoubleType).as("dl"))
    // scalar stats (N, avgdl) as a broadcast 1-row frame — stays a pure
    // plan, no driver action
    val stats = lengths.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).cast(DoubleType).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast(DoubleType).as("df"))
    val term = tf
      .join(broadcast(dfreq), "w")
      .join(lengths, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    term.groupBy("doc_id")
      .agg(round(dsum(col("contrib"), 12), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Intra-document repetition signals (the Gopher/MassiveText quality
    * rules): fraction of word-trigram occurrences that are repeats, and
    * the share of the single most frequent bigram — boilerplate and
    * looping generations spike both. Two explode→two-phase-count
    * aggregations (map-side combined); the flag applies the published
    * thresholds (dup-trigram > 0.30, top-bigram > 0.18) to the ROUNDED
    * values so the oracle's boundary is identical.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
    def gramStats(n: Int): DataFrame = base
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - (n - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until n).map(j => element_at(col("t"), col("i") + j)): _*).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as(s"max$n"),
        sum(col("c")).as(s"tot$n"), count(lit(1)).as(s"dist$n"))
    gramStats(2).join(gramStats(3), "doc_id")
      .select(col("doc_id"),
        round(col("max2").cast(DoubleType) / col("tot2").cast(DoubleType), 6)
          .as("top_bigram_frac"),
        round((col("tot3") - col("dist3")).cast(DoubleType) /
          col("tot3").cast(DoubleType), 6).as("dup_trigram_frac"))
      .withColumn("flagged",
        col("dup_trigram_frac") > 0.30 || col("top_bigram_frac") > 0.18)
  }

  /** Overlapping token-window chunking (the RAG / context-window prep
    * pass): windows of `size` tokens starting every `size − overlap`
    * tokens, last window ragged, short docs yield exactly one chunk.
    * Emits compact rows (chunk token count + md5 of the chunk text) so
    * a 100 TB chunking run shuffles digests, not text — downstream
    * embedding/indexing reads the text by (doc_id, start) locally.
    * Pure explode arithmetic: no UDF, no driver state.
    */
  def chunkWindows(docs: DataFrame, size: Int = 64, overlap: Int = 16): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size $size > overlap $overlap")
    val step = size - overlap
    val toks = tokens(col("text"))
    docs
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("t")))
      .withColumn("i", explode(sequence(lit(0),
        greatest(lit(0), floor((col("n") - overlap - 1) / step).cast(IntegerType)))))
      .select(col("doc_id"), col("i").as("chunk_id"),
        concat_ws(" ", slice(col("t"), col("i") * step + 1, lit(size))).as("chunk"))
      .select(col("doc_id"), col("chunk_id").cast(LongType),
        org.apache.spark.sql.functions.size(tokens(col("chunk")))
          .cast(LongType).as("n_tokens"),
        md5(col("chunk")).as("chunk_md5"))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text,
    * plus a 60-bit numeric bucket key for range-partitioned storage.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintCol(col("text")).as("fp"),
      conv(substring(fingerprintCol(col("text")), 1, 15), 16, 10)
        .cast(LongType).as("fp_bucket"))

  /** The whitespace-normalized content fingerprint as a COLUMN — the
    * [[qualityCol]] rationale: row-local, so pipelines compute it
    * map-side instead of self-joining a derived frame.
    */
  def fingerprintCol(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** PII patterns — deliberately lookaround-free and ASCII so the SAME
    * pattern runs identically under Java regex (engine) and RE2 (DuckDB
    * oracle), the [[BpeSplitPattern]] discipline. The usual first-pass
    * scrub set of a web-corpus pipeline (C4-style): emails, IPv4
    * addresses, US-shaped phone numbers.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String =
    "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern: String =
    "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrub: replace emails / IPv4s / phone numbers with typed mask
    * tokens and report per-document match counts — the
    * detect-then-redact pass every compliance-bound corpus pipeline
    * runs before training. Pure codegen'd regexp expressions, map-side
    * only: at 100 TB this runs at scan speed with zero shuffles (the
    * gate's sort is presentation, not the operator).
    *
    * Ordering matters and is fixed: emails first (an email must not
    * first lose its digits to the phone pattern), then IPs (dotted
    * quads must not be half-eaten by phone), then phones.
    */
  def piiScrub(docs: DataFrame, text: Column = col("text")): DataFrame = {
    // six regex passes per document — heavy enough that the input's
    // split layout must not serialize it ([[graft.util.Widen]]:
    // conditional, no-op on a many-split input)
    val wide = graft.util.Widen.forHeavyMap(docs)
    return piiScrubOn(wide, text)
  }

  private def piiScrubOn(docs: DataFrame, text: Column): DataFrame = {
    // each count runs on the PREVIOUS stage's output, so counts always
    // equal the number of replacements that stage actually made
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    val afterPhone = regexp_replace(afterIp, PhonePattern, "<PHONE>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
        .cast(LongType).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Pattern), lit(0)))
        .cast(LongType).as("n_ips"),
      size(regexp_extract_all(afterIp, lit(PhonePattern), lit(0)))
        .cast(LongType).as("n_phones"),
      md5(afterPhone).as("scrubbed_md5"))
  }

  /** HTML-stripping regexes — lookaround-free, shared verbatim with the
    * RE2 oracle (the [[EmailPattern]] discipline). `(?is)` = DOTALL +
    * case-insensitive, supported identically by Java regex and RE2;
    * non-greedy `.*?` keeps each element's strip local.
    */
  val HtmlScriptPattern: String = "(?is)<script[^>]*>.*?</script>"
  val HtmlStylePattern: String = "(?is)<style[^>]*>.*?</style>"
  val HtmlCommentPattern: String = "(?s)<!--.*?-->"
  val HtmlTagPattern: String = "(?s)<[^>]*>"
  val HtmlTitlePattern: String = "(?is)<title[^>]*>(.*?)</title>"

  /** Main-text extraction from raw HTML — the crawl→text ingestion step
    * (what a WARC response body needs before any quality signal runs).
    * Fixed order: script and style elements drop WITH their content,
    * comments drop, remaining tags drop, the finite common entity set
    * decodes (after tag-stripping, so a decoded `&lt;` stays literal
    * text and cannot re-open a tag), whitespace runs collapse. Pure
    * codegen'd regexp/replace chain, map-side, zero shuffles — scan
    * speed at 100 TB, the [[piiScrub]] shape. Output:
    * (doc_id, title, clean_text, n_chars).
    */
  def htmlExtract(docs: DataFrame, html: Column = col("html")): DataFrame = {
    val noScript = regexp_replace(html, HtmlScriptPattern, " ")
    val noStyle = regexp_replace(noScript, HtmlStylePattern, " ")
    val noComment = regexp_replace(noStyle, HtmlCommentPattern, " ")
    val noTags = regexp_replace(noComment, HtmlTagPattern, " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&copy;" -> "©",
      "&amp;" -> "&") // &amp; LAST: "&amp;lt;" must yield "&lt;", not "<"
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    val clean = trim(regexp_replace(decoded, "\\s+", " "))
    docs.select(col("doc_id"),
      regexp_extract(html, HtmlTitlePattern, 1).as("title"),
      clean.as("clean_text"),
      length(clean).cast(LongType).as("n_chars"))
  }

  /** URL canonicalization regexes — lookaround-free, shared verbatim
    * with the RE2 oracle (the [[EmailPattern]] discipline). Replacement
    * strings differ per dialect only in group syntax ($1 vs \1).
    */
  val UrlSchemeHostPattern: String = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
  val UrlFragmentPattern: String = "#.*$"
  val UrlHttpPortPattern: String = "^(http://[^/:?#]+):80([/?#]|$)"
  val UrlHttpsPortPattern: String = "^(https://[^/:?#]+):443([/?#]|$)"
  val UrlTrackMidPattern: String = "&(utm_[a-z]+|fbclid|gclid)=[^&#]*"
  val UrlTrackFirstPattern: String = "\\?(utm_[a-z]+|fbclid|gclid)=[^&#]*&"
  val UrlTrackOnlyPattern: String = "\\?(utm_[a-z]+|fbclid|gclid)=[^&#]*$"

  /** Canonicalize a URL for crawl dedup — the normalization every
    * web-corpus pipeline runs before exact dedup, because the same page
    * arrives under trivially different spellings:
    *
    *  1. scheme + host lowercased (path/query stay case-sensitive)
    *  2. fragment dropped (never sent to the server)
    *  3. default ports stripped (http:80, https:443)
    *  4. tracking params removed (utm_*, fbclid, gclid)
    *  5. dangling `?` then trailing `/` stripped (host root unifies
    *     with bare host)
    *
    * A string without a scheme://host prefix is untouched by the
    * scheme/host/port rules (the extract matches empty, those replaces
    * are anchored); the query/fragment rules still apply — tracking
    * params are junk on a protocol-relative URL too.
    * Pure codegen'd regexp/string expressions — map-side, zero shuffle,
    * scan-speed at 100 TB.
    */
  def canonicalizeUrl(u: Column): Column = {
    val lowered = concat(
      lower(regexp_extract(u, UrlSchemeHostPattern, 0)),
      regexp_replace(u, UrlSchemeHostPattern, ""))
    val noFrag = regexp_replace(lowered, UrlFragmentPattern, "")
    val noPort = regexp_replace(
      regexp_replace(noFrag, UrlHttpPortPattern, "$1$2"),
      UrlHttpsPortPattern, "$1$2")
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noPort, UrlTrackMidPattern, ""),
        UrlTrackFirstPattern, "?"),
      UrlTrackOnlyPattern, "")
    regexp_replace(regexp_replace(noTrack, "\\?$", ""), "([^/])/$", "$1")
  }

  /** URL-canonical dedup: group documents by canonical URL, lowest
    * doc_id survives — [[Dedup.exactSurvivors]] semantics on the
    * canonical key, reported per document. One shuffle on the canonical
    * string (could be its md5 at scale; the gate keeps the string so
    * the oracle output is readable).
    */
  def urlDedup(docs: DataFrame, url: Column): DataFrame = {
    val withCanon = docs.select(col("doc_id"), url.as("url"))
      .withColumn("canonical", canonicalizeUrl(col("url")))
      // cached: feeds both the winner aggregate and the join back — the
      // regex chain must not run twice (the electSurvivors rule)
      .cache()
    graft.util.Scratch.register(withCanon): Unit // result-reachable; see Scratch
    val winners = withCanon.groupBy("canonical")
      .agg(min(col("doc_id")).as("survivor"))
    withCanon.join(winners, "canonical")
      .select(col("doc_id"), col("url"), col("canonical"),
        (col("doc_id") === col("survivor")).as("is_survivor"))
  }

  /** Cross-document boilerplate detection (the CCNet/RefinedWeb line-level
    * dedup shape): a SEGMENT occurring verbatim in ≥ `minDocs` distinct
    * documents is boilerplate (navigation chrome, license headers,
    * templated footers); reported per document as the boilerplate-segment
    * ratio — the standard removal/weighting signal. Segmenter here:
    * consecutive non-overlapping `segWords`-word windows (this corpus has
    * no newlines; a newline or sentence segmenter is the same plan with a
    * different split expression).
    *
    * Scale shape: segments ship as md5 digests; one shuffle keyed on the
    * digest to count distinct carrying documents (cardinality = distinct
    * segments, never documents²), one shuffle back on doc_id for the
    * per-document aggregate. A 100 TB corpus with heavy boilerplate is
    * exactly where digest-keyed counting stays balanced: hot segments
    * concentrate COUNTS, not rows, after the map-side partial aggregate.
    */
  def boilerplate(docs: DataFrame, segWords: Int = 5,
      minDocs: Int = 2): DataFrame = {
    // positional (non-distinct) segments: a document repeating the
    // boilerplate twice has both occurrences counted in its ratio
    val segs = docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      // the >= guard keeps sequence() ascending (sequence(1, 0) is
      // DESCENDING — the lmTypicality trap); sub-segment docs have no
      // segments and no output row
      .filter(size(col("w")) >= segWords)
      .select(col("doc_id"), col("w"),
        // `/` on ints yields double — cast back for sequence()
        explode(sequence(lit(1),
          (size(col("w")) / segWords).cast(IntegerType))).as("i"))
      .select(col("doc_id"),
        md5(array_join(slice(col("w"), (col("i") - 1) * segWords + 1,
          lit(segWords)), " ")).as("sh"))
      // cached: feeds BOTH the carrier count and the join back — without
      // it the tokenize+slice+md5 work executes twice (the electSurvivors
      // lesson; at 100 TB the double pass is a double corpus scan)
      .cache()
    graft.util.Scratch.register(segs): Unit // result-reachable; see Scratch
    val carriers = segs.select(col("doc_id"), col("sh")).distinct()
      .groupBy("sh").agg(count(lit(1)).as("nd"))
    segs.join(carriers, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("nd") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        round(col("n_boiler").cast(DoubleType) / col("n_segs"), 6))
  }
}
