package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.sources.{Tables => T}

/** Training-data sampling / curation pack over `documents` — the
  * corpus-preparation operations a 100 TB pretraining pipeline runs after
  * dedup and quality filtering: deterministic subsampling, stratified
  * rates, shard routing, sequence packing, benchmark decontamination, and
  * mixture planning. All decisions hash-derived (md5), so every query has
  * an exact DuckDB oracle. Operators in `operators/Sampling.scala`.
  */
object SamplePack extends QueryPack {

  private val stratRates =
    Map("en" -> 0.125, "de" -> 0.5, "fr" -> 0.75)

  // Exact all-pairs max-cosine oracle shared by BOTH regimes of
  // sample_decontaminate_semantic (broadcast and forced-IVF).
  private val semanticDecontOracle: String =
    """WITH b AS (
      |  SELECT embedding FROM embeddings WHERE vec_id % 25 = 0
      |), t AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 <> 0
      |), sims AS (
      |  SELECT t.vec_id, round(max(
      |    list_sum(list_transform(list_zip(t.embedding, b.embedding),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))), 5) AS max_sim
      |  FROM t CROSS JOIN b GROUP BY t.vec_id
      |)
      |SELECT vec_id, max_sim FROM sims
      |WHERE max_sim >= 0.3 ORDER BY vec_id""".stripMargin

  private val mixTargets =
    Map("en" -> 0.40, "de" -> 0.20, "fr" -> 0.15, "es" -> 0.15, "zh" -> 0.10)


  /** sample_curation_v3's oracle funnel as a reusable CTE chain (ends
    * in `q`, `lm`, `dup`) — shared verbatim by the v3 gate and the
    * packed-delivery capstone so the funnel replay cannot drift between
    * them.
    */
  private val CurationV3Ctes: String =
    s"""ttok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             |         generate_subscripts(string_split(text, ' '), 1) AS i
             |  FROM documents WHERE doc_id % 2 = 0
             |), uni AS (SELECT w, count(*) AS u FROM ttok GROUP BY w),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM ttok),
             |bgc AS (
             |  SELECT pw, w, count(*) AS b FROM (
             |    SELECT lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw, w
             |    FROM ttok) x
             |  WHERE pw IS NOT NULL GROUP BY pw, w
             |), stok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             |         generate_subscripts(string_split(text, ' '), 1) AS i
             |  FROM documents WHERE doc_id % 2 = 1
             |), sbg AS (
             |  SELECT doc_id, pw, w FROM (
             |    SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw, w
             |    FROM stok) x
             |  WHERE pw IS NOT NULL
             |), lpr AS (
             |  SELECT sbg.doc_id,
             |         CASE WHEN bgc.b IS NOT NULL
             |              THEN log10(CAST(bgc.b AS DOUBLE) / up.u)
             |              ELSE log10(coalesce(CAST(uw.u AS DOUBLE), 0.5)
             |                         * (CAST(0.4 AS DOUBLE) / tot.t))
             |         END AS lp
             |  FROM sbg
             |  LEFT JOIN bgc ON bgc.pw = sbg.pw AND bgc.w = sbg.w
             |  LEFT JOIN uni up ON up.w = sbg.pw
             |  LEFT JOIN uni uw ON uw.w = sbg.w
             |  CROSS JOIN tot
             |), lm AS (
             |  SELECT doc_id,
             |    round(CAST(SUM(CAST(lp AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS avg_logp
             |  FROM lpr GROUP BY doc_id
             |), lw AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id % 2 = 1
             |), q AS (
             |  SELECT doc_id,
             |    round(least(CAST(len(w) AS DOUBLE)/200.0, 1.0)*0.5
             |      + CAST(len(list_distinct(w)) AS DOUBLE)/len(w)*0.3
             |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
             |              /len(w)*5.0, 1.0)*0.2, 6) AS quality
             |  FROM lw
             |), tri AS (
             |  SELECT DISTINCT doc_id,
             |         concat_ws(' ', cw,
             |           lead(cw,1) OVER (PARTITION BY doc_id ORDER BY i),
             |           lead(cw,2) OVER (PARTITION BY doc_id ORDER BY i)) AS sh
             |  FROM (SELECT doc_id, w AS cw, i FROM stok) c
             |  QUALIFY lead(cw,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
             |), keepsh AS (
             |  SELECT sh FROM (SELECT sh, count(*) AS nd FROM tri GROUP BY sh)
             |  WHERE nd <= (SELECT greatest(64, count(*) // 100)
             |               FROM documents WHERE doc_id % 2 = 1)
             |), utri AS (SELECT tri.doc_id, tri.sh FROM tri JOIN keepsh USING (sh)),
             |sz AS (SELECT doc_id, count(*) AS n FROM utri GROUP BY doc_id),
             |dup AS (
             |  SELECT DISTINCT db AS doc_id FROM (
             |    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS icnt
             |    FROM utri a JOIN utri b ON a.sh = b.sh AND a.doc_id < b.doc_id
             |    GROUP BY 1, 2) p
             |  JOIN sz sa ON sa.doc_id = p.da JOIN sz sb ON sb.doc_id = p.db
             |  WHERE icnt / least(sa.n, sb.n) >= 0.9
             |)""".stripMargin

  /** sample_curation_v3's funnel (quality floor AND stupid-backoff
    * fluency band AND not containment-duplicated) as a frame builder —
    * shared with the packed-delivery capstone.
    */
  private def curationV3Kept(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val all = T.documents(s, d).select(col("doc_id"), col("text"))
    val ref = all.filter(col("doc_id") % 2 === 0)
    val cand = all.filter(col("doc_id") % 2 === 1)
    val lm = graft.operators.TextOps.stupidBackoffScore(ref, cand)
      .select(col("doc_id"), col("avg_logp"))
    val q = graft.operators.TextOps.qualityScore(cand)
    // the MEASURED hotCap rule (r17 probe + r18 sf1 funnel row: the
    // uncapped postings join was the funnel's super-linear leg —
    // 2.8 s → 78 s at 10× the corpus, vs recall 1.0 at cap ∝ corpus)
    val dupDrop = graft.operators.Dedup.containmentPairs(cand, 3, 0.9,
        hotCap = Some(graft.operators.Dedup.containmentAutoCap(cand.count())))
      .select(col("db").as("doc_id")).distinct()
    q.join(lm, "doc_id")
      .join(dupDrop, Seq("doc_id"), "left_anti")
      .filter(col("quality") >= 0.34 && col("avg_logp") >= -1.52)
  }

  override val defs: Seq[QueryDef] = Seq(

    // Deterministic Bernoulli sample at p = 0.25: pure map-side filter on
    // md5(doc_id) — no shuffle, no RNG, retry-stable, engine-portable.
    QueryDef(
      "sample_bernoulli",
      (s, d) =>
        Sampling.bernoulli(T.documents(s, d), col("doc_id"), 0.25)
          .select(col("doc_id"), col("source"), col("lang"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, source, lang FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)),1,8) < '40000000'
             |ORDER BY doc_id""".stripMargin)),

    // Stratified rates per language (unlisted strata keep rate 1.0):
    // downsample dominant en, keep the rare tail whole — the standard
    // rebalancing move before mixture training. Still one map-side CASE
    // filter.
    QueryDef(
      "sample_stratified",
      (s, d) =>
        Sampling.stratified(T.documents(s, d), col("doc_id"), col("lang"),
            stratRates)
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)),1,8) <
             |  CASE lang WHEN 'fr' THEN 'c0000000'
             |            WHEN 'de' THEN '80000000'
             |            WHEN 'en' THEN '20000000'
             |            ELSE 'g' END
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic 16-way shard routing: hex-prefix of the key hash.
    // Shard balance (count + token mass) is the thing an operator checks
    // before pointing 16 training readers at the split.
    QueryDef(
      "sample_shard_sizes",
      (s, d) =>
        T.documents(s, d)
          .groupBy(Sampling.shard(col("doc_id")).as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"))
          .orderBy("shard"),
      Some("""SELECT substr(md5(CAST(doc_id AS VARCHAR)),1,1) AS shard,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars
             |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin)),

    // Fixed-boundary sequence packing at budget 512: per-source running
    // token sum → seq_id = tokens-before-me div 512. One window per
    // source partition; deterministic doc_id order.
    QueryDef(
      "sample_pack_sequences",
      (s, d) =>
        Sampling.packSequences(T.documents(s, d), col("doc_id"),
            col("source"), col("text"), 512)
          .select(col("doc_id"), col("source"), col("tok"), col("seq_id"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    greatest(1, CAST(ceil(length(text)/4.0) AS BIGINT)) AS tok
             |  FROM documents
             |), c AS (
             |  SELECT doc_id, source, tok,
             |    SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t
             |)
             |SELECT doc_id, source, tok,
             |  CAST((cum - tok) // 512 AS BIGINT) AS seq_id
             |FROM c ORDER BY doc_id""".stripMargin)),

    // GLOBAL concat-and-cut packing with document SPANNING (round 16):
    // the GPT-pretraining batch builder — one global token stream in
    // doc_id order cut into 256-token sequences, a document crossing a
    // boundary spanning consecutive sequences. The engine computes the
    // global prefix sum with the two-phase distributed scan
    // (range-partition → bounded per-range sums collect → broadcast
    // base offsets → within-range window); the oracle computes it with
    // ONE sequential window — equality proves the distributed scan
    // loses/shifts nothing, and the exploded per-(sequence, document)
    // composition puts the boundary arithmetic itself in the hash.
    QueryDef(
      "sample_pack_spans",
      (s, d) =>
        Sampling.packSequencesGlobal(T.documents(s, d), col("doc_id"),
            col("text"), seqLen = 256)
          .select(col("seq_id"), col("doc_key").as("doc_id"),
            col("tok_start"), col("tok_end"), col("tokens_in_seq"))
          .orderBy("seq_id", "doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    greatest(1, CAST(ceil(length(text)/4.0) AS BIGINT)) AS tok
             |  FROM documents
             |), c AS (
             |  SELECT doc_id, tok,
             |    CAST(SUM(tok) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS tok_end
             |  FROM t
             |), s AS (
             |  SELECT doc_id, tok, tok_end, tok_end - tok AS tok_start FROM c
             |)
             |SELECT gs.seq_id, s.doc_id, s.tok_start, s.tok_end,
             |  least(s.tok_end, (gs.seq_id + 1) * 256)
             |    - greatest(s.tok_start, gs.seq_id * 256) AS tokens_in_seq
             |FROM s, unnest(generate_series(
             |          CAST(s.tok_start // 256 AS BIGINT),
             |          CAST((s.tok_end - 1) // 256 AS BIGINT))) AS gs(seq_id)
             |ORDER BY gs.seq_id, s.doc_id""".stripMargin)),

    // Tokenizer-EXACT packing (round 17): packSequencesGlobal composed
    // with the REAL trained BPE tokenizer — the delivery artifact a
    // training job actually consumes packs by the token counts its data
    // loader will see (Bpe.train's 30-merge table → encodeDocs
    // n_tokens), not the chars/4 estimate. Iteratively-trained BPE has
    // no recomputable SQL oracle, so the gate verifies as a REPLAY
    // DIGEST (round 20): the engine digests its packed spans in
    // (seq_id, doc) order and the oracle looks the independent Python
    // replay's pack256_digest (bpe_replay.py's sequential
    // concat-and-cut, via gen_replay_digests.py) up by the corpus
    // fingerprint — so a drifted merge table, a wrong token count, OR a
    // prefix-sum/span boundary bug in packSequencesGlobalTok all fail
    // the driver gate itself, at whatever scale it runs. The
    // distributed prefix sum additionally stays hash-checked through
    // sample_pack_spans / sample_curation_packed's estimator-count
    // oracles.
    QueryDef(
      "sample_pack_bpe",
      (s, d) => {
        val base = T.documents(s, d).select(col("doc_id"), col("text"))
        val merges = graft.operators.Bpe.train(base, numMerges = 30)
        val counts = graft.operators.Bpe.encodeDocs(base, merges)
          .select(col("doc_id"), col("n_tokens"))
        orderedLineDigest(
          Sampling.packSequencesGlobalTok(counts, col("doc_id"),
            col("n_tokens"), seqLen = 256),
          Seq(col("seq_id"), col("doc_key")),
          concat_ws("\t", col("seq_id"), col("doc_key"),
            col("tok_start"), col("tok_end"), col("tokens_in_seq")))
      },
      Some(replayDigestOracle("pack_bpe_256"))),

    // Benchmark decontamination: docs sharing ≥1 distinct word-8-gram
    // with the benchmark set (here: doc_id % 10 = 0 plays the eval set).
    // Join key = md5 digest of the shingle (16-byte shuffle rows, text
    // never shuffles); benchmark side broadcast.
    QueryDef(
      "sample_decontaminate",
      (s, d) => {
        val docs = T.documents(s, d)
        Sampling.decontaminate(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0),
            col("doc_id"), col("text"))
          .withColumnRenamed("doc_key", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text,' ') AS w FROM documents
             |), sg AS (
             |  SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+7],' ')) AS sh
             |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-7)) AS i
             |        FROM w WHERE len(w) >= 8)
             |), bench AS (
             |  SELECT DISTINCT sh FROM sg WHERE doc_id % 10 = 0
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
             |FROM sg JOIN bench USING (sh) WHERE doc_id % 10 <> 0
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // DSIR importance weights (round 13): Xie et al.'s hashed-n-gram
    // importance resampling — the published "select web data that looks
    // like the trusted corpus" recipe. Target = the en documents; every
    // doc scored by the log-likelihood ratio of its hashed word-bigram
    // buckets under target vs raw counts (add-one smoothed), averaged
    // via the exact-decimal parity pattern. Count tables are ≤ 8192
    // rows BY CONSTRUCTION (the hashed-feature trick) so they broadcast
    // at any corpus scale.
    QueryDef(
      "sample_dsir_weights",
      (s, d) => {
        val docs = T.documents(s, d)
        Sampling.dsirWeights(docs, docs.filter(col("lang") === "en"),
            col("doc_id"), col("text"))
          .withColumnRenamed("doc_key", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH rtok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             |         generate_subscripts(string_split(text, ' '), 1) AS i
             |  FROM documents
             |), rbg AS (
             |  SELECT doc_id,
             |         CAST(('0x' || substr(md5(concat(pw, ' ', w)), 1, 8)) AS BIGINT)
             |           % 8192 AS b
             |  FROM (SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw, w
             |        FROM rtok) x
             |  WHERE pw IS NOT NULL
             |), ttok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             |         generate_subscripts(string_split(text, ' '), 1) AS i
             |  FROM documents WHERE lang = 'en'
             |), tbg AS (
             |  SELECT CAST(('0x' || substr(md5(concat(pw, ' ', w)), 1, 8)) AS BIGINT)
             |           % 8192 AS b
             |  FROM (SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw, w
             |        FROM ttok) x
             |  WHERE pw IS NOT NULL
             |), ct AS (SELECT b, count(*) AS ct FROM tbg GROUP BY b),
             |cr AS (SELECT b, count(*) AS cr FROM rbg GROUP BY b),
             |tt AS (SELECT CAST(count(*) AS DOUBLE) + 8192 AS t FROM tbg),
             |rt AS (SELECT CAST(count(*) AS DOUBLE) + 8192 AS r FROM rbg),
             |lr AS (
             |  SELECT rbg.doc_id,
             |    log10(CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) / tt.t)
             |      - log10(CAST(cr.cr + 1 AS DOUBLE) / rt.r) AS lr
             |  FROM rbg LEFT JOIN ct USING (b) JOIN cr USING (b)
             |  CROSS JOIN tt CROSS JOIN rt
             |)
             |SELECT doc_id, count(*) AS n_feats,
             |  round(CAST(SUM(CAST(lr AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6)
             |    AS dsir_score
             |FROM lr GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // SURGICAL decontamination (round 13): instead of dropping a
    // contaminated doc, cut exactly the tokens covered by a benchmark
    // 8-gram and keep the rest — the Dolma-style span scrub. Same
    // fixture split as sample_decontaminate; the oracle replays the
    // REWRITE itself (covered positions → kept tokens → cleaned-text
    // md5), so a span boundary off by one token fails the hash.
    QueryDef(
      "sample_decontaminate_scrub",
      (s, d) => {
        val docs = T.documents(s, d)
        Sampling.scrubContaminatedSpans(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0),
            col("doc_id"), col("text"))
          .withColumnRenamed("doc_key", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text,' ') AS w FROM documents
             |), posx AS (
             |  SELECT doc_id, i, md5(array_to_string(w[i:i+7],' ')) AS sh
             |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-7)) AS i
             |        FROM w WHERE len(w) >= 8)
             |), bench AS (
             |  SELECT DISTINCT sh FROM posx WHERE doc_id % 10 = 0
             |), cov AS (
             |  SELECT DISTINCT doc_id, p FROM (
             |    SELECT doc_id, unnest(generate_series(i, i+7)) AS p
             |    FROM posx JOIN bench USING (sh) WHERE doc_id % 10 <> 0)
             |), tok AS (
             |  SELECT doc_id, p, w[p] AS tok
             |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS p
             |        FROM w WHERE doc_id % 10 <> 0)
             |), kept AS (
             |  SELECT t.doc_id, t.p, t.tok FROM tok t
             |  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
             |  WHERE c.p IS NULL
             |), stats AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
             |  FROM tok GROUP BY doc_id
             |), cl AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |         md5(string_agg(tok, ' ' ORDER BY p)) AS m
             |  FROM kept GROUP BY doc_id
             |)
             |SELECT s.doc_id, s.n_tokens,
             |  s.n_tokens - coalesce(cl.n_kept, CAST(0 AS BIGINT)) AS n_removed,
             |  coalesce(cl.m, md5('')) AS cleaned_md5
             |FROM stats s LEFT JOIN cl USING (doc_id)
             |ORDER BY s.doc_id""".stripMargin)),

    // Semantic decontamination: training vectors whose max cosine vs
    // the benchmark subset (vec_id % 25 = 0 plays the eval set)
    // reaches 0.3 — the paraphrase-level complement of the 8-gram
    // check above. Exact all-pairs oracle; the Spark side is one
    // map-side pass (benchmark broadcast as a single array row).
    QueryDef(
      "sample_decontaminate_semantic",
      (s, d) => {
        val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
        Sampling.decontaminateSemantic(
            e.filter(col("vec_id") % 25 =!= 0),
            e.filter(col("vec_id") % 25 === 0), 0.3)
          .orderBy("vec_id")
      },
      Some(semanticDecontOracle)),

    // The SAME operator through the benchmark-too-big-to-broadcast
    // regime (benchBroadcastCap = 0 forces it): cells fitted on the
    // benchmark, train probes its nassign nearest, max via equi-join on
    // cell — no broadcast of either side. Oracle-exact by construction:
    // the benchmark here is a SUBSET of train (the realistic "eval set
    // leaked into the training corpus verbatim" contamination shape), so
    // every contaminated vector's argmax is its own copy, which assigns
    // to the identical cell deterministically — the approximate scale
    // path reproduces the exact all-pairs answer bit-for-bit at the
    // near-dup threshold (0.9; max NON-self cross similarity in this
    // table is 0.60 at sf0.1). Weak-match recall (threshold 0.3, where
    // no exact pin is possible for ANY ANN method) is asserted in
    // SamplingSpec instead.
    QueryDef(
      "sample_decontaminate_semantic_ivf",
      (s, d) => {
        val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
        Sampling.decontaminateSemantic(
            e, e.filter(col("vec_id") % 25 === 0), 0.9,
            benchBroadcastCap = 0)
          .orderBy("vec_id")
      },
      Some("""WITH b AS (
             |  SELECT embedding FROM embeddings WHERE vec_id % 25 = 0
             |), t AS (
             |  SELECT vec_id, embedding FROM embeddings
             |), sims AS (
             |  SELECT t.vec_id, round(max(
             |    list_sum(list_transform(list_zip(t.embedding, b.embedding),
             |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             |    / (sqrt(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
             |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))), 5) AS max_sim
             |  FROM t CROSS JOIN b GROUP BY t.vec_id
             |)
             |SELECT vec_id, max_sim FROM sims
             |WHERE max_sim >= 0.9 ORDER BY vec_id""".stripMargin)),

    // Deterministic epoch ordering: md5(epoch:key) is the sort key —
    // each epoch a different reproducible permutation, no RNG, no
    // global row-number (the order IS the sort; readers consume
    // range-partitioned shards in key order).
    QueryDef(
      "sample_epoch_order",
      (s, d) =>
        Sampling.epochOrder(
            T.documents(s, d).select(col("doc_id")), col("doc_id"), epoch = 1),
      Some("""SELECT doc_id, md5('1:' || CAST(doc_id AS VARCHAR)) AS sort_key
             |FROM documents
             |ORDER BY sort_key, doc_id""".stripMargin)),

    // Round-10 curation capstone: the NEW operators composed end-to-end
    // in ONE lazy plan — quality floor ∧ boilerplate-ratio cap ∧
    // duplicated-span-coverage cap, survivors put in deterministic
    // epoch-1 training order. (The round-6 capstone composes the
    // round-4 operators; this one composes round 10's.)
    QueryDef(
      "sample_curation_v2",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("text"))
        val br = graft.operators.TextOps.boilerplate(docs, segWords = 5, minDocs = 2)
          .select(col("doc_id"), col("boiler_ratio"))
        val cv = graft.operators.Dedup.spanCoverage(docs, col("doc_id"), col("text"), 8)
          .select(col("doc_key").as("doc_id"), col("coverage"))
        // quality rides the scan as a column (row-local); only the two
        // corpus-level aggregations join
        val kept = docs
          .select(col("doc_id"),
            graft.operators.TextOps.qualityCol(col("text")).as("quality"))
          .join(br, "doc_id").join(cv, "doc_id")
          .filter(col("quality") >= 0.34 &&
            col("boiler_ratio") <= 0.25 && col("coverage") <= 0.6)
        Sampling.epochOrder(kept, col("doc_id"), epoch = 1)
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(lower(text),' ') AS w,
             |         string_split(text,' ') AS wr FROM documents
             |), q AS (
             |  SELECT doc_id,
             |    round(least(CAST(len(w) AS DOUBLE)/200.0, 1.0)*0.5
             |      + CAST(len(list_distinct(w)) AS DOUBLE)/len(w)*0.3
             |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
             |              /len(w)*5.0, 1.0)*0.2, 6) AS quality
             |  FROM w
             |), seg AS (
             |  SELECT doc_id, md5(array_to_string(wr[(i-1)*5+1:(i-1)*5+5],' ')) AS sh
             |  FROM (SELECT doc_id, wr, unnest(generate_series(1, len(wr)//5)) AS i
             |        FROM w WHERE len(wr) >= 5)
             |), nd AS (
             |  SELECT sh, count(DISTINCT doc_id) AS nd FROM seg GROUP BY sh
             |), br AS (
             |  SELECT doc_id,
             |         round(CAST(count(*) FILTER (nd.nd >= 2) AS DOUBLE)/count(*), 6) AS boiler_ratio
             |  FROM seg JOIN nd USING (sh) GROUP BY doc_id
             |), sg8 AS (
             |  SELECT DISTINCT doc_id, md5(array_to_string(wr[i:i+7],' ')) AS sh
             |  FROM (SELECT doc_id, wr, unnest(generate_series(1, len(wr)-7)) AS i
             |        FROM w WHERE len(wr) >= 8)
             |), nd8 AS (
             |  SELECT sh, count(*) AS nd FROM sg8 GROUP BY sh
             |), cv AS (
             |  SELECT doc_id,
             |         round(CAST(count(*) FILTER (nd8.nd >= 2) AS DOUBLE)/count(*), 6) AS coverage
             |  FROM sg8 JOIN nd8 USING (sh) GROUP BY doc_id
             |)
             |SELECT doc_id, quality, boiler_ratio, coverage,
             |       md5('1:' || CAST(doc_id AS VARCHAR)) AS sort_key
             |FROM q JOIN br USING (doc_id) JOIN cv USING (doc_id)
             |WHERE quality >= 0.34 AND boiler_ratio <= 0.25 AND coverage <= 0.6
             |ORDER BY sort_key, doc_id""".stripMargin)),

    // Round-13 curation capstone: the REFERENCE-MODEL funnel — candidate
    // half of the corpus filtered by quality floor ∧ stupid-backoff
    // fluency band (model trained on the other half, the trusted
    // reference) ∧ NOT containment-duplicated (near-superset member
    // dropped), survivors in deterministic epoch-1 order. One lazy plan
    // composing the round-13 signals end-to-end, full-formula oracle.
    QueryDef(
      "sample_curation_v3",
      (s, d) =>
        Sampling.epochOrder(curationV3Kept(s, d), col("doc_id"), epoch = 1),
      Some(s"""WITH $CurationV3Ctes
             |SELECT doc_id, quality, avg_logp,
             |       md5('1:' || CAST(doc_id AS VARCHAR)) AS sort_key
             |FROM q JOIN lm USING (doc_id)
             |WHERE doc_id NOT IN (SELECT doc_id FROM dup)
             |  AND quality >= 0.34 AND avg_logp >= -1.52
             |ORDER BY sort_key, doc_id""".stripMargin)),

    // Curation -> DELIVERY capstone (round 16): the curated corpus
    // leaves the engine as fixed-length training sequences — v3's
    // funnel survivors, in their deterministic epoch order, packed by
    // packSequencesGlobal (the two-phase distributed prefix sum; docs
    // crossing a 256-token boundary span consecutive sequences). The
    // oracle replays the ENTIRE chain: the v3 funnel CTEs (shared
    // verbatim with sample_curation_v3), the md5 epoch order, the
    // sequential-window token stream, and the span boundary arithmetic
    // — a drifted survivor set, a wrong order, or an off-by-one span
    // all fail the hash.
    QueryDef(
      "sample_curation_packed",
      (s, d) => {
        // cached: the ordered funnel output feeds BOTH the packing input
        // and the doc_key back-join below — uncached, the whole v3
        // funnel (LM scoring + containment join) evaluates twice inside
        // one plan (r21: the noop-sink plan was 437 nodes, ~half of the
        // gate's 11 s; the funnel is the expensive half)
        val ordered = graft.util.Scratch.cached(
          Sampling.epochOrder(curationV3Kept(s, d),
              col("doc_id"), epoch = 1)
            .select(col("doc_id"), col("sort_key")))
        val withText = ordered.join(
          T.documents(s, d).select(col("doc_id"), col("text")), "doc_id")
        Sampling.packSequencesGlobal(withText, col("sort_key"),
            col("text"), seqLen = 256)
          .join(ordered.select(col("sort_key").as("doc_key"),
            col("doc_id")), "doc_key")
          .select(col("seq_id"), col("doc_id"), col("tok_start"),
            col("tok_end"), col("tokens_in_seq"))
          .orderBy("seq_id", "doc_id")
      },
      Some(s"""WITH $CurationV3Ctes,
             |kept AS (
             |  SELECT q.doc_id, md5('1:' || CAST(q.doc_id AS VARCHAR)) AS sk
             |  FROM q JOIN lm USING (doc_id)
             |  WHERE q.doc_id NOT IN (SELECT doc_id FROM dup)
             |    AND quality >= 0.34 AND avg_logp >= -1.52
             |),
             |kt AS (
             |  SELECT k.doc_id, k.sk,
             |         greatest(1, CAST(ceil(length(d.text)/4.0) AS BIGINT)) AS tok
             |  FROM kept k JOIN documents d USING (doc_id)
             |),
             |cum AS (
             |  SELECT doc_id, sk, tok,
             |    CAST(SUM(tok) OVER (ORDER BY sk
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS tok_end
             |  FROM kt
             |),
             |sp AS (SELECT doc_id, tok, tok_end, tok_end - tok AS tok_start FROM cum)
             |SELECT gs.seq_id, sp.doc_id, sp.tok_start, sp.tok_end,
             |  least(sp.tok_end, (gs.seq_id + 1) * 256)
             |    - greatest(sp.tok_start, gs.seq_id * 256) AS tokens_in_seq
             |FROM sp, unnest(generate_series(
             |        CAST(sp.tok_start // 256 AS BIGINT),
             |        CAST((sp.tok_end - 1) // 256 AS BIGINT))) AS gs(seq_id)
             |ORDER BY gs.seq_id, sp.doc_id""".stripMargin)),

    // Streaming DELIVERY capstone (round 17): the stream face of
    // sample_curation_packed — curated segments ARRIVE as NDJSON and
    // each micro-batch is packed into fixed-256-token training
    // sequences and appended to the packed store EXACTLY ONCE
    // (FilePipelines.packedDeliveryBatch: CommittedAppend's marker +
    // deterministic staging + fingerprint-checked promotion). Packing
    // is EPOCH-SCOPED by documented contract — global concat-and-cut is
    // order-total, so each segment packs its own token stream from
    // offset 0 under epoch=<batchId>; readers consume (epoch, seq_id).
    // The fixture splits the v3 funnel's survivors into two ordered
    // segments (doc_id % 4), runs the REAL foreachBatch stream, and
    // reads the store back; the oracle replays the funnel CTEs (shared
    // verbatim with sample_curation_v3), the segment split, and each
    // epoch's sequential-window packing — a dropped segment, a replayed
    // double-append, or an off-by-one span all fail the hash.
    // Stream == batch driving and replay idempotence are pinned in
    // FilePipelineSpec.
    QueryDef(
      "stream_curation_packed",
      (s, d) => {
        val out = graft.util.TempFixtures.dir(s, "cur_packed_stream", d) { path =>
          // cached: BOTH landed segments filter this frame — uncached,
          // the v3 funnel (LM scoring + containment join) executes once
          // per segment write (r21)
          val kept = graft.util.Scratch.cached(curationV3Kept(s, d)
            .join(T.documents(s, d).select(col("doc_id"), col("text")),
              "doc_id")
            .select(col("doc_id"), col("text")))
          landSegments(Seq(kept.filter(col("doc_id") % 4 === 1),
            kept.filter(col("doc_id") % 4 === 3)), path, "json")
          graft.streaming.FilePipelines.curationPackedStream(s,
            s"$path/in", s"$path/store", s"$path/ckpt")
            .awaitTermination()
        }
        s.read.parquet(s"$out/store")
          .select(col("epoch").cast("long").as("epoch"), col("seq_id"),
            col("doc_key").as("doc_id"), col("tok_start"), col("tok_end"),
            col("tokens_in_seq"))
          .orderBy("epoch", "seq_id", "doc_id")
      },
      Some(s"""WITH $CurationV3Ctes,
             |kept AS (
             |  SELECT q.doc_id FROM q JOIN lm USING (doc_id)
             |  WHERE q.doc_id NOT IN (SELECT doc_id FROM dup)
             |    AND quality >= 0.34 AND avg_logp >= -1.52
             |),
             |kt AS (
             |  SELECT k.doc_id,
             |         CAST(k.doc_id % 4 = 3 AS BIGINT) AS epoch,
             |         greatest(1, CAST(ceil(length(d.text)/4.0) AS BIGINT)) AS tok
             |  FROM kept k JOIN documents d USING (doc_id)
             |),
             |cum AS (
             |  SELECT doc_id, epoch, tok,
             |    CAST(SUM(tok) OVER (PARTITION BY epoch ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS tok_end
             |  FROM kt
             |),
             |sp AS (SELECT doc_id, epoch, tok, tok_end,
             |              tok_end - tok AS tok_start FROM cum)
             |SELECT sp.epoch, gs.seq_id, sp.doc_id, sp.tok_start, sp.tok_end,
             |  least(sp.tok_end, (gs.seq_id + 1) * 256)
             |    - greatest(sp.tok_start, gs.seq_id * 256) AS tokens_in_seq
             |FROM sp, unnest(generate_series(
             |        CAST(sp.tok_start // 256 AS BIGINT),
             |        CAST((sp.tok_end - 1) // 256 AS BIGINT))) AS gs(seq_id)
             |ORDER BY sp.epoch, gs.seq_id, sp.doc_id""".stripMargin)),

    // Round-15 curation capstone v4: the SEMANTIC-dedup funnel — v3's
    // reference-model filters (quality floor ∧ stupid-backoff fluency
    // band ∧ not containment-duplicated) composed with a SemDeDup
    // keep-set built over a kmeansFit FULL-CORPUS index (not the label
    // quantizer: the k-means fixed-point itself is SQL-replayable, so
    // the oracle replays seeding, both Lloyd iterations, the final
    // assignment, within-cell pairs, recursive components, and the
    // min-cent_sim election end-to-end). Fixture plants each vector's
    // dim0-zeroed mutant (cosine ≈ 0.9997, same cell): the election
    // keeps whichever of base/mutant sits FURTHER from its centroid, so
    // a base document dropped in favor of its mutant is exactly the
    // "semantic near-dup removed" path — load-bearing, hash-checked.
    QueryDef(
      "sample_curation_v4",
      (s, d) => {
        import graft.operators.{Dedup, Similarity, TextOps}
        val docs = T.documents(s, d).select(col("doc_id"), col("text"))
        val base = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val mutants = base.select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
        val semc = base.unionByName(mutants)
        val fit = Similarity.kmeansFit(semc, k = 8, iters = 2)
        // the oracle replays THIS fixed k=8 quantizer, so cells cannot
        // scale with the corpus here — the blocked pair join (output-
        // invariant) splits each cell's |cell|² space across B(B+1)/2
        // keys instead (blocksFor: B=1 at the gated scale, plan
        // unchanged; B>1 exactly when the fixed-k fixture outgrows its
        // cells)
        val semKeep = Similarity.semDeDup(semc, 0.9, index = Some(fit),
            nBlocks = Similarity.blocksFor(2L * base.count(), 8))
          .filter(col("keep") && col("vec_id") < 1000000)
          .select(col("vec_id").as("doc_id"))
        val ref = docs.filter(col("doc_id") % 2 === 0)
        val cand = docs.filter(col("doc_id") % 2 === 1)
        val lm = TextOps.stupidBackoffScore(ref, cand)
          .select(col("doc_id"), col("avg_logp"))
        val q = TextOps.qualityScore(cand)
        // autoCap ∝ corpus — the v3 funnel's discipline (see
        // curationV3Kept); the oracle replays the same capped universe
        val dupDrop = Dedup.containmentPairs(cand, 3, 0.9,
            hotCap = Some(Dedup.containmentAutoCap(cand.count())))
          .select(col("db").as("doc_id")).distinct()
        val kept = q.join(lm, "doc_id")
          .join(dupDrop, Seq("doc_id"), "left_anti")
          .join(semKeep, "doc_id")
          .filter(col("quality") >= 0.34 && col("avg_logp") >= -1.52)
        Sampling.epochOrder(kept, col("doc_id"), epoch = 1)
      },
      Some {
        val cos = SimilarityPack.cosSql _
        s"""WITH RECURSIVE semc AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT vec_id + 1000000 AS vec_id,
           |         list_transform(embedding, (x, i) ->
           |           CASE WHEN i = 1 THEN CAST(0 AS FLOAT) ELSE x END) AS embedding
           |  FROM embeddings
           |),
           |${SimilarityPack.kmeansReplayCtes("semc")},
           |ev AS (
           |  SELECT s.vec_id, s.embedding, f.cell
           |  FROM semc s JOIN af f USING (vec_id)
           |), prs AS (
           |  SELECT a.vec_id AS da, b.vec_id AS db
           |  FROM ev a JOIN ev b ON a.cell = b.cell AND a.vec_id < b.vec_id
           |  WHERE round(${cos("a.embedding", "b.embedding")}, 5) >= 0.9
           |), sedges AS (
           |  SELECT da AS x, db AS y FROM prs
           |  UNION ALL SELECT db, da FROM prs
           |), reach(id, r) AS (
           |  SELECT x, x FROM sedges
           |  UNION
           |  SELECT sedges.y, reach.r FROM reach JOIN sedges ON sedges.x = reach.id
           |), comp AS (
           |  SELECT id, min(r) AS component FROM reach GROUP BY id
           |), cs AS (
           |  SELECT ev.vec_id,
           |         round(${cos("ev.embedding", "cv.centroid")}, 5) AS cent_sim
           |  FROM ev JOIN c2 cv ON cv.cell = ev.cell
           |), lab AS (
           |  SELECT cs.vec_id, cs.cent_sim,
           |         coalesce(comp.component, cs.vec_id) AS component
           |  FROM cs LEFT JOIN comp ON comp.id = cs.vec_id
           |), elect AS (
           |  SELECT component, vec_id AS keeper FROM (
           |    SELECT component, vec_id,
           |           row_number() OVER (PARTITION BY component
           |                              ORDER BY cent_sim, vec_id) AS rn
           |    FROM lab) t
           |  WHERE rn = 1
           |), semkeep AS (
           |  SELECT l.vec_id AS doc_id
           |  FROM lab l JOIN elect k USING (component)
           |  WHERE l.vec_id = k.keeper AND l.vec_id < 1000000
           |), ttok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           |         generate_subscripts(string_split(text, ' '), 1) AS i
           |  FROM documents WHERE doc_id % 2 = 0
           |), uni AS (SELECT w, count(*) AS u FROM ttok GROUP BY w),
           |tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM ttok),
           |bgc AS (
           |  SELECT pw, w, count(*) AS b FROM (
           |    SELECT lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw, w
           |    FROM ttok) x
           |  WHERE pw IS NOT NULL GROUP BY pw, w
           |), stok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           |         generate_subscripts(string_split(text, ' '), 1) AS i
           |  FROM documents WHERE doc_id % 2 = 1
           |), sbg AS (
           |  SELECT doc_id, pw, w FROM (
           |    SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw, w
           |    FROM stok) x
           |  WHERE pw IS NOT NULL
           |), lpr AS (
           |  SELECT sbg.doc_id,
           |         CASE WHEN bgc.b IS NOT NULL
           |              THEN log10(CAST(bgc.b AS DOUBLE) / up.u)
           |              ELSE log10(coalesce(CAST(uw.u AS DOUBLE), 0.5)
           |                         * (CAST(0.4 AS DOUBLE) / tot.t))
           |         END AS lp
           |  FROM sbg
           |  LEFT JOIN bgc ON bgc.pw = sbg.pw AND bgc.w = sbg.w
           |  LEFT JOIN uni up ON up.w = sbg.pw
           |  LEFT JOIN uni uw ON uw.w = sbg.w
           |  CROSS JOIN tot
           |), lm AS (
           |  SELECT doc_id,
           |    round(CAST(SUM(CAST(lp AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS avg_logp
           |  FROM lpr GROUP BY doc_id
           |), lw AS (
           |  SELECT doc_id, string_split(lower(text), ' ') AS w
           |  FROM documents WHERE doc_id % 2 = 1
           |), q AS (
           |  SELECT doc_id,
           |    round(least(CAST(len(w) AS DOUBLE)/200.0, 1.0)*0.5
           |      + CAST(len(list_distinct(w)) AS DOUBLE)/len(w)*0.3
           |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
           |              /len(w)*5.0, 1.0)*0.2, 6) AS quality
           |  FROM lw
           |), tri AS (
           |  SELECT DISTINCT doc_id,
           |         concat_ws(' ', cw,
           |           lead(cw,1) OVER (PARTITION BY doc_id ORDER BY i),
           |           lead(cw,2) OVER (PARTITION BY doc_id ORDER BY i)) AS sh
           |  FROM (SELECT doc_id, w AS cw, i FROM stok) c
           |  QUALIFY lead(cw,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
           |), keepsh AS (
           |  SELECT sh FROM (SELECT sh, count(*) AS nd FROM tri GROUP BY sh)
           |  WHERE nd <= (SELECT greatest(64, count(*) // 100)
           |               FROM documents WHERE doc_id % 2 = 1)
           |), utri AS (SELECT tri.doc_id, tri.sh FROM tri JOIN keepsh USING (sh)),
           |sz AS (SELECT doc_id, count(*) AS n FROM utri GROUP BY doc_id),
           |dup AS (
           |  SELECT DISTINCT db AS doc_id FROM (
           |    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS icnt
           |    FROM utri a JOIN utri b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |    GROUP BY 1, 2) p
           |  JOIN sz sa ON sa.doc_id = p.da JOIN sz sb ON sb.doc_id = p.db
           |  WHERE icnt / least(sa.n, sb.n) >= 0.9
           |)
           |SELECT doc_id, quality, avg_logp,
           |       md5('1:' || CAST(doc_id AS VARCHAR)) AS sort_key
           |FROM q JOIN lm USING (doc_id) JOIN semkeep USING (doc_id)
           |WHERE doc_id NOT IN (SELECT doc_id FROM dup)
           |  AND quality >= 0.34 AND avg_logp >= -1.52
           |ORDER BY sort_key, doc_id""".stripMargin
      }),

    // Applied mixture: per-document copy counts materializing the plan —
    // floor(weight) epochs + deterministic fractional Bernoulli (Knuth
    // multiplicative draw, integer-exact in both engines). Expectation =
    // the target token shares; re-runs reproduce identical counts.
    QueryDef(
      "sample_mixture_apply",
      (s, d) =>
        Sampling.mixtureApply(T.documents(s, d), col("doc_id"), col("lang"),
            col("text"), mixTargets)
          .withColumnRenamed("doc_key", "doc_id")
          .withColumnRenamed("stratum", "lang")
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT lang,
             |    greatest(1, CAST(ceil(length(text)/4.0) AS BIGINT)) AS tok
             |  FROM documents
             |), a AS (
             |  SELECT lang, CAST(sum(tok) AS BIGINT) AS stratum_toks FROM t GROUP BY lang
             |), g AS (
             |  SELECT lang, stratum_toks,
             |    CAST(SUM(stratum_toks) OVER () AS BIGINT) AS total_toks
             |  FROM a
             |), p AS (
             |  SELECT lang,
             |    round(CASE lang WHEN 'en' THEN 0.40 WHEN 'de' THEN 0.20
             |                    WHEN 'fr' THEN 0.15 WHEN 'es' THEN 0.15
             |                    WHEN 'zh' THEN 0.10 ELSE 0.0 END
             |      * CAST(total_toks AS DOUBLE) / CAST(stratum_toks AS DOUBLE), 6)
             |      AS w
             |  FROM g
             |)
             |SELECT doc_id, lang,
             |  CAST(floor(w) + CASE WHEN
             |      (((doc_id % 1048576 + 1048576) % 1048576) * 2654435761 % 4294967296) / 4294967296.0
             |        < w - floor(w)
             |    THEN 1 ELSE 0 END AS BIGINT) AS n_copies
             |FROM documents JOIN p USING (lang) ORDER BY doc_id""".stripMargin)),

    // Mixture planning: per-language repeat/sample weight that moves the
    // token distribution to the target mixture. |strata|-row aggregate;
    // global total via an unpartitioned window over those few rows.
    QueryDef(
      "sample_mixture_plan",
      (s, d) =>
        Sampling.mixturePlan(T.documents(s, d), col("lang"), col("text"),
            mixTargets)
          .withColumnRenamed("stratum", "lang")
          .orderBy("lang"),
      Some("""WITH t AS (
             |  SELECT lang,
             |    greatest(1, CAST(ceil(length(text)/4.0) AS BIGINT)) AS tok
             |  FROM documents
             |), a AS (
             |  SELECT lang, CAST(sum(tok) AS BIGINT) AS stratum_toks FROM t GROUP BY lang
             |), g AS (
             |  SELECT lang, stratum_toks,
             |    CAST(SUM(stratum_toks) OVER () AS BIGINT) AS total_toks
             |  FROM a
             |)
             |SELECT lang, stratum_toks,
             |  round(CAST(stratum_toks AS DOUBLE) / CAST(total_toks AS DOUBLE), 6)
             |    AS actual_share,
             |  round(CASE lang WHEN 'en' THEN 0.40 WHEN 'de' THEN 0.20
             |                  WHEN 'fr' THEN 0.15 WHEN 'es' THEN 0.15
             |                  WHEN 'zh' THEN 0.10 ELSE 0.0 END
             |    * CAST(total_toks AS DOUBLE) / CAST(stratum_toks AS DOUBLE), 6)
             |    AS mix_weight
             |FROM g ORDER BY lang""".stripMargin)),

    // CAPSTONE composition — the curation workflow end to end, every
    // stage an operator that also has its own gate: quality score ≥ 0.35
    // (text_quality; the synthetic corpus tops out near 0.5) ∧ not repetition-flagged (text_repetition) ∧ exact
    // fingerprint survivor (text_fingerprint semantics) → deterministic
    // 60% hash-Bernoulli (sample_bernoulli) → 512-token greedy packing
    // (sample_pack_sequences) → per-source corpus stats. Each stage is a
    // map-side filter or broadcast-friendly join on doc_id; the only
    // wide operations are the fingerprint min-groupBy and the packing
    // window — shapes whose scale stories their own gates document.
    QueryDef(
      "sample_curation_pipeline",
      (s, d) => {
        import graft.operators.TextOps
        val docs = T.documents(s, d)
        val unflagged = TextOps.repetitionSignals(docs)
          .filter(!col("flagged")).select("doc_id")
        val survivors = TextOps.fingerprint(docs)
          .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        // quality is row-local (qualityCol): a map-side filter, not a
        // third join; the two remaining joins are real aggregations
        val kept = docs
          .filter(TextOps.qualityCol(col("text")) >= 0.35)
          .join(unflagged, "doc_id")
          .join(survivors, "doc_id")
        val sampled = Sampling.bernoulli(kept, col("doc_id"), 0.6)
        Sampling.packSequences(sampled, col("doc_id"), col("source"),
            col("text"), 512)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("docs_kept"),
            countDistinct(col("seq_id")).as("n_sequences"),
            sum(col("tok")).as("sum_tokens"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
              |), q AS (
              |  SELECT doc_id FROM (
              |    SELECT doc_id,
              |      round(least(CAST(len(w) AS DOUBLE) / 200.0, 1.0) * 0.5
              |        + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3
              |        + least(CAST(len(list_filter(w, x ->
              |            x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
              |            / len(w) * 5.0, 1.0) * 0.2, 6) AS quality
              |    FROM t) WHERE quality >= 0.35
              |), t3 AS (
              |  SELECT doc_id, w FROM t WHERE len(w) >= 3
              |), bic AS (
              |  SELECT doc_id, w[i] || ' ' || w[i+1] AS g, count(*) AS c
              |  FROM t3, unnest(range(1, len(w))) AS r(i) GROUP BY 1, 2
              |), bia AS (
              |  SELECT doc_id, max(c) AS max2, sum(c) AS tot2 FROM bic GROUP BY 1
              |), tric AS (
              |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g,
              |         count(*) AS c
              |  FROM t3, unnest(range(1, len(w) - 1)) AS r(i) GROUP BY 1, 2
              |), tria AS (
              |  SELECT doc_id, sum(c) AS tot3, count(*) AS dist3 FROM tric GROUP BY 1
              |), unflagged AS (
              |  SELECT doc_id FROM bia JOIN tria USING (doc_id)
              |  WHERE NOT (round(CAST(tot3 - dist3 AS DOUBLE) / CAST(tot3 AS DOUBLE), 6) > 0.30
              |         OR round(CAST(max2 AS DOUBLE) / CAST(tot2 AS DOUBLE), 6) > 0.18)
              |), surv AS (
              |  SELECT min(doc_id) AS doc_id
              |  FROM (SELECT doc_id,
              |          md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              |        FROM documents) GROUP BY fp
              |), kept AS (
              |  SELECT d.doc_id, d.source, d.text FROM documents d
              |  JOIN q USING (doc_id) JOIN unflagged USING (doc_id)
              |  JOIN surv USING (doc_id)
              |  WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
              |        < '${Sampling.rateThreshold(0.6)}'
              |), packed AS (
              |  SELECT doc_id, source, tok,
              |    CAST((SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok)
              |      // 512 AS BIGINT) AS seq_id
              |  FROM (SELECT doc_id, source,
              |          greatest(1, CAST(ceil(length(text)/4.0) AS BIGINT)) AS tok
              |        FROM kept)
              |)
              |SELECT source, CAST(count(*) AS BIGINT) AS docs_kept,
              |  CAST(count(DISTINCT seq_id) AS BIGINT) AS n_sequences,
              |  CAST(SUM(tok) AS BIGINT) AS sum_tokens
              |FROM packed GROUP BY source ORDER BY source""".stripMargin)),

    // Curation FUNNEL report (round 11): per source, the doc count
    // surviving each cumulative stage — raw -> quality floor ->
    // fingerprint survivor -> hash-Bernoulli sample. The standard
    // pipeline-observability artifact: one glance shows WHERE a source
    // loses its mass. One pass over the corpus (each stage a boolean
    // column, conditional counts in one aggregate — no per-stage scans),
    // every predicate already exact-oracled by the capstones.
    QueryDef(
      "sample_curation_funnel",
      (s, d) => {
        import graft.operators.TextOps
        val docs = T.documents(s, d)
        val surv = TextOps.fingerprint(docs)
          .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), lit(true).as("ok_fp"))
        // quality verdict rides the scan (row-local qualityCol); the
        // survivor election is the funnel's only join
        docs.select(col("doc_id"), col("source"),
            (TextOps.qualityCol(col("text")) >= 0.35).as("ok_q"))
          .join(surv, Seq("doc_id"), "left")
          .withColumn("ok_fp", coalesce(col("ok_fp"), lit(false)))
          .withColumn("ok_bern",
            Sampling.hashDraw(col("doc_id")) <
              lit(Sampling.rateThreshold(0.6)))
          .groupBy("source")
          .agg(count(lit(1)).as("n_raw"),
            sum(when(col("ok_q"), 1L).otherwise(0L)).as("n_quality"),
            sum(when(col("ok_q") && col("ok_fp"), 1L).otherwise(0L))
              .as("n_dedup"),
            sum(when(col("ok_q") && col("ok_fp") && col("ok_bern"), 1L)
              .otherwise(0L)).as("n_sampled"))
          .orderBy("source")
      },
      Some(s"""WITH qw AS (
              |  SELECT doc_id, string_split(lower(text),' ') AS w FROM documents
              |), q AS (
              |  SELECT doc_id,
              |    round(least(CAST(len(w) AS DOUBLE) / 200.0, 1.0) * 0.5
              |      + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3
              |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
              |              / len(w) * 5.0, 1.0) * 0.2, 6) >= 0.35 AS ok_q
              |  FROM qw
              |), surv AS (
              |  SELECT min(doc_id) AS doc_id
              |  FROM (SELECT doc_id,
              |          md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              |        FROM documents) GROUP BY fp
              |)
              |SELECT d.source,
              |  CAST(count(*) AS BIGINT) AS n_raw,
              |  CAST(count(*) FILTER (q.ok_q) AS BIGINT) AS n_quality,
              |  CAST(count(*) FILTER (q.ok_q AND surv.doc_id IS NOT NULL) AS BIGINT) AS n_dedup,
              |  CAST(count(*) FILTER (q.ok_q AND surv.doc_id IS NOT NULL AND
              |    substr(md5(CAST(d.doc_id AS VARCHAR)),1,8) < '${Sampling.rateThreshold(0.6)}')
              |    AS BIGINT) AS n_sampled
              |FROM documents d
              |JOIN q USING (doc_id)
              |LEFT JOIN surv ON surv.doc_id = d.doc_id
              |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // Length-bucketed batching stats (round 11): power-of-two token
    // buckets via INTEGER bit length (never floating log2 — its ulp at
    // exact powers of two is an engine-dependent off-by-one), per-bucket
    // doc/token counts and padding efficiency — the planner for the
    // keep-document-boundaries batching strategy that complements
    // sample_pack_sequences' concat-and-cut.
    QueryDef(
      "sample_length_buckets",
      (s, d) =>
        Sampling.lengthBuckets(T.documents(s, d), col("text"))
          .orderBy("bucket"),
      Some("""WITH t AS (
             |  SELECT greatest(1, CAST(ceil(length(text)/4.0) AS BIGINT)) AS tok
             |  FROM documents
             |)
             |SELECT CAST(length(bin(tok)) - 1 AS INT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(tok) AS BIGINT) AS sum_tokens,
             |  CAST(max(tok) AS BIGINT) AS max_tokens,
             |  round(CAST(sum(tok) AS DOUBLE) /
             |        CAST(count(*) * max(tok) AS DOUBLE), 6) AS pad_efficiency
             |FROM t GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Quality-tier curriculum sampling (round 11): exact quartile cut
    // points from ONE percentile aggregate (never an ntile window — no
    // single-partition global sort), broadcast as a 1-row frame; tier
    // assignment and per-tier hash-Bernoulli verdicts are map-side.
    // Raw-cut comparisons replay exactly (see scoreTierSample scaladoc
    // for why rounding the cuts would ADD a cross-engine hazard).
    QueryDef(
      "sample_quality_tiers",
      (s, d) =>
        Sampling.scoreTierSample(
            graft.operators.TextOps.qualityScore(T.documents(s, d)),
            col("doc_id"), col("quality"), Seq(0.1, 0.3, 0.6, 0.9))
          .withColumnRenamed("doc_key", "doc_id")
          .orderBy("doc_id"),
      Some(s"""WITH qw AS (
              |  SELECT doc_id, string_split(lower(text),' ') AS w FROM documents
              |), q AS (
              |  SELECT doc_id,
              |    round(least(CAST(len(w) AS DOUBLE) / 200.0, 1.0) * 0.5
              |      + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3
              |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
              |              / len(w) * 5.0, 1.0) * 0.2, 6) AS s
              |  FROM qw
              |), cuts AS (
              |  SELECT quantile_cont(s, 0.25) AS c1, quantile_cont(s, 0.5) AS c2,
              |         quantile_cont(s, 0.75) AS c3
              |  FROM q
              |), tiered AS (
              |  SELECT doc_id, s,
              |    1 + CAST(s >= c1 AS INT) + CAST(s >= c2 AS INT)
              |      + CAST(s >= c3 AS INT) AS tier
              |  FROM q, cuts
              |)
              |SELECT doc_id, s AS score, tier,
              |  CASE tier
              |    WHEN 1 THEN substr(md5(CAST(doc_id AS VARCHAR)),1,8) < '${Sampling.rateThreshold(0.1)}'
              |    WHEN 2 THEN substr(md5(CAST(doc_id AS VARCHAR)),1,8) < '${Sampling.rateThreshold(0.3)}'
              |    WHEN 3 THEN substr(md5(CAST(doc_id AS VARCHAR)),1,8) < '${Sampling.rateThreshold(0.6)}'
              |    ELSE substr(md5(CAST(doc_id AS VARCHAR)),1,8) < '${Sampling.rateThreshold(0.9)}'
              |  END AS kept
              |FROM tiered ORDER BY doc_id""".stripMargin)),

    // Deterministic EXACT-k uniform sample (round 11): order by
    // md5(key), take k — reproducible, RNG-free, and the plan is a
    // TakeOrderedAndProject (per-partition heaps, k-row merge), never a
    // full sort. Unlike Bernoulli the output size is exact.
    QueryDef(
      "sample_exact_k",
      (s, d) =>
        Sampling.exactK(T.documents(s, d).select(col("doc_id"), col("source")),
            col("doc_id"), k = 100)
          .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source FROM documents
             |  ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             |  LIMIT 100
             |) ORDER BY doc_id""".stripMargin)),

    // Exactly k PER STRATUM (round 11), spelled as the standard window
    // row_number-filter-drop idiom so RewriteWindowTopK retargets it
    // onto the native TopKPerKey bounded-heap plan — no stratum is ever
    // fully sorted, the shuffle carries <= k rows per (stratum,
    // partition). SamplingSpec asserts the plan shape.
    QueryDef(
      "sample_stratified_exact_k",
      (s, d) =>
        Sampling.stratifiedExactK(
            T.documents(s, d).select(col("doc_id"), col("source")),
            col("doc_id"), col("source"), k = 5)
          .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM documents
             |QUALIFY row_number() OVER (PARTITION BY source
             |  ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) <= 5
             |ORDER BY doc_id""".stripMargin)),

    // Temperature-scaled source mixing (alpha=0.5): sampling weight per
    // source ∝ tokens^alpha — the standard upweight-the-small-sources
    // move when blending many corpora. Deterministic by construction:
    // weights are floor(sqrt(n)*1e6) INTEGERS (sqrt is IEEE-correctly-
    // rounded), so both normalization denominators are exact integer
    // sums and the oracle replays every value bit-for-bit.
    QueryDef(
      "sample_temperature_mix",
      (s, d) =>
        Sampling.temperatureMixture(T.documents(s, d),
            col("source"), col("text"), alpha = 0.5)
          .orderBy("source"),
      Some("""WITH agg AS (
             |  SELECT source,
             |    CAST(sum(greatest(1, CAST(ceil(length(text)/4.0) AS BIGINT))) AS BIGINT) AS n_toks
             |  FROM documents GROUP BY source
             |), wtd AS (
             |  SELECT source, n_toks,
             |    CAST(floor(sqrt(CAST(n_toks AS DOUBLE)) * 1e6) AS BIGINT) AS w
             |  FROM agg
             |), tot AS (
             |  SELECT CAST(sum(n_toks) AS BIGINT) AS tot_toks,
             |         CAST(sum(w) AS BIGINT) AS tot_w
             |  FROM wtd
             |)
             |SELECT source, n_toks,
             |  round(CAST(n_toks AS DOUBLE) / CAST(tot_toks AS DOUBLE), 6) AS natural_frac,
             |  round(CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE), 6) AS temp_frac,
             |  round((CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE)) /
             |        (CAST(n_toks AS DOUBLE) / CAST(tot_toks AS DOUBLE)), 6) AS boost
             |FROM wtd, tot ORDER BY source""".stripMargin)),

    // Per-community curation quota (round 15 late): what
    // graph_label_prop's communities are FOR - per-community top-Q by
    // quality instead of one global cut, so one dominant domain cannot
    // crowd the corpus (the quota is the diversity control of
    // domain-balanced curation). Composes three hash-checked pieces:
    // LPA communities over the persisted kNN edge set (vec_id == doc_id
    // by the testdata contract), the replayable quality score, and the
    // per-key top-k - whose window idiom replans onto the bounded-heap
    // TopKPerKey operator, so the quota costs <= Q rows per community
    // per partition through the shuffle at any corpus size. The oracle
    // replays communities, quality and the quota cut end to end.
    QueryDef(
      "sample_community_quota",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val comm = graft.operators.Graph
          .labelPropagation(SimilarityPack.knnEdges(s, d))
          .select(col("node").as("doc_id"), col("label").as("community"))
        val q = graft.operators.TextOps.qualityScore(
          T.documents(s, d).select(col("doc_id"), col("text")))
        val w = Window.partitionBy(col("community"))
          .orderBy(col("quality").desc, col("doc_id"))
        comm.join(q, "doc_id")
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 20)
          .select(col("doc_id"), col("community"), col("quality"),
            col("rank").cast("long").as("rank"))
          .orderBy("community", "rank")
      },
      Some(s"""WITH ${SimilarityPack.KnnCteSql},
              |de AS (SELECT query_id AS src, vec_id AS dst FROM knn),
              |uedges AS (
              |  SELECT DISTINCT src, dst FROM (
              |    SELECT src, dst FROM de
              |    UNION ALL SELECT dst AS src, src AS dst FROM de)
              |),
              |lab0 AS (SELECT DISTINCT src AS node, src AS label FROM uedges),
              |c1 AS (
              |  SELECT e.src AS node, lab0.label, count(*) AS cnt
              |  FROM uedges e JOIN lab0 ON lab0.node = e.dst GROUP BY 1, 2
              |), lab1 AS (
              |  SELECT node, label FROM (
              |    SELECT node, label, row_number() OVER (PARTITION BY node
              |      ORDER BY cnt DESC, label) AS rn FROM c1) t WHERE rn = 1
              |), c2 AS (
              |  SELECT e.src AS node, lab1.label, count(*) AS cnt
              |  FROM uedges e JOIN lab1 ON lab1.node = e.dst GROUP BY 1, 2
              |), lab2 AS (
              |  SELECT node, label FROM (
              |    SELECT node, label, row_number() OVER (PARTITION BY node
              |      ORDER BY cnt DESC, label) AS rn FROM c2) t WHERE rn = 1
              |), c3 AS (
              |  SELECT e.src AS node, lab2.label, count(*) AS cnt
              |  FROM uedges e JOIN lab2 ON lab2.node = e.dst GROUP BY 1, 2
              |), lab3 AS (
              |  SELECT node, label FROM (
              |    SELECT node, label, row_number() OVER (PARTITION BY node
              |      ORDER BY cnt DESC, label) AS rn FROM c3) t WHERE rn = 1
              |),
              |tq AS (
              |  SELECT doc_id, string_split(lower(text),' ') AS w FROM documents
              |), cq AS (
              |  SELECT doc_id,
              |    CAST(len(w) AS DOUBLE) AS n,
              |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr,
              |    CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
              |      / len(w) AS stoprate
              |  FROM tq
              |), qual AS (
              |  SELECT doc_id,
              |    round(least(n / 200.0, 1.0) * 0.5 + ttr * 0.3
              |          + least(stoprate * 5.0, 1.0) * 0.2, 6) AS quality
              |  FROM cq
              |), j AS (
              |  SELECT lab3.node AS doc_id, lab3.label AS community, qual.quality
              |  FROM lab3 JOIN qual ON qual.doc_id = lab3.node
              |)
              |SELECT doc_id, community, quality, rank FROM (
              |  SELECT doc_id, community, quality,
              |         row_number() OVER (PARTITION BY community
              |                            ORDER BY quality DESC, doc_id) AS rank
              |  FROM j) t
              |WHERE rank <= 20
              |ORDER BY community, rank""".stripMargin))
  )
}
