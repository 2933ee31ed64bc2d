package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Multimodal, TextOps}
import graft.sources.{Tables => T}

/** Text-analysis + multimodal pack (SURVEY C13 / C12) over `documents`.
  * Every formula is fixed-arithmetic and replicated in the DuckDB oracle,
  * so the driver hash-checks the exact numbers.
  */
object TextPack extends QueryPack {

  private def docsOf(s: org.apache.spark.sql.SparkSession, d: String) =
    T.documents(s, d)

  /** Session-cached multi-file `.warc.gz` fixture for the splittable
    * reader gates: each writer task emits one per-record-gzipped object
    * (warcinfo + HTTP response whose body is the doc text) — the
    * object-store arrival pattern.
    */
  private def warcSplitFixture(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    graft.util.TempFixtures.dir(s, "warc_split_gz", d) { path =>
      // written through the engine's OWN warcgz sink — each writer task
      // emits one per-record-gzipped object (the object-store pattern)
      val httpHdr = lit(
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
          .getBytes("US-ASCII"))
      docsOf(s, d).select(col("doc_id"), col("text"))
        .repartition(4, col("doc_id"))
        .select(explode(array(
          struct(lit("warcinfo").as("warc_type"),
            lit("").as("target_uri"),
            concat(lit("<urn:uuid:info-"), col("doc_id"), lit(">"))
              .as("record_id"),
            lit("software: graft\r\n".getBytes("US-ASCII")).as("payload")),
          struct(lit("response").as("warc_type"),
            concat(lit("http://example.org/doc/"), col("doc_id"))
              .as("target_uri"),
            concat(lit("<urn:uuid:resp-"), col("doc_id"), lit(">"))
              .as("record_id"),
            concat(httpHdr, encode(col("text"), "UTF-8")).as("payload"))))
          .as("rec"))
        .select(col("rec.*"))
        .write.format("warcgz").mode("overwrite").save(path)
    }

  /** HTML-page warc.gz fixture: each doc arrives as an HTTP response
    * whose body is a full page (title, script, entity-bearing footer)
    * — the CommonCrawl shape the html-curation capstone ingests.
    */
  private[queries] def warcHtmlFixture(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    graft.util.TempFixtures.dir(s, "warc_html_gz", d) { path =>
      val httpHdr = lit(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
          .getBytes("US-ASCII"))
      docsOf(s, d).select(col("doc_id"), col("text"))
        .repartition(4, col("doc_id"))
        .select(
          lit("response").as("warc_type"),
          concat(lit("http://example.org/page/"), col("doc_id"))
            .as("target_uri"),
          concat(lit("<urn:uuid:page-"), col("doc_id"), lit(">"))
            .as("record_id"),
          concat(httpHdr, encode(concat(
            lit("<html><head><title>Doc "), col("doc_id").cast("string"),
            lit("</title><script>track();</script></head><body><p>"),
            col("text"),
            lit("</p><footer>&copy; 2026</footer></body></html>")), "UTF-8"))
            .as("payload"))
        .write.format("warcgz").mode("overwrite").save(path)
    }

  // Shared by BOTH WARC ingestion gates (plain and .warc.gz): the
  // recovered bodies must be identical regardless of container layout.
  private val warcIngestOracle: String =
    """SELECT doc_id, CAST(2 AS BIGINT) AS n_records,
      |       'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |       md5(text) AS body_md5,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS body_len
      |FROM documents ORDER BY doc_id""".stripMargin

  override val defs: Seq[QueryDef] = Seq(

    // Per-document surface statistics (token counting = whitespace split;
    // the corpus is single-space separated by construction).
    QueryDef(
      "text_stats",
      (s, d) =>
        TextOps.stats(docsOf(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS n_chars,
             |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_uniq,
             |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
             |    / len(string_split(text,' ')) AS ttr,
             |  round(CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
             |    / len(string_split(text,' ')), 6) AS avg_token_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Corpus term frequency, top 100 (total order: count desc, token).
    QueryDef(
      "text_tf",
      (s, d) =>
        TextOps.termFrequency(docsOf(s, d), 100),
      Some("""SELECT token, CAST(count(*) AS BIGINT) AS cnt
             |FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
             |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin)),

    // Heuristic stopword language ID (argmax with fixed tie order).
    QueryDef(
      "text_langid",
      (s, d) =>
        TextOps.languageId(docsOf(s, d))
          .select(col("doc_id"), col("s_en"), col("s_de"), col("s_fr"),
            col("s_es"), col("predicted"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text),' ') AS w FROM documents
             |), s AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS s_en,
             |    CAST(len(list_filter(w, x -> x IN ('der','die','das','und','ist','ein'))) AS BIGINT) AS s_de,
             |    CAST(len(list_filter(w, x -> x IN ('le','la','les','et','est','un'))) AS BIGINT) AS s_fr,
             |    CAST(len(list_filter(w, x -> x IN ('el','la','los','y','es','un'))) AS BIGINT) AS s_es
             |  FROM t
             |)
             |SELECT doc_id, s_en, s_de, s_fr, s_es,
             |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
             |       WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
             |       WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
             |       WHEN s_es >= s_fr THEN 'es'
             |       ELSE 'fr' END AS predicted
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Fixed-formula quality score.
    QueryDef(
      "text_quality",
      (s, d) =>
        TextOps.qualityScore(docsOf(s, d)).orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text),' ') AS w FROM documents
             |), c AS (
             |  SELECT doc_id,
             |    CAST(len(w) AS DOUBLE) AS n,
             |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr,
             |    CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
             |      / len(w) AS stoprate
             |  FROM t
             |)
             |SELECT doc_id,
             |  round(least(n / 200.0, 1.0) * 0.5 + ttr * 0.3
             |        + least(stoprate * 5.0, 1.0) * 0.2, 6) AS quality
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Token counting, whitespace + BPE-ish regex (the token-budget
    // estimator of a training-data pipeline). The split pattern is
    // lookahead-free so Java regex (engine) and RE2 (oracle) agree.
    QueryDef(
      "text_tokens",
      (s, d) =>
        TextOps.tokenCounts(docsOf(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             |  CAST(len(regexp_extract_all(lower(text),
             |    '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+|\s+')) AS BIGINT) AS n_bpe_tokens,
             |  round(CAST(length(text) AS DOUBLE)
             |    / len(regexp_extract_all(lower(text),
             |        '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+|\s+')), 6) AS chars_per_token
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // REAL trained BPE, round-1 face: the first merge decision as a
    // declarative plan (word counts → adjacent symbol pairs → weighted
    // argmax with the deterministic tie-break) — the corpus-pass half
    // of Bpe.train, hash-checked against DuckDB replaying the same
    // counting.
    QueryDef(
      "text_bpe_first_merge",
      (s, d) => graft.operators.Bpe.firstMergePlan(docsOf(s, d)),
      Some("""WITH words AS (
             |  SELECT w, count(*) AS cnt FROM (
             |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
             |    FROM documents)
             |  WHERE len(w) > 0 GROUP BY w HAVING count(*) >= 2
             |), syms AS (
             |  SELECT cnt, list_append(list_transform(generate_series(1, len(w)),
             |    i -> substr(w, i, 1)), '</w>') AS s
             |  FROM words
             |), pairs AS (
             |  SELECT s[t.i] AS a, s[t.i+1] AS b, cnt
             |  FROM syms, UNNEST(generate_series(1, len(s)-1)) t(i)
             |)
             |SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_count
             |FROM pairs GROUP BY a, b
             |ORDER BY pair_count DESC, a, b LIMIT 1""".stripMargin)),

    // REAL trained BPE, full pipeline: learn 30 merges from the corpus'
    // word-frequency table (one corpus pass; K vocab-scale rounds,
    // deterministic tie-breaks), then tokenize every document by merge
    // rank. DuckDB cannot replay iterative training, so the gate
    // verifies as a REPLAY DIGEST (round 20, verdict r19 #4): the
    // engine digests its full token stream in doc order, and the oracle
    // looks the INDEPENDENT Python replay's digest
    // (tools/bpe_replay.py via gen_replay_digests.py) up by the
    // fingerprint of the exact corpus it was handed — scale-proof, and
    // an unrecorded corpus fails loudly as a 0-row oracle. BpeSpec
    // still pins the merge sequence on a hand-computed corpus and the
    // token/pack digests at the dev AND gated scales.
    QueryDef(
      "text_bpe_tokens",
      (s, d) => {
        val base = docsOf(s, d)
        val merges = graft.operators.Bpe.train(base, numMerges = 30)
        orderedLineDigest(
          graft.operators.Bpe.tokenLines(base, merges),
          Seq(col("doc_id")),
          concat_ws("\t", col("doc_id"), col("tokens")))
      },
      Some(replayDigestOracle("bpe_tokens"))),

    // Compression-ratio quality signal (round 12, the last standard
    // Gopher/CCNet signal): per-doc raw-DEFLATE ratio via the native
    // deflate_len expression — map-side, zero shuffle. DuckDB has no
    // deflate function, so the gate verifies as a replay digest against
    // the CPython-zlib replay (tools/compress_replay.py — the JDK
    // Deflater at DEFAULT_COMPRESSION/nowrap IS zlib raw deflate at
    // level 6); digest covers (doc_id, n_bytes, deflate_bytes), the
    // ratio being their quotient. TextOpsSpec additionally pins exact
    // vectors against a direct JDK Deflater replay plus the
    // repetitive<prose<noise ordering that makes the signal useful.
    QueryDef(
      "text_compress_ratio",
      (s, d) => orderedLineDigest(
        TextOps.compressionRatio(docsOf(s, d)),
        Seq(col("doc_id")),
        concat_ws("\t", col("doc_id"), col("n_bytes"), col("deflate_bytes"))),
      Some(replayDigestOracle("compress_ratio"))),

    // PII scrub (C4-style detect-then-redact): the corpus has no PII, so
    // the gate PLANTS it deterministically — every doc an email, every
    // 2nd an IPv4, every 3rd a phone — with both engines building the
    // identical string; the scrubbed-text md5 pins replacement spans
    // exactly. Map-side only; patterns are lookaround-free ASCII so Java
    // regex and RE2 agree (the BpeSplitPattern discipline).
    QueryDef(
      "text_pii_scrub",
      (s, d) => {
        val base = docsOf(s, d)
        val suffix = concat(
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
              lit(".7"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" call 555-123-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
            .otherwise(lit("")))
        TextOps.piiScrub(
            base.select(col("doc_id"), concat(col("text"), suffix).as("text")))
          .orderBy("doc_id")
      },
      Some(s"""WITH planted AS (
              |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              |    || CASE WHEN doc_id % 2 = 0
              |            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
              |            ELSE '' END
              |    || CASE WHEN doc_id % 3 = 0
              |            THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              |            ELSE '' END AS text
              |  FROM documents
              |), s1 AS (
              |  SELECT doc_id, text,
              |         regexp_replace(text, '${TextOps.EmailPattern}', '<EMAIL>', 'g') AS t1
              |  FROM planted
              |), s2 AS (
              |  SELECT *, regexp_replace(t1, '${TextOps.Ipv4Pattern}', '<IP>', 'g') AS t2 FROM s1
              |), s3 AS (
              |  SELECT *, regexp_replace(t2, '${TextOps.PhonePattern}', '<PHONE>', 'g') AS t3 FROM s2
              |)
              |SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${TextOps.EmailPattern}')) AS BIGINT) AS n_emails,
              |  CAST(len(regexp_extract_all(t1, '${TextOps.Ipv4Pattern}')) AS BIGINT) AS n_ips,
              |  CAST(len(regexp_extract_all(t2, '${TextOps.PhonePattern}')) AS BIGINT) AS n_phones,
              |  md5(t3) AS scrubbed_md5
              |FROM s3 ORDER BY doc_id""".stripMargin)),

    // Deterministic count-min sketch (round 11): md5-derived row
    // hashes + integer cells make the sketch merge-order-free and
    // every point estimate exactly replayable — a frequency sketch
    // whose answers hash-check. The shuffle carries <= depth*width
    // cells, constant in corpus size (the point of sketching 100 TB);
    // estimates keep the CMS overestimate guarantee (SketchesSpec).
    QueryDef(
      "text_cms_counts",
      (s, d) => {
        val sketch = graft.operators.Sketches.countMin(
          docsOf(s, d), col("text"), depth = 4, width = 1024)
        graft.operators.Sketches.cmsEstimate(sketch,
            Seq("the", "a", "row", "table", "value", "data", "query",
              "zz_never_seen"), depth = 4, width = 1024)
          .orderBy("word")
      },
      Some("""WITH tok AS (
             |  SELECT unnest(string_split(text, ' ')) AS t FROM documents
             |), cells AS (
             |  SELECT r.r,
             |    CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t),1,15)) AS BIGINT)
             |      % 1024 AS bucket
             |  FROM tok, range(4) r(r)
             |), sk AS (
             |  SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
             |  FROM cells GROUP BY r, bucket
             |), probes AS (
             |  SELECT * FROM (VALUES ('the'),('a'),('row'),('table'),('value'),
             |                        ('data'),('query'),('zz_never_seen')) p(word)
             |), pb AS (
             |  SELECT word, r.r,
             |    CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || word),1,15)) AS BIGINT)
             |      % 1024 AS bucket
             |  FROM probes, range(4) r(r)
             |)
             |SELECT word, min(coalesce(cnt, CAST(0 AS BIGINT))) AS est
             |FROM pb LEFT JOIN sk USING (r, bucket)
             |GROUP BY word ORDER BY word""".stripMargin)),

    // URL-canonical dedup (round 11): the same page arrives under
    // trivially different spellings — case-variant scheme/host, default
    // ports, fragments, tracking params. The fixture plants all three
    // variant classes in rotating groups of 3; canonicalization must
    // unify each group exactly (is_survivor = lowest doc_id) while the
    // path/query payload stays case-sensitive and untouched. Regex
    // patterns shared verbatim with the RE2 oracle (the PII discipline).
    QueryDef(
      "text_url_dedup",
      (s, d) => {
        val g = expr("doc_id div 3").cast(StringType)
        val url = when(col("doc_id") % 3 === 0,
            concat(lit("http://example.com/docs/"), g, lit("?id="), g))
          .when(col("doc_id") % 3 === 1,
            concat(lit("HTTP://EXAMPLE.com:80/docs/"), g, lit("?id="), g,
              lit("#sec2")))
          .otherwise(
            concat(lit("http://example.com/docs/"), g, lit("?id="), g,
              lit("&utm_source=feed&gclid=x1")))
        TextOps.urlDedup(docsOf(s, d).withColumn("url", url), col("url"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (
              |  SELECT doc_id,
              |    CASE doc_id % 3
              |      WHEN 0 THEN 'http://example.com/docs/' || CAST(doc_id // 3 AS VARCHAR)
              |                  || '?id=' || CAST(doc_id // 3 AS VARCHAR)
              |      WHEN 1 THEN 'HTTP://EXAMPLE.com:80/docs/' || CAST(doc_id // 3 AS VARCHAR)
              |                  || '?id=' || CAST(doc_id // 3 AS VARCHAR) || '#sec2'
              |      ELSE 'http://example.com/docs/' || CAST(doc_id // 3 AS VARCHAR)
              |           || '?id=' || CAST(doc_id // 3 AS VARCHAR)
              |           || '&utm_source=feed&gclid=x1'
              |    END AS url
              |  FROM documents
              |), c1 AS (
              |  SELECT doc_id, url,
              |    lower(regexp_extract(url, '${TextOps.UrlSchemeHostPattern}'))
              |      || regexp_replace(url, '${TextOps.UrlSchemeHostPattern}', '') AS t
              |  FROM u
              |), c2 AS (
              |  SELECT doc_id, url,
              |    regexp_replace(t, '${TextOps.UrlFragmentPattern}', '') AS t FROM c1
              |), c3 AS (
              |  SELECT doc_id, url,
              |    regexp_replace(regexp_replace(t, '${TextOps.UrlHttpPortPattern}', '\\1\\2'),
              |                   '${TextOps.UrlHttpsPortPattern}', '\\1\\2') AS t
              |  FROM c2
              |), c4 AS (
              |  SELECT doc_id, url,
              |    regexp_replace(regexp_replace(regexp_replace(t,
              |      '${TextOps.UrlTrackMidPattern}', '', 'g'),
              |      '${TextOps.UrlTrackFirstPattern}', '?'),
              |      '${TextOps.UrlTrackOnlyPattern}', '') AS t
              |  FROM c3
              |), canon AS (
              |  SELECT doc_id, url,
              |    regexp_replace(regexp_replace(t, '\\?$$', ''), '([^/])/$$', '\\1') AS canonical
              |  FROM c4
              |), surv AS (
              |  SELECT canonical, min(doc_id) AS survivor FROM canon GROUP BY canonical
              |)
              |SELECT c.doc_id, c.url, c.canonical,
              |       c.doc_id = s.survivor AS is_survivor
              |FROM canon c JOIN surv s USING (canonical)
              |ORDER BY c.doc_id""".stripMargin)),

    // Hashed-feature linear quality scoring (round 11): the fastText/
    // CCNet classifier SHAPE — token → md5-hash bucket → weight-table
    // lookup → per-doc accumulate — with an md5-derived weight table so
    // the oracle rebuilds every weight from the same literals. The
    // accumulator is an integer (functions/HashedLinear), so the score
    // is accumulation-order-free; the final logit is one IEEE-exact
    // multiply+divide, never exp/pow. Map-side, zero shuffles.
    QueryDef(
      "text_quality_model",
      (s, d) =>
        docsOf(s, d).select(col("doc_id"),
            call_function("hlin_sum", col("text"), lit(1024)).as("raw"),
            size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("raw").cast(DoubleType) * 4 /
              (col("n_tokens").cast(DoubleType) * 549755813888.0), 6)
              .as("logit"))
          .orderBy("doc_id"),
      Some("""WITH words AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
             |), hashed AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substr(md5(w),1,15)) AS BIGINT) % 1024 AS j
             |  FROM words
             |), scored AS (
             |  SELECT doc_id,
             |    CAST(sum((CAST(('0x' || substr(md5('qw-' || CAST(j AS VARCHAR)),1,15)) AS BIGINT) >> 20)
             |             - 549755813888) AS BIGINT) AS raw,
             |    CAST(count(*) AS BIGINT) AS n_tokens
             |  FROM hashed GROUP BY doc_id
             |)
             |SELECT doc_id, n_tokens,
             |  round(CAST(raw AS DOUBLE) * 4 /
             |        (CAST(n_tokens AS DOUBLE) * 549755813888.0), 6) AS logit
             |FROM scored ORDER BY doc_id""".stripMargin)),

    // Cross-document boilerplate detection (CCNet/RefinedWeb line-level
    // dedup shape): verbatim 5-word segments carried by >= 2 distinct
    // documents are boilerplate; per-doc ratio. Digest-keyed counting —
    // two shuffles, no pair join.
    QueryDef(
      "text_boilerplate",
      (s, d) =>
        TextOps.boilerplate(docsOf(s, d), segWords = 5, minDocs = 2)
          .orderBy("doc_id"),
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text,' ') AS w FROM documents
             |), seg AS (
             |  SELECT doc_id, md5(array_to_string(w[(i-1)*5+1:(i-1)*5+5],' ')) AS sh
             |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)//5)) AS i
             |        FROM w WHERE len(w) >= 5)
             |), nd AS (
             |  SELECT sh, count(DISTINCT doc_id) AS nd FROM seg GROUP BY sh
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
             |       CAST(count(*) FILTER (nd.nd >= 2) AS BIGINT) AS n_boiler,
             |       round(CAST(count(*) FILTER (nd.nd >= 2) AS DOUBLE) / count(*), 6) AS boiler_ratio
             |FROM seg JOIN nd USING (sh)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // n-gram-LM quality scoring: mean bigram probability under the
    // corpus' own conditional bigram model (exactly-reproducible
    // perplexity stand-in — see TextOps.lmTypicality).
    QueryDef(
      "text_lm_typicality",
      (s, d) =>
        TextOps.lmTypicality(docsOf(s, d)).orderBy("doc_id"),
      Some("""WITH pos AS (
             |  SELECT doc_id, unnest(range(1, length(text))) AS i, text
             |  FROM documents
             |), bg AS (
             |  SELECT doc_id, substr(text, CAST(i AS BIGINT), 2) AS bigram FROM pos
             |), counts AS (
             |  SELECT bigram, count(*) AS b_cnt FROM bg GROUP BY bigram
             |), prefix AS (
             |  SELECT substr(bigram, 1, 1) AS p1, sum(b_cnt) AS p_cnt
             |  FROM counts GROUP BY 1
             |), model AS (
             |  SELECT bigram, CAST(b_cnt AS DOUBLE) / p_cnt AS p
             |  FROM counts JOIN prefix ON substr(bigram, 1, 1) = p1
             |), doc_counts AS (
             |  SELECT doc_id, bigram, count(*) AS dcnt FROM bg GROUP BY 1, 2
             |)
             |SELECT doc_id,
             |  round(CAST(SUM(CAST(CAST(dcnt AS DOUBLE) * p AS DECIMAL(38,12))) AS DOUBLE)
             |    / CAST(SUM(dcnt) AS DOUBLE), 6) AS typicality
             |FROM doc_counts JOIN model USING (bigram)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Deterministic HLL vocabulary estimate per language (round 13) —
    // the CMS move applied to CARDINALITY: md5-derived hashes, integer
    // register maxima, integer-exact Σ2^(49−reg), rho from HEX DIGITS
    // (no log2 on either engine) — so the ESTIMATES hash-check against
    // a full SQL replay while keeping HLL's mergeability (max) and
    // ~1.6% relative-error envelope (b=12), visible against the exact
    // count in the same row.
    QueryDef(
      "text_hll_vocab",
      (s, d) => {
        // trigram shingles, not tokens: the synthetic vocabulary is ~31
        // words (linear-counting regime only); distinct TRIGRAMS run
        // ~29k/lang — the raw-estimator regime the sketch exists for.
        // BOTH columns avoid materializing trigram strings (measured
        // 3.2-4.4 s of the gate's 4.2 s at sf0.1): registers come from
        // the fused hll_ngram_bucket_rho byte-range md5 (values ==
        // hll_bucket_rho(shingle), SketchesSpec-pinned), and the exact
        // count runs over the fused distinct xxhash64 shingle values
        // (count-equal under injective keying — the decontaminate-gate
        // precedent; the oracle keeps counting the strings themselves).
        val docs = docsOf(s, d)
        val est = graft.operators.Sketches.hllEstimate(
            graft.operators.Sketches.hllRegistersPacked(
              docs.select(col("lang"),
                explode(call_function("hll_ngram_bucket_rho",
                  col("text"), lit(3))).as("p")),
              col("lang"), col("p")))
          .withColumnRenamed("grp", "lang")
        val exact = docs
          .select(col("lang"),
            explode(graft.operators.Dedup.shingleHashes(col("text"), 3)).as("sh"))
          .groupBy("lang")
          .agg(countDistinct(col("sh")).as("n_exact"))
        est.join(exact, "lang").orderBy("lang")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w,
             |         generate_subscripts(string_split(text, ' '), 1) AS i
             |  FROM documents
             |), tok AS (
             |  SELECT lang, concat_ws(' ', w,
             |    lead(w,1) OVER (PARTITION BY doc_id ORDER BY i),
             |    lead(w,2) OVER (PARTITION BY doc_id ORDER BY i)) AS tok
             |  FROM w
             |  QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
             |), h AS (
             |  SELECT lang, md5(tok) AS hex FROM tok
             |), r AS (
             |  SELECT lang,
             |    CAST(('0x' || substr(hex, 1, 3)) AS BIGINT) AS bucket,
             |    length(regexp_extract(substr(hex, 4, 12), '^0*', 0)) AS z0,
             |    substr(substr(hex, 4, 12),
             |      length(regexp_extract(substr(hex, 4, 12), '^0*', 0)) + 1, 1) AS fnz
             |  FROM h
             |), regs AS (
             |  SELECT lang, bucket,
             |    max(z0*4 + CASE WHEN fnz = '' THEN 0
             |          WHEN fnz = '1' THEN 3
             |          WHEN fnz IN ('2','3') THEN 2
             |          WHEN fnz IN ('4','5','6','7') THEN 1
             |          ELSE 0 END + 1) AS reg
             |  FROM r GROUP BY lang, bucket
             |), g AS (
             |  SELECT lang, count(*) AS npresent,
             |         SUM(1::BIGINT << (49 - reg)) AS sp
             |  FROM regs GROUP BY lang
             |), e AS (
             |  SELECT lang,
             |    sp + (4096 - npresent) * (1::BIGINT << 49) AS sprime,
             |    4096 - npresent AS vzero
             |  FROM g
             |)
             |SELECT e.lang,
             |  round(CASE WHEN (0.7213/(1.0 + 1.079/4096.0)*4096.0*4096.0*562949953421312.0)
             |                  / CAST(sprime AS DOUBLE) <= 10240.0 AND vzero > 0
             |        THEN 4096.0 * ln(4096.0 / CAST(vzero AS DOUBLE))
             |        ELSE (0.7213/(1.0 + 1.079/4096.0)*4096.0*4096.0*562949953421312.0)
             |             / CAST(sprime AS DOUBLE) END, 4) AS hll_est,
             |  x.n_exact
             |FROM e JOIN (SELECT lang, count(DISTINCT tok) AS n_exact
             |             FROM tok GROUP BY lang) x USING (lang)
             |ORDER BY lang""".stripMargin)),

    // HTML main-text extraction (round 13) — the crawl→text ingestion
    // step: each document wrapped in a deterministic page (title, style,
    // script with literal < > inside, comment, entity-bearing nav and
    // footer), then script/style/comment/tag strip + finite entity
    // decode + whitespace collapse. Regex chain shared verbatim with
    // the RE2 oracle (the piiScrub discipline); map-side, zero shuffles.
    QueryDef(
      "text_html_extract",
      (s, d) => {
        val html = docsOf(s, d).select(col("doc_id"), concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style type=\"text/css\">body { color: #333; }</style>"),
          lit("<script>var n = 1 < 2 && 2 > 1;</script></head>"),
          lit("<body><!-- nav --><div class=\"nav\">Home &amp; About</div><p>"),
          col("text"),
          lit("</p><footer>&copy; 2026 &nbsp;Example</footer></body></html>")
        ).as("html"))
        TextOps.htmlExtract(html).orderBy("doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
             |    '</title><style type="text/css">body { color: #333; }</style>' ||
             |    '<script>var n = 1 < 2 && 2 > 1;</script></head>' ||
             |    '<body><!-- nav --><div class="nav">Home &amp; About</div><p>' ||
             |    text ||
             |    '</p><footer>&copy; 2026 &nbsp;Example</footer></body></html>' AS html
             |  FROM documents
             |), s1 AS (
             |  SELECT doc_id, html,
             |    regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t
             |  FROM h
             |), s2 AS (SELECT doc_id, html, regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
             |s3 AS (SELECT doc_id, html, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
             |s4 AS (SELECT doc_id, html, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s3),
             |s5 AS (SELECT doc_id, html,
             |  replace(replace(replace(replace(replace(replace(replace(t,
             |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
             |    '&nbsp;', ' '), '&copy;', '©'), '&amp;', '&') AS t
             |  FROM s4
             |), s6 AS (
             |  SELECT doc_id, html, trim(regexp_replace(t, '\s+', ' ', 'g')) AS t FROM s5
             |)
             |SELECT doc_id,
             |       regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS title,
             |       t AS clean_text,
             |       CAST(length(t) AS BIGINT) AS n_chars
             |FROM s6 ORDER BY doc_id""".stripMargin)),

    // Word-bigram stupid-backoff LM score (round 13) — the CCNet-class
    // reference-model fluency filter: model trained on the even-id half
    // of the corpus, odd-id half scored, so backoff genuinely fires on
    // unseen bigrams (a self-trained model never backs off). Float
    // parity via the typicality pattern: each lp is one IEEE expression
    // (log10 of identical doubles), decimal-summed, round 6.
    QueryDef(
      "text_lm_backoff",
      (s, d) => {
        val docs = docsOf(s, d)
        TextOps.stupidBackoffScore(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1))
          .orderBy("doc_id")
      },
      Some("""WITH ttok AS (
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
             |), lp AS (
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
             |)
             |SELECT doc_id, count(*) AS n_trans,
             |  round(CAST(SUM(CAST(lp AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS avg_logp
             |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // BM25 retrieval: fixed query bag → per-doc score → top-20. Float
    // parity via the typicality pattern (single IEEE expression per term,
    // decimal sum, round 6); the SQL spells k1+1 as (1.2 + 1.0) so both
    // engines fold the same doubles.
    QueryDef(
      "text_bm25_topk",
      (s, d) =>
        TextOps.bm25TopK(docsOf(s, d), Seq("hash", "join", "vector"), 20),
      Some("""WITH dl AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
             |  FROM documents
             |), stats AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
             |), tf AS (
             |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
             |  WHERE w IN ('hash', 'join', 'vector') GROUP BY doc_id, w
             |), dfreq AS (
             |  SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w
             |)
             |SELECT doc_id, round(CAST(SUM(CAST(
             |    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             |      * (t.tf * (1.2 + 1.0))
             |      / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
             |  AS DECIMAL(38, 12))) AS DOUBLE), 6) AS score
             |FROM tf t JOIN dfreq d USING (w) JOIN dl l USING (doc_id)
             |CROSS JOIN stats s
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // Gopher repetition rules: dup-trigram fraction + top-bigram share,
    // flagged at the published thresholds over rounded values.
    QueryDef(
      "text_repetition",
      (s, d) =>
        TextOps.repetitionSignals(docsOf(s, d)).orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |  WHERE len(string_split(text, ' ')) >= 3
             |), bic AS (
             |  SELECT doc_id, w[i] || ' ' || w[i+1] AS g, count(*) AS c
             |  FROM t, unnest(range(1, len(w))) AS r(i) GROUP BY 1, 2
             |), bia AS (
             |  SELECT doc_id, max(c) AS max2, sum(c) AS tot2 FROM bic GROUP BY 1
             |), tric AS (
             |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g,
             |         count(*) AS c
             |  FROM t, unnest(range(1, len(w) - 1)) AS r(i) GROUP BY 1, 2
             |), tria AS (
             |  SELECT doc_id, sum(c) AS tot3, count(*) AS dist3 FROM tric GROUP BY 1
             |)
             |SELECT doc_id,
             |  round(CAST(max2 AS DOUBLE) / CAST(tot2 AS DOUBLE), 6) AS top_bigram_frac,
             |  round(CAST(tot3 - dist3 AS DOUBLE) / CAST(tot3 AS DOUBLE), 6) AS dup_trigram_frac,
             |  (round(CAST(tot3 - dist3 AS DOUBLE) / CAST(tot3 AS DOUBLE), 6) > 0.30
             |   OR round(CAST(max2 AS DOUBLE) / CAST(tot2 AS DOUBLE), 6) > 0.18) AS flagged
             |FROM bia JOIN tria USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Overlapping token-window chunking (RAG prep): 64-token windows,
    // 16-token overlap, ragged tail, digests instead of text downstream.
    QueryDef(
      "text_chunks",
      (s, d) =>
        TextOps.chunkWindows(docsOf(s, d), 64, 16).orderBy("doc_id", "chunk_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |), c AS (
             |  SELECT doc_id, i AS chunk_id,
             |    array_to_string(w[i*48 + 1 : i*48 + 64], ' ') AS chunk
             |  FROM t, unnest(range(0,
             |    greatest(0, CAST(floor((len(w) - 17) / 48.0) AS BIGINT)) + 1)) AS r(i)
             |)
             |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens,
             |  md5(chunk) AS chunk_md5
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // Document fingerprint: md5 of normalized text + 60-bit bucket key.
    QueryDef(
      "text_fingerprint",
      (s, d) =>
        TextOps.fingerprint(docsOf(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
             |  ('0x' || substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp_bucket
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // C12 multimodal chunking (frame-sample analog): blob → chunk rows.
    // The corpus is ASCII so a 64-byte binary chunk equals the 64-char
    // text substring — which is what lets DuckDB oracle the digests.
    QueryDef(
      "mm_chunks",
      (s, d) =>
        Multimodal.chunk(Multimodal.withMediaColumn(
            docsOf(s, d).filter(col("doc_id") < 50)), 64)
          .select(col("doc_id"), col("chunk_idx"),
            md5(col("chunk")).as("chunk_md5"),
            length(col("chunk")).cast(LongType).as("chunk_len"))
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH c AS (
             |  SELECT doc_id, unnest(range(CAST(ceil(length(text) / 64.0) AS BIGINT))) AS chunk_idx,
             |         text
             |  FROM documents WHERE doc_id < 50
             |)
             |SELECT doc_id, chunk_idx,
             |       md5(substr(text, CAST(chunk_idx * 64 + 1 AS BIGINT), 64)) AS chunk_md5,
             |       CAST(length(substr(text, CAST(chunk_idx * 64 + 1 AS BIGINT), 64)) AS BIGINT) AS chunk_len
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // C12 multimodal frame-sampling: every 4th chunk, max 3 frames per
    // document — the "sample k frames of a video" shape; the filter lands
    // on the chunk explode so unsampled frames cost nothing downstream.
    QueryDef(
      "mm_frames",
      (s, d) =>
        Multimodal.frameSample(Multimodal.withMediaColumn(
            docsOf(s, d).filter(col("doc_id") < 50)), 64, 4, 3)
          .select(col("doc_id"), col("frame_no"),
            md5(col("frame")).as("frame_md5"),
            length(col("frame")).cast(LongType).as("frame_len"))
          .orderBy("doc_id", "frame_no"),
      Some("""WITH f AS (
             |  SELECT doc_id, unnest([0, 1, 2]) AS frame_no, text
             |  FROM documents WHERE doc_id < 50
             |)
             |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
             |       md5(substr(text, frame_no * 256 + 1, 64)) AS frame_md5,
             |       CAST(length(substr(text, frame_no * 256 + 1, 64)) AS BIGINT) AS frame_len
             |FROM f WHERE frame_no * 4 < ceil(length(text) / 64.0)
             |ORDER BY doc_id, frame_no""".stripMargin)),

    // C12 multimodal with a REAL codec: strict UTF-8 decode + repair over
    // the binary column (the text-modality analog of image decode), same
    // mapPartitions plumbing as the stub path.
    QueryDef(
      "mm_utf8",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withMediaColumn(docsOf(s, d)), Multimodal.Utf8TextCodec)
          .select(col("doc_id"),
            col("features").getField("n_bytes").as("n_bytes"),
            col("features").getField("n_chars").as("n_chars"),
            col("features").getField("n_lines").as("n_lines"),
            col("features").getField("valid_utf8").as("valid_utf8"),
            col("features").getField("digest").as("digest"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(length(text) AS BIGINT) AS n_chars,
             |  CAST(1 + length(text) - length(replace(text, chr(10), '')) AS BIGINT) AS n_lines,
             |  true AS valid_utf8,
             |  md5(text) AS digest
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // C12 multimodal with a REAL image codec: synthesize a valid 8×2
    // 24-bpp BMP per document (pixels = md5(text) digest bytes), decode
    // it with the pure-JVM BMP parser, emit dimensions + exact channel
    // means. The oracle recomputes the means from the hex digest alone —
    // no BMP parser in DuckDB needed — so the decode path is fully
    // value-checked, not rows-only. Means are k/16 (dyadic), so the
    // doubles are exact on both engines.
    QueryDef(
      "mm_decode",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withBmpColumn(docsOf(s, d)), Multimodal.BmpCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("bpp").as("bpp"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("mean_g").as("mean_g"),
            col("features").getField("mean_b").as("mean_b"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 8 AS width, 2 AS height, 24 AS bpp,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_r,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_g,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_b
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 multimodal with a REAL compressed-image codec: synthesize a
    // baseline JPEG per document (32×32 grayscale, 16 constant 8×8 blocks
    // = md5(text) digest bytes, flat q=8 quant table — DC-only spectra
    // reconstruct EXACTLY, see Multimodal.withJpegColumn), decode it with
    // the pure-JVM Huffman+IDCT decoder, emit dimensions + channel means.
    // The oracle replays the means from the hex digest alone (Σbytes/16,
    // dyadic per-pixel values ⇒ bit-exact doubles), so the full decode
    // path — marker walk, DQT/DHT parse, entropy decode, dequant, IDCT —
    // is value-checked, not rows-only.
    QueryDef(
      "mm_jpeg",
      (s, d) =>
        Multimodal.extractFeatures(
            // partition for COMPUTE, not bytes: the 5 K-row corpus is one
            // ~0.5 MB parquet split, but JPEG encode+decode is ~150 µs/row
            // — byte-sized splits would serialize the codec on one core
            Multimodal.withJpegColumn(
              docsOf(s, d).repartition(s.sparkContext.defaultParallelism)),
            Multimodal.JpegCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("components").as("components"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("mean_g").as("mean_g"),
            col("features").getField("mean_b").as("mean_b"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 32 AS width, 32 AS height, 1 AS components,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_r,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_g,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_b
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 PROGRESSIVE JPEG (SOF2): the same DC-exact image through the
    // successive-approximation scan script — DC first + refinement
    // carry the values, the AC scans are pure EOB runs — and the means
    // still replay exactly from the digest. JpegSpec separately pins
    // progressive == baseline bit-equality on dense-AC images.
    QueryDef(
      "mm_jpeg_progressive",
      (s, d) =>
        Multimodal.extractFeatures(
            // partition for COMPUTE, not bytes: the 5 K-row corpus is one
            // ~0.5 MB parquet split, but JPEG encode+decode is ~150 µs/row
            // — byte-sized splits would serialize the codec on one core
            Multimodal.withJpegProgressiveColumn(
              docsOf(s, d).repartition(s.sparkContext.defaultParallelism)),
            Multimodal.JpegCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("components").as("components"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("mean_g").as("mean_g"),
            col("features").getField("mean_b").as("mean_b"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 32 AS width, 32 AS height, 1 AS components,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_r,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_g,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_b
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12: the COLOR 4:2:0 sibling of mm_jpeg — three-component YCbCr
    // with 2×2 chroma subsampling (the dominant real-world layout). The
    // achromatic fixture (r=g=b per block) makes Cb/Cr quantize to zero
    // and Y reconstruct exactly, so the full interleaved-MCU decode +
    // upsample + color transform is value-checked by the same digest
    // replay, with components=3.
    QueryDef(
      "mm_jpeg420",
      (s, d) =>
        Multimodal.extractFeatures(
            // see mm_jpeg: codec cost dominates input bytes 1000:1
            Multimodal.withJpeg420Column(
              docsOf(s, d).repartition(s.sparkContext.defaultParallelism)),
            Multimodal.JpegCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("components").as("components"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("mean_g").as("mean_g"),
            col("features").getField("mean_b").as("mean_b"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 32 AS width, 32 AS height, 3 AS components,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_r,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_g,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_b
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 multimodal with a REAL audio codec: synthesize a stereo PCM16
    // WAV per document (16 interleaved samples = md5(text) digest bytes
    // mapped to (b-128)*256; L = even bytes, R = odd), decode it with the
    // pure-JVM RIFF/WAVE parser, emit rate/channels/frames/duration +
    // exact per-channel RMS. The oracle replays the same integer samples
    // from the hex digest — squares summed exactly in BIGINT, one dyadic
    // divide, one IEEE sqrt — so the doubles hash-match bit-for-bit.
    QueryDef(
      "mm_audio",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withWavColumn(docsOf(s, d)), Multimodal.WavCodec)
          .select(col("doc_id"),
            col("features").getField("sample_rate").as("sample_rate"),
            col("features").getField("channels").as("channels"),
            col("features").getField("bits").as("bits"),
            col("features").getField("n_frames").as("n_frames"),
            col("features").getField("duration_s").as("duration_s"),
            col("features").getField("rms_l").as("rms_l"),
            col("features").getField("rms_r").as("rms_r"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST((('0x' || substr(md5(text), i*2+1, 2))::INT - 128) * 256 AS BIGINT)) AS sm
             |  FROM documents
             |)
             |SELECT doc_id, 8000 AS sample_rate, 2 AS channels, 16 AS bits,
             |  CAST(8 AS BIGINT) AS n_frames,
             |  CAST(8 AS DOUBLE) / 8000 AS duration_s,
             |  sqrt(CAST(list_sum(list_transform([1,3,5,7,9,11,13,15], i -> sm[i]*sm[i])) AS DOUBLE) / 8) AS rms_l,
             |  sqrt(CAST(list_sum(list_transform([2,4,6,8,10,12,14,16], i -> sm[i]*sm[i])) AS DOUBLE) / 8) AS rms_r
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 REAL compressed audio: each document carries a mono IMA-ADPCM
    // WAV (16 constant 9-sample blocks = digest bytes scaled to PCM16).
    // Constant blocks sit in the lossy codec's exact-representable
    // subspace (see withAdpcmColumn), so the decoded RMS replays from
    // the digest: √(Σ((b−128)·256)²/16) — the full chunk walk, extended
    // fmt parse, fact clamp and per-nibble state machine must all run
    // to produce it.
    QueryDef(
      "mm_adpcm",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withAdpcmColumn(docsOf(s, d)), Multimodal.AdpcmWavCodec)
          .select(col("doc_id"),
            col("features").getField("sample_rate").as("sample_rate"),
            col("features").getField("bits").as("bits"),
            col("features").getField("samples_per_block").as("samples_per_block"),
            col("features").getField("n_frames").as("n_frames"),
            col("features").getField("rms").as("rms"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST((('0x' || substr(md5(text), i*2+1, 2))::INT - 128) * 256 AS BIGINT)) AS sm
             |  FROM documents
             |)
             |SELECT doc_id, 8000 AS sample_rate, 4 AS bits,
             |  9 AS samples_per_block, CAST(144 AS BIGINT) AS n_frames,
             |  sqrt(CAST(list_sum(list_transform(sm, s -> s*s)) AS DOUBLE) / 16) AS rms
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 with the modern single-pass lossless image format: QOI —
    // digest-gray pixels through the op stream (RUN/INDEX/DIFF/LUMA/RGB
    // as the byte deltas dictate); lossless ⇒ the mean and first pixel
    // replay from the hex digest exactly.
    QueryDef(
      "mm_qoi",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withQoiColumn(docsOf(s, d)), Multimodal.QoiCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("channels").as("channels"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("first_px").as("first_px"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 4 AS width, 4 AS height, 4 AS channels,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_r,
             |  g[1] AS first_px
             |FROM px ORDER BY doc_id""".stripMargin)),

    // WARC ingestion (ISO 28500 — the Common Crawl arrival format):
    // each document ships as a 2-record WARC file (warcinfo + HTTP
    // response); the strict-framing parser explodes records per
    // partition and strips HTTP headers, and the recovered body must
    // hash-match the original text exactly.
    QueryDef(
      "text_warc_ingest",
      (s, d) =>
        graft.sources.Warc.records(
            graft.sources.Warc.withWarcColumn(
              docsOf(s, d).repartition(s.sparkContext.defaultParallelism)))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_records"),
            max(col("target_uri")).as("target_uri"),
            max(when(col("warc_type") === "response", md5(col("body"))))
              .as("body_md5"),
            max(when(col("warc_type") === "response",
              length(col("body")).cast(LongType))).as("body_len"))
          .orderBy("doc_id"),
      Some(warcIngestOracle)),

    // the SAME ingestion through the Common Crawl `.warc.gz` layout —
    // one gzip member per record, concatenated; the reader sniffs the
    // magic and the recovered bodies must be identical (same oracle)
    QueryDef(
      "text_warc_gz_ingest",
      (s, d) =>
        graft.sources.Warc.records(
            graft.sources.Warc.withWarcColumn(
              docsOf(s, d).repartition(s.sparkContext.defaultParallelism),
              gz = true))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_records"),
            max(col("target_uri")).as("target_uri"),
            max(when(col("warc_type") === "response", md5(col("body"))))
              .as("body_md5"),
            max(when(col("warc_type") === "response",
              length(col("body")).cast(LongType))).as("body_len"))
          .orderBy("doc_id"),
      Some(warcIngestOracle)),

    // the SAME ingestion a third time, through the SPLITTABLE reader —
    // the 100 TB arrival shape: a few multi-record `.warc.gz` files on
    // disk (built once per session, each writer task emitting one object
    // — the object-store pattern), then read by BYTE-RANGE splits sized
    // well below the files so every task syncs mid-file to a gzip-member
    // boundary. Bodies must still hash-match the source text exactly
    // (same oracle), which proves the sync/ownership rule loses and
    // duplicates nothing.
    QueryDef(
      "text_warc_split_ingest",
      (s, d) => {
        graft.sources.Warc.readGzSplits(s, s"${warcSplitFixture(s, d)}/*.warc.gz",
            splitSize = 16L << 10)
          .withColumn("doc_id",
            regexp_extract(col("record_id"), "-(\\d+)>$", 1).cast(LongType))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_records"),
            max(col("target_uri")).as("target_uri"),
            max(when(col("warc_type") === "response", md5(col("body"))))
              .as("body_md5"),
            max(when(col("warc_type") === "response",
              length(col("body")).cast(LongType))).as("body_len"))
          .orderBy("doc_id")
      },
      Some(warcIngestOracle)),

    // the SAME ingestion through the DataSource V2 format
    // (`spark.read.format("warcgz")`) — WARC as a first-class Spark
    // source: split planning inside the source, column pruning reaching
    // the reader (WarcSpec pins a target_uri-only projection never
    // carries payload/body through the scan). Same oracle, fourth path.
    QueryDef(
      "text_warc_format_ingest",
      (s, d) =>
        s.read.format("warcgz")
          .option("splitSize", 64 << 10)
          .load(s"${warcSplitFixture(s, d)}/*.warc.gz")
          .withColumn("doc_id",
            regexp_extract(col("record_id"), "-(\\d+)>$", 1).cast(LongType))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_records"),
            max(col("target_uri")).as("target_uri"),
            max(when(col("warc_type") === "response", md5(col("body"))))
              .as("body_md5"),
            max(when(col("warc_type") === "response",
              length(col("body")).cast(LongType))).as("body_len"))
          .orderBy("doc_id"),
      Some(warcIngestOracle)),

    // Round-13 capstone: CRAWLED HTML -> CURATED TEXT in one lazy plan —
    // the CommonCrawl pipeline end-to-end: splittable warc.gz read of
    // HTML response bodies, main-text extraction (script/entity strip),
    // quality on the EXTRACTED text, keep verdicts. The oracle states
    // the expected extraction in CLOSED FORM from the documents table
    // (the page wrapper is deterministic and the corpus is
    // whitespace-regular), so any extraction or ingestion byte drift
    // fails the hash — a stronger check than replaying the strip chain.
    QueryDef(
      "text_warc_html_curation",
      (s, d) => {
        val pages = graft.sources.Warc.readGzSplits(
            s, s"${warcHtmlFixture(s, d)}/*.warc.gz", splitSize = 64L << 10)
          .filter(col("warc_type") === "response")
          .select(
            regexp_extract(col("record_id"), "-(\\d+)>$", 1)
              .cast(LongType).as("doc_id"),
            col("body").cast(StringType).as("html"))
        // quality as a COLUMN (qualityCol): the whole pipeline —
        // splittable read → extract → score → verdict — is one map pass
        // with zero shuffles before the presentation sort
        TextOps.htmlExtract(pages)
          .select(col("doc_id"), col("title"), col("n_chars"),
            TextOps.qualityCol(col("clean_text")).as("quality"))
          .withColumn("kept", col("quality") >= 0.5)
          .orderBy("doc_id")
      },
      Some("""WITH x AS (
             |  SELECT doc_id,
             |         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
             |         'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
             |           || ' © 2026' AS clean_text
             |  FROM documents
             |), qw AS (
             |  SELECT doc_id, string_split(lower(clean_text), ' ') AS w FROM x
             |), q AS (
             |  SELECT doc_id,
             |    round(least(CAST(len(w) AS DOUBLE) / 200.0, 1.0) * 0.5
             |      + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3
             |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
             |              / len(w) * 5.0, 1.0) * 0.2, 6) AS quality
             |  FROM qw
             |)
             |SELECT x.doc_id, x.title,
             |       CAST(length(x.clean_text) AS BIGINT) AS n_chars,
             |       q.quality, q.quality >= 0.5 AS kept
             |FROM x JOIN q USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Round-11 capstone: WARC ARRIVAL -> CURATED CORPUS in one lazy
    // plan. The splittable reader's recovered bodies feed quality
    // scoring, fingerprint dedup and a hash-Bernoulli keep decision
    // directly — no intermediate materialization between "bytes on an
    // object store" and "curation verdicts". The oracle replays the
    // whole formula from the documents table, which is valid because
    // the ingestion gates pin body == text byte-exactly.
    QueryDef(
      "text_warc_curation",
      (s, d) => {
        // quality and fingerprint are ROW-LOCAL (qualityCol /
        // fingerprintCol) — compute both in the decode pass; cached
        // because the survivor election re-reads the scored frame;
        // result-reachable, so Scratch-registered rather than leaked
        val docs = graft.util.Scratch.cached(graft.sources.Warc.readGzSplits(
            s, s"${warcSplitFixture(s, d)}/*.warc.gz", splitSize = 64L << 10)
          .filter(col("warc_type") === "response")
          .select(
            regexp_extract(col("record_id"), "-(\\d+)>$", 1)
              .cast(LongType).as("doc_id"),
            col("body").cast(StringType).as("text"))
          .withColumn("quality", TextOps.qualityCol(col("text")))
          .withColumn("fp", TextOps.fingerprintCol(col("text"))))
        // the ONE real aggregation: lowest doc per fingerprint class
        val surv = docs.groupBy("fp").agg(min(col("doc_id")).as("survivor"))
        docs.join(surv, "fp")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
            col("quality"),
            (col("doc_id") === col("survivor")).as("is_survivor"),
            (col("quality") >= 0.5 && col("doc_id") === col("survivor") &&
              graft.operators.Sampling.hashDraw(col("doc_id")) <
                lit(graft.operators.Sampling.rateThreshold(0.8))).as("kept"))
          .orderBy("doc_id")
      },
      Some(s"""WITH qw AS (
              |  SELECT doc_id, string_split(lower(text),' ') AS w FROM documents
              |), q AS (
              |  SELECT doc_id,
              |    round(least(CAST(len(w) AS DOUBLE) / 200.0, 1.0) * 0.5
              |      + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3
              |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
              |              / len(w) * 5.0, 1.0) * 0.2, 6) AS quality
              |  FROM qw
              |), fp AS (
              |  SELECT doc_id,
              |    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              |  FROM documents
              |), surv AS (
              |  SELECT fp, min(doc_id) AS survivor FROM fp GROUP BY fp
              |)
              |SELECT d.doc_id,
              |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
              |  q.quality,
              |  d.doc_id = s.survivor AS is_survivor,
              |  (q.quality >= 0.5 AND d.doc_id = s.survivor AND
              |   substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
              |     < '${graft.operators.Sampling.rateThreshold(0.8)}') AS kept
              |FROM documents d
              |JOIN q USING (doc_id) JOIN fp USING (doc_id)
              |JOIN surv s USING (fp)
              |ORDER BY d.doc_id""".stripMargin)),

    // C12 telephony audio: the 16 digest bytes ARE mu-law code bytes in
    // a format-7 WAV; the oracle replays the G.711 logarithmic expansion
    // as pure integer arithmetic (bit-NOT, exponent/mantissa split,
    // shift, bias) — no lossy-subspace carve-out, the code bytes are
    // the ground truth.
    QueryDef(
      "mm_g711",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withG711Column(docsOf(s, d)), Multimodal.G711WavCodec)
          .select(col("doc_id"),
            col("features").getField("sample_rate").as("sample_rate"),
            col("features").getField("law").as("law"),
            col("features").getField("n_samples").as("n_samples"),
            col("features").getField("rms").as("rms"))
          .orderBy("doc_id"),
      Some("""WITH cb AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS c
             |  FROM documents
             |), pcm AS (
             |  SELECT doc_id, list_transform(c, b -> CASE
             |      WHEN (255 - b) >= 128
             |      THEN -((((((255 - b) % 128) % 16) * 8 + 132) << (((255 - b) % 128) // 16)) - 132)
             |      ELSE  ((((((255 - b) % 128) % 16) * 8 + 132) << (((255 - b) % 128) // 16)) - 132)
             |    END) AS s
             |  FROM cb
             |)
             |SELECT doc_id, 8000 AS sample_rate, 'mulaw' AS law,
             |  CAST(16 AS BIGINT) AS n_samples,
             |  sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE) / 16) AS rms
             |FROM pcm ORDER BY doc_id""".stripMargin)),

    // C12 with a REAL lossless compressed-AUDIO codec: 128 mono samples
    // (digest bytes tiled 8×) FLAC-encoded at blockSize 64 — two frames
    // of FIXED-predicted Rice-coded residuals, decoded through the full
    // frame-sync/CRC/MD5-verified pure-JVM parser. Lossless ⇒ the RMS
    // replays from the hex digest exactly, for ARBITRARY content (no
    // exact-representable subspace needed, unlike ADPCM).
    QueryDef(
      "mm_flac",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withFlacColumn(docsOf(s, d)), Multimodal.FlacCodec)
          .select(col("doc_id"),
            col("features").getField("sample_rate").as("sample_rate"),
            col("features").getField("channels").as("channels"),
            col("features").getField("n_samples").as("n_samples"),
            col("features").getField("rms").as("rms"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST((('0x' || substr(md5(text), i*2+1, 2))::INT - 128) * 256 AS BIGINT)) AS sm
             |  FROM documents
             |)
             |SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
             |  CAST(128 AS BIGINT) AS n_samples,
             |  sqrt(CAST(list_sum(list_transform(sm, s -> s*s)) AS DOUBLE) / 16) AS rms
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 with a REAL lossless compressed-image codec: synthesize a 2×8
    // grayscale PNG per document (16 pixels = md5(text) digest bytes,
    // scanline filters cycling None/Sub/Up/Average/Paeth down the rows),
    // decode it with the pure-JVM chunk-walk + CRC + Inflater + unfilter
    // parser. PNG is lossless, so the decoded mean is Σ(digest bytes)/16
    // exactly and the oracle replays it from the hex digest — the value
    // check covers the container, the DEFLATE stream and all five filter
    // reconstructions on every row of the corpus.
    QueryDef(
      "mm_png",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withPngColumn(docsOf(s, d)), Multimodal.PngCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("channels").as("channels"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("mean_g").as("mean_g"),
            col("features").getField("mean_b").as("mean_b"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 2 AS width, 8 AS height, 1 AS channels,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_r,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_g,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_b
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 RESIZE (round 16): the mandated decode → RESIZE →
    // feature-extract chain — the 2×8 grayscale PNG box-downscaled by
    // 1×2 (each output pixel = floor-mean of a vertical pixel pair) and
    // RE-ENCODED as real PNG bytes, features then extracted from the
    // resized stream through the standard codec. Decode, the block
    // arithmetic, the re-encode and the second decode are all in the
    // hash: the oracle replays every block mean from the digest bytes.
    QueryDef(
      "mm_resize",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.resizePng(
              Multimodal.withPngColumn(docsOf(s, d)), fw = 1, fh = 2),
            Multimodal.PngCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("channels").as("channels"),
            col("features").getField("mean_r").as("mean_r"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |), rb AS (
             |  SELECT doc_id,
             |    list_transform(generate_series(0, 7), j ->
             |      (g[4 * (j // 2) + (j % 2) + 1]
             |       + g[4 * (j // 2) + (j % 2) + 3]) // 2) AS b
             |  FROM px
             |)
             |SELECT doc_id, 2 AS width, 4 AS height, 1 AS channels,
             |  CAST(list_sum(b) AS DOUBLE) / 8 AS mean_r
             |FROM rb ORDER BY doc_id""".stripMargin)),

    // C12 PNG, Adam7 + RGBA face: interlaced four-channel streams where
    // the color means replay from the digest (alpha varies but must
    // never leak into them) — the 7-pass reassembly, the 4-byte-pixel
    // filter arithmetic and the alpha exclusion all have to be right.
    QueryDef(
      "mm_png_rgba",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withPngRgbaColumn(docsOf(s, d)), Multimodal.PngCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("channels").as("channels"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("mean_g").as("mean_g"),
            col("features").getField("mean_b").as("mean_b"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 2 AS width, 8 AS height, 4 AS channels,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_r,
             |  255 - CAST(list_sum(g) AS DOUBLE) / 16 AS mean_g,
             |  CAST(list_sum(list_transform(g, v -> xor(v, 85))) AS DOUBLE) / 16 AS mean_b
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 PNG, palette face: digest bytes as indices through an
    // identity-gray PLTE — the palette expansion is what produces the
    // means, so a wrong or skipped PLTE lookup cannot hash-match.
    QueryDef(
      "mm_png_palette",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withPngPaletteColumn(docsOf(s, d)), Multimodal.PngCodec)
          .select(col("doc_id"),
            col("features").getField("channels").as("channels"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("mean_g").as("mean_g"),
            col("features").getField("mean_b").as("mean_b"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 3 AS channels,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_r,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_g,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_b
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 REAL inter-frame video: each document carries a 5-frame
    // animated GIF whose frames are delta rectangles composited under
    // the full disposal/transparency rules (see withGifColumn). The
    // final canvas exists in NO single frame — interlace, LZW, local
    // palettes, transparency and disposals 2/3 all have to work for the
    // probe pixels and mean to come out right — and every value replays
    // from the hex digest with CASE arithmetic (a|b below = a unless
    // a==0, then b: the transparent-index rule).
    QueryDef(
      "mm_gif",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withGifColumn(docsOf(s, d)), Multimodal.GifCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("n_frames").as("n_frames"),
            col("features").getField("mean_gray").as("mean_gray"),
            col("features").getField("px_override").as("px_override"),
            col("features").getField("px_disposal2").as("px_disposal2"),
            col("features").getField("px_disposal3").as("px_disposal3"),
            col("features").getField("px_last").as("px_last"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 4 AS width, 4 AS height, CAST(5 AS BIGINT) AS n_frames,
             |  CAST(g[1] + CASE WHEN g[5] != 0 THEN g[5] ELSE g[2] END
             |     + g[3] + g[4] + g[5]
             |     + CASE WHEN g[6] != 0 THEN g[6] ELSE 0 END
             |     + g[8] + g[9] + g[12] + g[13] + g[14] + g[15] + g[7]
             |     AS DOUBLE) / 16 AS mean_gray,
             |  CASE WHEN g[5] != 0 THEN g[5] ELSE g[2] END AS px_override,
             |  0 AS px_disposal2, 0 AS px_disposal3, g[7] AS px_last
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 REAL lossless inter-frame animation — APNG, the PNG-family
    // sibling of mm_gif: 4 frames whose final canvas exists in no single
    // frame; the acTL/fcTL/fdAT grammar, per-frame PNG filter/DEFLATE
    // decode, and dispose BACKGROUND/PREVIOUS compositing all have to
    // work for the probes and means to replay from the hex digest.
    QueryDef(
      "mm_apng",
      (s, d) =>
        Multimodal.extractFeatures(
            Multimodal.withApngColumn(docsOf(s, d)), Multimodal.ApngCodec)
          .select(col("doc_id"),
            col("features").getField("width").as("width"),
            col("features").getField("height").as("height"),
            col("features").getField("n_frames").as("n_frames"),
            col("features").getField("num_plays").as("num_plays"),
            col("features").getField("mean_r").as("mean_r"),
            col("features").getField("mean_a").as("mean_a"),
            col("features").getField("px00").as("px00"),
            col("features").getField("px_mid").as("px_mid"),
            col("features").getField("px11").as("px11"))
          .orderBy("doc_id"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, 4 AS width, 4 AS height, CAST(4 AS BIGINT) AS n_frames,
             |  0 AS num_plays,
             |  CAST(g[3] + g[4] + g[7] + g[8] + 2*g[9] + g[10] + g[11] + g[12]
             |     + g[13] + g[14] + g[15] + g[16] AS DOUBLE) / 16 AS mean_r,
             |  CAST(13 * 255 AS DOUBLE) / 16 AS mean_a,
             |  0 AS px00, g[11] AS px_mid, g[9] AS px11
             |FROM px ORDER BY doc_id""".stripMargin)),

    // C12 REAL video frame-sampling: each document carries a 4-frame
    // MJPEG stream (frame f = the mm_jpeg image with digest bytes rotated
    // by f); the sampler indexes all frames with the marker-aware byte
    // scan (no decode), then fully decodes only frames 0 and 2
    // (stride 2, max 2). n_frames proves the index saw all 4; first_px
    // pins WHICH frame was decoded (= digest byte f); mean_gray is the
    // rotation-invariant Σ/16 — all replayed from the hex digest.
    QueryDef(
      "mm_video",
      (s, d) =>
        Multimodal.sampleVideoFrames(
            // see mm_jpeg: codec cost dominates input bytes 1000:1
            Multimodal.withMjpegColumn(
              docsOf(s, d).repartition(s.sparkContext.defaultParallelism)),
            stride = 2, maxFrames = 2)
          .orderBy("doc_id", "frame_no"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |)
             |SELECT doc_id, CAST(f.fno AS BIGINT) AS frame_no,
             |  CAST(4 AS BIGINT) AS n_frames, 32 AS width, 32 AS height,
             |  CAST(list_sum(g) AS DOUBLE) / 16 AS mean_gray,
             |  g[f.fno + 1] AS first_px
             |FROM px CROSS JOIN (VALUES (0), (2)) f(fno)
             |ORDER BY doc_id, frame_no""".stripMargin)),

    // C12 REAL motion analysis (round 19): block-matching SAD search
    // between consecutive MJPEG frames — the motion-compensation signal
    // of a video curation pipeline, over the same 4-frame fixture as
    // mm_video. The fixture's frames rotate the digest bytes through the
    // 16 constant 8x8 blocks, so content genuinely MOVES one block left
    // per frame (with row wrap); the gate runs the block-aligned coarse
    // regime (step = blockSize = radius = 8), where every candidate SAD
    // is 64·|digest byte − digest byte| — a pure formula the oracle
    // replays, including the (sad, dy, dx) first-minimum tie-break.
    // Interior blocks recover the true motion (dx=+8, sad=0); row-edge
    // blocks (where the wrap breaks translation) get the deterministic
    // argmin over imperfect candidates. The exhaustive step=1 regime is
    // spec-pinned to recover a planted shift exactly (MultimodalSpec).
    QueryDef(
      "mm_motion",
      (s, d) =>
        Multimodal.motionEstimate(
            Multimodal.withMjpegColumn(
              docsOf(s, d).repartition(s.sparkContext.defaultParallelism)),
            blockSize = 8, radius = 8, step = 8)
          .orderBy("doc_id", "frame_no", "by", "bx"),
      Some("""WITH px AS (
             |  SELECT doc_id, list_transform(generate_series(0, 15),
             |    i -> CAST(('0x' || substr(md5(text), i*2+1, 2)) AS INT)) AS g
             |  FROM documents
             |), grid AS (
             |  SELECT doc_id, g, f.f, b.by, b2.bx
             |  FROM px
             |  CROSS JOIN (VALUES (1), (2), (3)) f(f)
             |  CROSS JOIN (VALUES (0), (1), (2), (3)) b(by)
             |  CROSS JOIN (VALUES (0), (1), (2), (3)) b2(bx)
             |), cand AS (
             |  SELECT doc_id, g, f, by, bx, dyb.dyb, dxb.dxb,
             |         64 * abs(g[((by*4 + bx) + f) % 16 + 1]
             |                - g[((by + dyb.dyb)*4 + (bx + dxb.dxb) + f - 1) % 16 + 1]) AS sad
             |  FROM grid
             |  CROSS JOIN (VALUES (-1), (0), (1)) dyb(dyb)
             |  CROSS JOIN (VALUES (-1), (0), (1)) dxb(dxb)
             |  WHERE by + dyb.dyb BETWEEN 0 AND 3
             |    AND bx + dxb.dxb BETWEEN 0 AND 3
             |)
             |SELECT doc_id, frame_no, bx, by, dx, dy, sad FROM (
             |  SELECT doc_id, CAST(f AS BIGINT) AS frame_no, bx, by,
             |         dxb * 8 AS dx, dyb * 8 AS dy, CAST(sad AS BIGINT) AS sad,
             |         row_number() OVER (
             |           PARTITION BY doc_id, f, by, bx
             |           ORDER BY sad, dyb, dxb) AS rn
             |  FROM cand) t
             |WHERE rn = 1
             |ORDER BY doc_id, frame_no, by, bx""".stripMargin)),

    // C12 multimodal: binary media column + mapPartitions feature
    // extraction (stub decoder, real plumbing — see operators.Multimodal).
    QueryDef(
      "mm_features",
      (s, d) =>
        Multimodal.extractFeatures(Multimodal.withMediaColumn(docsOf(s, d)))
          .select(col("doc_id"),
            col("features").getField("n_bytes").as("n_bytes"),
            col("features").getField("header_hex").as("header_hex"),
            col("features").getField("digest").as("digest"),
            col("features").getField("n_chunks").as("n_chunks"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  substr(hex(encode(text)), 1, 8) AS header_hex,
             |  md5(text) AS digest,
             |  CAST((octet_length(encode(text)) + 4095) // 4096 AS BIGINT) AS n_chunks
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
