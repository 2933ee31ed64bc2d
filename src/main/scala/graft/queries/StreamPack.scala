package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}
import graft.streaming.EventStreams

/** Windowed event-time pack (SURVEY C9, batch face). The window semantics
  * are checked against DuckDB here; StreamingSpec proves the SAME
  * EventStreams functions produce identical results under Structured
  * Streaming with a MemoryStream + watermark.
  */
object StreamPack extends QueryPack {

  override val defs: Seq[QueryDef] = Seq(

    // Tumbling 10-minute windows (epoch-aligned, same as time_bucket).
    QueryDef(
      "stream_tumbling",
      (s, d) =>
        EventStreams.tumblingAgg(T.events(s, d))
          .orderBy("window_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
             |       event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(38,3))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Sliding 10-minute windows every 5 minutes: each event belongs to
    // exactly two windows (the two 5-min-grid starts covering it).
    QueryDef(
      "stream_sliding",
      (s, d) =>
        EventStreams.slidingAgg(T.events(s, d))
          .orderBy("window_start", "event_type"),
      Some("""WITH b AS (
             |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS b5, event_type FROM events
             |), w AS (
             |  SELECT b5 AS window_start, event_type FROM b
             |  UNION ALL
             |  SELECT b5 - INTERVAL '5 minutes', event_type FROM b
             |)
             |SELECT window_start, event_type, COUNT(*) AS n
             |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Per-user session windows, 6h inactivity gap (gaps-and-islands in the
    // oracle; session end = last event + gap, matching Spark's definition).
    QueryDef(
      "stream_session",
      (s, d) =>
        EventStreams.sessionAgg(T.events(s, d))
          .orderBy("user_id", "session_start"),
      Some("""WITH g AS (
             |  SELECT user_id, ts, value,
             |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                   > INTERVAL '6 hours' OR
             |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |), isl AS (
             |  SELECT user_id, ts, value,
             |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g
             |)
             |SELECT user_id, MIN(ts) AS session_start,
             |       MAX(ts) + INTERVAL '6 hours' AS session_end,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(38,3))) AS DOUBLE) AS sum_value
             |FROM isl GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // Stream-stream interval join, batch face: every click matched to
    // same-user purchases in the preceding 30 minutes. The SAME
    // clickPurchaseJoin runs under Structured Streaming in StreamingSpec
    // (watermarks + time-bound condition ⇒ bounded join state); here its
    // batch semantics are hash-checked against DuckDB.
    QueryDef(
      "stream_join",
      (s, d) => {
        val ev = T.events(s, d)
        EventStreams.clickPurchaseJoin(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"), "30 minutes")
          .orderBy("click_id", "purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, c.user_id AS user_id,
             |       c.ts AS click_ts, p.event_id AS purchase_id,
             |       p.ts AS purchase_ts, p.value AS purchase_value
             |FROM events c JOIN events p
             |  ON c.event_type = 'click' AND p.event_type = 'purchase'
             | AND c.user_id = p.user_id
             | AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
             |ORDER BY click_id, purchase_id""".stripMargin)),

    // Stateful dedup, batch face: a doubled input through the SAME
    // dedupWithinWatermark the streaming spec drives — batch mode planning
    // drops the watermark and dedups by key; duplicates are bit-identical
    // so the survivor set is deterministic.
    QueryDef(
      "stream_dedup",
      (s, d) => {
        val ev = T.events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
        EventStreams.dedupWithinWatermark(ev.unionByName(ev), "30 minutes")
          .orderBy("event_id")
      },
      Some("""SELECT DISTINCT event_id, ts, user_id, event_type, value
             |FROM events ORDER BY event_id""".stripMargin)),

    // Online exact-dedup index, batch face: the SAME mapGroupsWithState
    // function StreamingSpec drives through MemoryStream (batch mode =
    // every group once, empty state). Canonical = min(doc_id) — order-
    // free, so the streaming and batch answers are bit-identical and the
    // DuckDB oracle reproduces them.
    QueryDef(
      "stream_dedup_index",
      (s, d) => {
        import s.implicits._
        val keyed = T.documents(s, d)
          // same digest the batch exact-dedup gate keys on (50-char
          // prefix), so this index actually accumulates n>1 buckets
          .select(md5(substring(col("text"), 1, 50)).as("h"), col("doc_id"))
          .as[graft.streaming.KeyedDoc]
        graft.streaming.DedupIndex.buckets(keyed).toDF().orderBy("h")
      },
      Some("""SELECT md5(substr(text, 1, 50)) AS h, min(doc_id) AS canonical,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM documents GROUP BY 1 ORDER BY h""".stripMargin)),

    // Continuous top-k leaderboard, batch face: same flatMapGroupsWithState
    // function StreamingSpec drives through MemoryStream. The bounded
    // top-k merge is associative + commutative, so batching cannot change
    // the board and the window oracle reproduces it exactly.
    QueryDef(
      "stream_leaderboard",
      (s, d) => {
        import s.implicits._
        val scored = T.events(s, d)
          .select(col("event_type"), col("event_id"), col("value"))
          .as[graft.streaming.Scored]
        graft.streaming.Leaderboard.top(scored, 5).toDF()
          .orderBy("event_type", "rank")
      },
      Some("""SELECT event_type, rank, event_id, value FROM (
             |  SELECT event_type, event_id, value,
             |         CAST(row_number() OVER (PARTITION BY event_type
             |           ORDER BY value DESC, event_id) AS BIGINT) AS rank
             |  FROM events
             |)
             |WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin)),

    // Stream-static enrichment join, batch face: events enriched against
    // the (bounded) customer dimension, aggregated per market segment.
    // The SAME enrichAgg runs under Structured Streaming in StreamingSpec
    // — there the broadcast dim is re-planned per microbatch and only the
    // per-segment aggregate is state.
    QueryDef(
      "stream_enrich",
      (s, d) =>
        EventStreams.enrichAgg(T.events(s, d), T.customer(s, d))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(38,3))) AS DOUBLE) AS sum_value
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Crawl-quality monitor (round 15): the extraction+quality verdict
    // composed into the WARC ARRIVAL path — per-language doc/kept counts
    // + exact-decimal mean quality over the splittable warcgz source
    // with a broadcast (doc_id → lang) dimension. Batch face here
    // (oracle replays extraction output + quality formula + the decimal
    // mean from the documents table — valid because the ingestion gates
    // pin body == text byte-exactly); FilePipelineSpec drives the SAME
    // warcQualityByLang over readStream.format("warcgz") in complete
    // mode and pins stream == batch after EVERY landed segment.
    QueryDef(
      "stream_warc_quality",
      (s, d) =>
        graft.streaming.FilePipelines.warcQualityByLang(
            s.read.format("warcgz")
              .load(s"${TextPack.warcHtmlFixture(s, d)}/*.warc.gz"),
            T.documents(s, d).select(col("doc_id"), col("lang")))
          .orderBy("lang"),
      Some("""WITH x AS (
             |  SELECT doc_id, lang,
             |         'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
             |           || ' © 2026' AS clean_text
             |  FROM documents
             |), qw AS (
             |  SELECT doc_id, lang, string_split(lower(clean_text), ' ') AS w FROM x
             |), q AS (
             |  SELECT doc_id, lang,
             |    round(least(CAST(len(w) AS DOUBLE) / 200.0, 1.0) * 0.5
             |      + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3
             |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
             |              / len(w) * 5.0, 1.0) * 0.2, 6) AS quality
             |  FROM qw
             |)
             |SELECT lang, count(*) AS n_docs,
             |       count(*) FILTER (quality >= 0.5) AS n_kept,
             |       round(CAST(SUM(CAST(quality AS DECIMAL(38,15))) AS DOUBLE)
             |             / count(*), 6) AS mean_quality
             |FROM q GROUP BY lang ORDER BY lang""".stripMargin)),

    // Windowed HLL distinct users (round 13): the deterministic
    // HyperLogLog as STREAM STATE — per daily window the register table
    // ((window, bucket) → max rho) is one `max` aggregation with ≤4096
    // rows of state per window regardless of event volume; the estimate
    // is a query over the registers. Batch face here (estimate next to
    // the exact count); StreamingSpec drives the SAME hllUserRegisters
    // through MemoryStream with a watermark and pins stream registers ==
    // batch registers. The oracle replays hashing, registers and the
    // two-branch estimator per window.
    QueryDef(
      "stream_hll_users",
      (s, d) =>
        EventStreams.hllUsersWindowed(T.events(s, d))
          .orderBy("window_start"),
      Some("""WITH h AS (
             |  SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
             |         md5(CAST(user_id AS VARCHAR)) AS hex
             |  FROM events
             |), r AS (
             |  SELECT window_start,
             |    CAST(('0x' || substr(hex, 1, 3)) AS BIGINT) AS bucket,
             |    length(regexp_extract(substr(hex, 4, 12), '^0*', 0)) AS z0,
             |    substr(substr(hex, 4, 12),
             |      length(regexp_extract(substr(hex, 4, 12), '^0*', 0)) + 1, 1) AS fnz
             |  FROM h
             |), regs AS (
             |  SELECT window_start, bucket,
             |    max(z0*4 + CASE WHEN fnz = '' THEN 0
             |          WHEN fnz = '1' THEN 3
             |          WHEN fnz IN ('2','3') THEN 2
             |          WHEN fnz IN ('4','5','6','7') THEN 1
             |          ELSE 0 END + 1) AS reg
             |  FROM r GROUP BY window_start, bucket
             |), g AS (
             |  SELECT window_start, count(*) AS npresent,
             |         SUM(1::BIGINT << (49 - reg)) AS sp
             |  FROM regs GROUP BY window_start
             |), e AS (
             |  SELECT window_start,
             |    sp + (4096 - npresent) * (1::BIGINT << 49) AS sprime,
             |    4096 - npresent AS vzero
             |  FROM g
             |)
             |SELECT e.window_start,
             |  round(CASE WHEN (0.7213/(1.0 + 1.079/4096.0)*4096.0*4096.0*562949953421312.0)
             |                  / CAST(sprime AS DOUBLE) <= 10240.0 AND vzero > 0
             |        THEN 4096.0 * ln(4096.0 / CAST(vzero AS DOUBLE))
             |        ELSE (0.7213/(1.0 + 1.079/4096.0)*4096.0*4096.0*562949953421312.0)
             |             / CAST(sprime AS DOUBLE) END, 4) AS hll_est,
             |  x.n_exact
             |FROM e JOIN (
             |  SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
             |         count(DISTINCT user_id) AS n_exact
             |  FROM events GROUP BY 1) x USING (window_start)
             |ORDER BY e.window_start""".stripMargin)),

    // Cumulative Bloom novelty — the batch face of the streaming Bloom
    // ingest (FilePipelines.bloomNoveltyStream): docs arrive in ordered
    // segments, and each doc's verdict is "was this text in any STRICTLY
    // earlier segment" per the Bloom filter of those segments. Planted
    // fixture makes both boundary semantics load-bearing: exact dups of
    // segment-0 docs planted in segment 2 must read seen, while exact
    // dups planted in their OWN segment must read novel (a batch is
    // probed before its own bits land). md5 bit positions + bit_or
    // registers make every verdict SQL-replayable, so it hash-checks.
    QueryDef(
      "stream_bloom_novel",
      (s, d) => {
        import graft.operators.Dedup
        val base = T.documents(s, d)
        val src = base.select(col("doc_id"), col("text"),
            expr("doc_id div 100").as("segment"))
          .unionByName(base.filter(col("doc_id") < 50)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
              lit(2L).as("segment")))
          .unionByName(base.filter(col("doc_id") >= 100 && col("doc_id") < 120)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
              lit(1L).as("segment")))
        Dedup.bloomNovelBySegment(src, col("segment")).orderBy("doc_id")
      },
      Some("""WITH src AS (
             |  SELECT doc_id, doc_id // 100 AS segment, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, CAST(2 AS BIGINT), text FROM documents
             |  WHERE doc_id < 50
             |  UNION ALL
             |  SELECT doc_id + 2000000, CAST(1 AS BIGINT), text FROM documents
             |  WHERE doc_id >= 100 AND doc_id < 120
             |),
             |pos AS (
             |  SELECT doc_id, segment, j,
             |    (CAST(('0x' || substr(md5('bloom-' || CAST(j AS VARCHAR) || ':' || text),1,15)) AS BIGINT) % 32768) AS p
             |  FROM src CROSS JOIN range(4) r(j)
             |),
             |bits AS (
             |  SELECT segment, p // 32 AS word,
             |         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
             |  FROM pos GROUP BY 1, 2
             |),
             |hit AS (
             |  SELECT o.doc_id, o.segment, o.j,
             |    max(CASE WHEN (f.bits >> CAST(o.p % 32 AS INT)) & 1 = 1
             |             THEN 1 ELSE 0 END) AS h
             |  FROM pos o LEFT JOIN bits f
             |    ON f.word = o.p // 32 AND f.segment < o.segment
             |  GROUP BY 1, 2, 3
             |)
             |SELECT doc_id, segment, sum(h) = 4 AS seen
             |FROM hit GROUP BY 1, 2 ORDER BY doc_id""".stripMargin)),

    // Streaming incremental-ingest ADMISSION capstone (round 16): the
    // REAL foreachBatch pipeline (FilePipelines.ingestAdmissionStream)
    // runs inside the fixture — three NDJSON segments land in order
    // against a prebuilt history LSH index + Bloom epoch, and each
    // micro-batch gets (seen_exact, near_dup, admit) verdicts against
    // everything BEFORE it, with its admitted docs appended to the
    // index exactly-once (appendToLshIndexCommitted) so later segments
    // probe them. The oracle replays the SEQUENTIAL state growth: the
    // Bloom filter absorbs every earlier segment; the LSH index grows
    // by each earlier segment's ADMITTED set (adm0/adm1 CTEs — the
    // admission recursion unrolled). Planted outcomes all load-bearing:
    // seg-2 mutants of seg-0 docs near-dup ONLY IF batch 0's append
    // landed; seg-1/seg-2 verbatim copies of earlier-segment docs read
    // seen ONLY IF the Bloom epoch published; fresh docs admit.
    QueryDef(
      "stream_incremental_ingest",
      (s, d) => {
        import graft.operators.{Dedup, Sketches}
        val out = graft.util.TempFixtures.dir(s, "incr_ingest", d) { path =>
          val base = T.documents(s, d).select(col("doc_id"), col("text"))
          val hist = base.filter(col("doc_id") < 250)
          Dedup.writeLshIndex(hist, s"$path/idx",
            family = Dedup.ReplayableFamily)
          Sketches.bloomBits(hist, col("text"))
            .write.mode("overwrite").json(s"$path/bloom/epoch=-1")
          val segA = base.filter(col("doc_id") >= 250 && col("doc_id") < 300)
          val segB = base.filter(col("doc_id") >= 300 && col("doc_id") < 330)
            .unionByName(base
              .filter(col("doc_id") >= 250 && col("doc_id") < 260)
              .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
            .unionByName(Dedup.withMutants(
                base.filter(col("doc_id") >= 20 && col("doc_id") < 30))
              .filter(col("doc_id") >= 1000000L))
          val segC = base.filter(col("doc_id") >= 330 && col("doc_id") < 350)
            .unionByName(Dedup.withMutants(
                base.filter(col("doc_id") >= 260 && col("doc_id") < 265),
                2000000L)
              .filter(col("doc_id") >= 2000000L))
            .unionByName(base
              .filter(col("doc_id") >= 300 && col("doc_id") < 305)
              .select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
          // land one NDJSON file per segment with well-separated mtimes
          // so the file source's oldest-first order gives batch ids 0,1,2
          landSegments(Seq(segA, segB, segC), path, "json")
          graft.streaming.FilePipelines.ingestAdmissionStream(s,
              s"$path/in", s"$path/idx", s"$path/bloom", s"$path/out",
              s"$path/ckpt", family = Dedup.ReplayableFamily)
            .awaitTermination()
        }
        s.read.parquet(s"$out/out")
          .select(col("doc_id"), col("batch").cast("long").as("seg"),
            col("seen_exact"), col("near_dup"), col("best_jaccard"),
            col("admit"))
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text, -1 AS seg FROM documents WHERE doc_id < 250
             |  UNION ALL
             |  SELECT doc_id, text, 0 FROM documents
             |  WHERE doc_id >= 250 AND doc_id < 300
             |  UNION ALL
             |  SELECT doc_id, text, 1 FROM documents
             |  WHERE doc_id >= 300 AND doc_id < 330
             |  UNION ALL
             |  SELECT doc_id + 3000000, text, 1 FROM documents
             |  WHERE doc_id >= 250 AND doc_id < 260
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |         array_to_string(list_filter(string_split(text, ' '),
             |                                     (x, i) -> i % 10 != 0), ' '),
             |         1
             |  FROM documents WHERE doc_id >= 20 AND doc_id < 30
             |  UNION ALL
             |  SELECT doc_id, text, 2 FROM documents
             |  WHERE doc_id >= 330 AND doc_id < 350
             |  UNION ALL
             |  SELECT doc_id + 2000000,
             |         array_to_string(list_filter(string_split(text, ' '),
             |                                     (x, i) -> i % 10 != 0), ' '),
             |         2
             |  FROM documents WHERE doc_id >= 260 AND doc_id < 265
             |  UNION ALL
             |  SELECT doc_id + 4000000, text, 2 FROM documents
             |  WHERE doc_id >= 300 AND doc_id < 305
             |),
             |bpos AS (
             |  SELECT doc_id, seg, j,
             |    (CAST(('0x' || substr(md5('bloom-' || CAST(j AS VARCHAR) || ':' || text),1,15)) AS BIGINT) % 32768) AS p
             |  FROM corpus CROSS JOIN range(4) r(j)
             |),
             |fbits AS (SELECT DISTINCT seg, p FROM bpos),
             |hit AS (
             |  SELECT o.doc_id, o.seg, o.j,
             |    max(CASE WHEN f.p IS NOT NULL THEN 1 ELSE 0 END) AS h
             |  FROM bpos o LEFT JOIN fbits f ON f.p = o.p AND f.seg < o.seg
             |  WHERE o.seg >= 0
             |  GROUP BY 1, 2, 3
             |),
             |seen AS (SELECT doc_id, seg, sum(h) = 4 AS seen FROM hit GROUP BY 1, 2),
             |w AS (SELECT doc_id, string_split(text,' ') AS w FROM corpus),
             |tri AS (
             |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2],' ') AS s
             |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
             |        FROM w WHERE len(w) >= 3)
             |),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |         CAST(('0x' || substr(md5(s),1,15)) AS BIGINT) AS h
             |  FROM tri
             |),
             |perm AS (
             |  SELECT k,
             |    CAST(('0x' || substr(md5('mh-a-' || CAST(k AS VARCHAR)),1,15)) AS BIGINT) | 1 AS a,
             |    CAST(('0x' || substr(md5('mh-b-' || CAST(k AS VARCHAR)),1,15)) AS BIGINT) AS b
             |  FROM range(32) r(k)
             |),
             |sig AS (
             |  SELECT doc_id, k,
             |    min(CAST((CAST(a AS HUGEINT) * h + b) % 2305843009213693951 AS BIGINT)) AS v
             |  FROM sh, perm GROUP BY doc_id, k
             |),
             |bands AS (
             |  SELECT doc_id, CAST(k // 2 AS INT) AS band,
             |    CAST(min(CASE WHEN k % 2 = 0 THEN v END) AS VARCHAR) || ':' ||
             |    CAST(min(CASE WHEN k % 2 = 1 THEN v END) AS VARCHAR) AS bsig
             |  FROM sig GROUP BY doc_id, k // 2
             |),
             |cand AS (
             |  SELECT DISTINCT qc.doc_id AS q_id, ic.doc_id AS i_id,
             |                  qc.seg AS q_seg, ic.seg AS i_seg
             |  FROM bands qb JOIN bands ib
             |    ON qb.band = ib.band AND qb.bsig = ib.bsig
             |  JOIN corpus qc ON qc.doc_id = qb.doc_id
             |  JOIN corpus ic ON ic.doc_id = ib.doc_id
             |  WHERE qc.seg > ic.seg
             |),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT c.q_id, c.i_id, c.q_seg, c.i_seg, count(*) AS i
             |  FROM cand c
             |  JOIN sh a ON a.doc_id = c.q_id
             |  JOIN sh b ON b.doc_id = c.i_id AND b.h = a.h
             |  GROUP BY 1, 2, 3, 4
             |),
             |jp AS (
             |  SELECT q_id, i_id, q_seg, i_seg, i / (sq.n + si.n - i) AS jac
             |  FROM inter
             |  JOIN sz sq ON sq.doc_id = q_id
             |  JOIN sz si ON si.doc_id = i_id
             |  WHERE i / (sq.n + si.n - i) >= 0.5
             |),
             |adm0 AS (
             |  SELECT s.doc_id FROM seen s
             |  WHERE s.seg = 0 AND NOT s.seen
             |    AND NOT EXISTS (SELECT 1 FROM jp
             |                    WHERE jp.q_id = s.doc_id AND jp.i_seg = -1)
             |),
             |adm1 AS (
             |  SELECT s.doc_id FROM seen s
             |  WHERE s.seg = 1 AND NOT s.seen
             |    AND NOT EXISTS (
             |      SELECT 1 FROM jp
             |      WHERE jp.q_id = s.doc_id
             |        AND (jp.i_seg = -1
             |             OR jp.i_id IN (SELECT doc_id FROM adm0)))
             |),
             |idxmem AS (
             |  SELECT doc_id, -1 AS avail FROM corpus WHERE seg = -1
             |  UNION ALL SELECT doc_id, 0 FROM adm0
             |  UNION ALL SELECT doc_id, 1 FROM adm1
             |),
             |near AS (
             |  SELECT s.doc_id, round(max(jp.jac), 6) AS best_jaccard
             |  FROM seen s
             |  JOIN jp ON jp.q_id = s.doc_id
             |  JOIN idxmem m ON m.doc_id = jp.i_id AND m.avail < s.seg
             |  GROUP BY 1
             |)
             |SELECT s.doc_id, CAST(s.seg AS BIGINT) AS seg,
             |       s.seen AS seen_exact,
             |       near.best_jaccard IS NOT NULL AS near_dup,
             |       near.best_jaccard,
             |       (NOT s.seen AND near.best_jaccard IS NULL) AS admit
             |FROM seen s LEFT JOIN near ON near.doc_id = s.doc_id
             |ORDER BY s.doc_id""".stripMargin)),

    // Streaming partition-scoped MERGE (round 16): the "late facts
    // arrived for some days" pipeline as a STREAM — arriving event
    // segments upsert into a day-partitioned table through
    // mergeIntoPartitioned inside foreachBatch (only touched day
    // partitions rewrite; the whole-table last-wins rewrite is
    // stream_dedup's upsertBatch). Segment 2 REPLACES half of segment
    // 1's rows (value + 1000 — load-bearing: a merge that inserted
    // instead of replacing doubles those rows and fails the hash) and
    // inserts the rest; the oracle replays base ∪ inserts ∪ replaced.
    QueryDef(
      "stream_merge_upsert",
      (s, d) => {
        import graft.functions.Exact.dsum
        val out = graft.util.TempFixtures.dir(s, "stream_merge", d) { path =>
          val ev = T.events(s, d).select(col("event_id"), col("ts"),
              col("user_id"), col("event_type"), col("value"))
            .withColumn("day", to_date(col("ts")))
          ev.filter(col("event_id") % 3 =!= 0)
            .hint("rebalance", col("day")) // one file per day, not per (task, day)
            .write.mode("overwrite").partitionBy("day")
            .parquet(s"$path/table")
          val seg1 = ev.filter(col("event_id") % 3 === 0 &&
            col("event_id") % 2 === 0)
          val seg2 = ev.filter(col("event_id") % 3 === 0 &&
              col("event_id") % 2 =!= 0)
            .unionByName(seg1.withColumn("value", col("value") + 1000.0))
          landSegments(Seq(seg1, seg2), path, "parquet")
          graft.streaming.FilePipelines.mergeUpsertStream(s, s"$path/in",
              s"$path/table", s"$path/ckpt",
              seg1.schema, "event_id", "day")
            .awaitTermination()
        }
        s.read.parquet(s"$out/table")
          .groupBy(col("day"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 3).as("sum_value"))
          .orderBy("day", "event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type, value, CAST(ts AS DATE) AS day
             |  FROM events
             |),
             |final AS (
             |  SELECT event_type, value, day FROM ev WHERE event_id % 3 <> 0
             |  UNION ALL
             |  SELECT event_type, value, day FROM ev
             |  WHERE event_id % 3 = 0 AND event_id % 2 <> 0
             |  UNION ALL
             |  SELECT event_type, value + 1000.0, day FROM ev
             |  WHERE event_id % 3 = 0 AND event_id % 2 = 0
             |)
             |SELECT day, event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(38,3))) AS DOUBLE) AS sum_value
             |FROM final GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // CRAWL-ADMISSION capstone (round 16): the COMPOSED face a 100 TB
    // crawl pipeline runs end to end — raw .warc.gz segments arrive
    // through the engine's own splittable streaming source, each
    // micro-batch extracts response bodies, scores row-local quality
    // (rejects never reach the Bloom state or the index), and routes
    // survivors through the incremental-ingest admission (Bloom
    // seen-exact ∧ persisted-LSH near-dup → admit, admitted appended
    // exactly-once for later segments to probe). Planted outcomes all
    // load-bearing: junk docs in every segment vanish at the quality
    // gate (present rows would fail the hash), seg-C mutants of seg-A
    // docs near-dup only if batch 0's append landed, verbatim copies of
    // earlier segments read seen only if the Bloom epoch published. The
    // oracle replays quality filtering AND the sequential index growth.
    QueryDef(
      "stream_crawl_admission",
      (s, d) => {
        import s.implicits._
        import graft.operators.{Dedup, Sketches}
        val out = graft.util.TempFixtures.dir(s, "crawl_adm", d) { path =>
          val base = T.documents(s, d).select(col("doc_id"), col("text"))
          val hist = base.filter(col("doc_id") < 250)
          Dedup.writeLshIndex(hist, s"$path/idx",
            family = Dedup.ReplayableFamily)
          Sketches.bloomBits(hist, col("text"))
            .write.mode("overwrite").json(s"$path/bloom/epoch=-1")
          def junk(id: Long) = Seq((id, "zz zz zz zz")).toDF("doc_id", "text")
          val segA = base.filter(col("doc_id") >= 350 && col("doc_id") < 400)
            .unionByName(junk(9000001L))
          val segB = base.filter(col("doc_id") >= 400 && col("doc_id") < 430)
            .unionByName(base
              .filter(col("doc_id") >= 350 && col("doc_id") < 356)
              .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
            .unionByName(Dedup.withMutants(
                base.filter(col("doc_id") >= 40 && col("doc_id") < 46))
              .filter(col("doc_id") >= 1000000L))
            .unionByName(junk(9000002L))
          val segC = base.filter(col("doc_id") >= 430 && col("doc_id") < 450)
            .unionByName(Dedup.withMutants(
                base.filter(col("doc_id") >= 360 && col("doc_id") < 366),
                2000000L)
              .filter(col("doc_id") >= 2000000L))
            .unionByName(base.filter(col("doc_id") === 400)
              .select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
            .unionByName(junk(9000003L))
          val httpHdr = lit(
            "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
              .getBytes("US-ASCII"))
          val inDir = new java.io.File(s"$path/in")
          inDir.mkdirs()
          def land(seg: org.apache.spark.sql.DataFrame, i: Int): Unit = {
            val tmpSeg = s"$path/_segtmp$i"
            seg.repartition(1)
              .select(lit("response").as("warc_type"),
                concat(lit("http://example.org/doc/"), col("doc_id"))
                  .as("target_uri"),
                concat(lit("<urn:uuid:resp-"), col("doc_id"), lit(">"))
                  .as("record_id"),
                concat(httpHdr, encode(col("text"), "UTF-8")).as("payload"))
              .write.format("warcgz").mode("overwrite").save(tmpSeg)
            new java.io.File(tmpSeg).listFiles()
              .filter(_.getName.endsWith(".warc.gz")).zipWithIndex
              .foreach { case (f, j) =>
                // atomic placement: file stream sources assume it
                java.nio.file.Files.move(f.toPath,
                  new java.io.File(inDir, s"seg$i-$j.warc.gz").toPath,
                  java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              }
          }
          land(segA, 0)
          val q = graft.streaming.FilePipelines.crawlAdmissionStream(s,
            s"$path/in/*.warc.gz", s"$path/idx", s"$path/bloom",
            s"$path/out", s"$path/ckpt", minQuality = 0.3,
            family = Dedup.ReplayableFamily)
          try {
            q.processAllAvailable()
            land(segB, 1); q.processAllAvailable()
            land(segC, 2); q.processAllAvailable()
          } finally q.stop()
        }
        s.read.parquet(s"$out/out")
          .select(col("doc_id"), col("seen_exact"), col("near_dup"),
            col("best_jaccard"), col("admit"))
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (
             |  SELECT doc_id, text, -1 AS seg FROM documents WHERE doc_id < 250
             |  UNION ALL
             |  SELECT doc_id, text, 0 FROM documents
             |  WHERE doc_id >= 350 AND doc_id < 400
             |  UNION ALL SELECT 9000001, 'zz zz zz zz', 0
             |  UNION ALL
             |  SELECT doc_id, text, 1 FROM documents
             |  WHERE doc_id >= 400 AND doc_id < 430
             |  UNION ALL
             |  SELECT doc_id + 3000000, text, 1 FROM documents
             |  WHERE doc_id >= 350 AND doc_id < 356
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |         array_to_string(list_filter(string_split(text, ' '),
             |                                     (x, i) -> i % 10 != 0), ' '),
             |         1
             |  FROM documents WHERE doc_id >= 40 AND doc_id < 46
             |  UNION ALL SELECT 9000002, 'zz zz zz zz', 1
             |  UNION ALL
             |  SELECT doc_id, text, 2 FROM documents
             |  WHERE doc_id >= 430 AND doc_id < 450
             |  UNION ALL
             |  SELECT doc_id + 2000000,
             |         array_to_string(list_filter(string_split(text, ' '),
             |                                     (x, i) -> i % 10 != 0), ' '),
             |         2
             |  FROM documents WHERE doc_id >= 360 AND doc_id < 366
             |  UNION ALL
             |  SELECT doc_id + 4000000, text, 2 FROM documents
             |  WHERE doc_id = 400
             |  UNION ALL SELECT 9000003, 'zz zz zz zz', 2
             |),
             |qual AS (
             |  SELECT doc_id, seg, text,
             |    round(least(CAST(len(w) AS DOUBLE) / 200.0, 1.0) * 0.5
             |      + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.3
             |      + least(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
             |              / len(w) * 5.0, 1.0) * 0.2, 6) AS q
             |  FROM (SELECT doc_id, seg, text,
             |               string_split(lower(text), ' ') AS w FROM raw)
             |),
             |corpus AS (
             |  SELECT doc_id, text, seg FROM qual
             |  WHERE seg = -1 OR q >= 0.3
             |),
             |bpos AS (
             |  SELECT doc_id, seg, j,
             |    (CAST(('0x' || substr(md5('bloom-' || CAST(j AS VARCHAR) || ':' || text),1,15)) AS BIGINT) % 32768) AS p
             |  FROM corpus CROSS JOIN range(4) r(j)
             |),
             |fbits AS (SELECT DISTINCT seg, p FROM bpos),
             |hit AS (
             |  SELECT o.doc_id, o.seg, o.j,
             |    max(CASE WHEN f.p IS NOT NULL THEN 1 ELSE 0 END) AS h
             |  FROM bpos o LEFT JOIN fbits f ON f.p = o.p AND f.seg < o.seg
             |  WHERE o.seg >= 0
             |  GROUP BY 1, 2, 3
             |),
             |seen AS (SELECT doc_id, seg, sum(h) = 4 AS seen FROM hit GROUP BY 1, 2),
             |w AS (SELECT doc_id, string_split(text,' ') AS w FROM corpus),
             |tri AS (
             |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2],' ') AS s
             |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
             |        FROM w WHERE len(w) >= 3)
             |),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |         CAST(('0x' || substr(md5(s),1,15)) AS BIGINT) AS h
             |  FROM tri
             |),
             |perm AS (
             |  SELECT k,
             |    CAST(('0x' || substr(md5('mh-a-' || CAST(k AS VARCHAR)),1,15)) AS BIGINT) | 1 AS a,
             |    CAST(('0x' || substr(md5('mh-b-' || CAST(k AS VARCHAR)),1,15)) AS BIGINT) AS b
             |  FROM range(32) r(k)
             |),
             |sig AS (
             |  SELECT doc_id, k,
             |    min(CAST((CAST(a AS HUGEINT) * h + b) % 2305843009213693951 AS BIGINT)) AS v
             |  FROM sh, perm GROUP BY doc_id, k
             |),
             |bands AS (
             |  SELECT doc_id, CAST(k // 2 AS INT) AS band,
             |    CAST(min(CASE WHEN k % 2 = 0 THEN v END) AS VARCHAR) || ':' ||
             |    CAST(min(CASE WHEN k % 2 = 1 THEN v END) AS VARCHAR) AS bsig
             |  FROM sig GROUP BY doc_id, k // 2
             |),
             |cand AS (
             |  SELECT DISTINCT qc.doc_id AS q_id, ic.doc_id AS i_id,
             |                  qc.seg AS q_seg, ic.seg AS i_seg
             |  FROM bands qb JOIN bands ib
             |    ON qb.band = ib.band AND qb.bsig = ib.bsig
             |  JOIN corpus qc ON qc.doc_id = qb.doc_id
             |  JOIN corpus ic ON ic.doc_id = ib.doc_id
             |  WHERE qc.seg > ic.seg
             |),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT c.q_id, c.i_id, c.q_seg, c.i_seg, count(*) AS i
             |  FROM cand c
             |  JOIN sh a ON a.doc_id = c.q_id
             |  JOIN sh b ON b.doc_id = c.i_id AND b.h = a.h
             |  GROUP BY 1, 2, 3, 4
             |),
             |jp AS (
             |  SELECT q_id, i_id, q_seg, i_seg, i / (sq.n + si.n - i) AS jac
             |  FROM inter
             |  JOIN sz sq ON sq.doc_id = q_id
             |  JOIN sz si ON si.doc_id = i_id
             |  WHERE i / (sq.n + si.n - i) >= 0.5
             |),
             |adm0 AS (
             |  SELECT s.doc_id FROM seen s
             |  WHERE s.seg = 0 AND NOT s.seen
             |    AND NOT EXISTS (SELECT 1 FROM jp
             |                    WHERE jp.q_id = s.doc_id AND jp.i_seg = -1)
             |),
             |adm1 AS (
             |  SELECT s.doc_id FROM seen s
             |  WHERE s.seg = 1 AND NOT s.seen
             |    AND NOT EXISTS (
             |      SELECT 1 FROM jp
             |      WHERE jp.q_id = s.doc_id
             |        AND (jp.i_seg = -1
             |             OR jp.i_id IN (SELECT doc_id FROM adm0)))
             |),
             |idxmem AS (
             |  SELECT doc_id, -1 AS avail FROM corpus WHERE seg = -1
             |  UNION ALL SELECT doc_id, 0 FROM adm0
             |  UNION ALL SELECT doc_id, 1 FROM adm1
             |),
             |near AS (
             |  SELECT s.doc_id, round(max(jp.jac), 6) AS best_jaccard
             |  FROM seen s
             |  JOIN jp ON jp.q_id = s.doc_id
             |  JOIN idxmem m ON m.doc_id = jp.i_id AND m.avail < s.seg
             |  GROUP BY 1
             |)
             |SELECT s.doc_id, s.seen AS seen_exact,
             |       near.best_jaccard IS NOT NULL AS near_dup,
             |       near.best_jaccard,
             |       (NOT s.seen AND near.best_jaccard IS NULL) AS admit
             |FROM seen s LEFT JOIN near ON near.doc_id = s.doc_id
             |ORDER BY s.doc_id""".stripMargin))
  )
}
