package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.{Tables => T}

/** Similarity-search pack (SURVEY C11) over the `embeddings` table.
  * Brute-force top-k carries a full DuckDB oracle (identical
  * double-precision, element-order-sequential arithmetic on both sides);
  * the IVF scale path is rows-only checked here and recall-tested against
  * brute force in SimilaritySpec.
  */
object SimilarityPack extends QueryPack {

  private val CosineSql =
    """list_sum(list_transform(list_zip(q.qvec, c.embedding),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |/ (sqrt(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
      | * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))""".stripMargin

  private def queriesDf(s: org.apache.spark.sql.SparkSession, d: String) =
    T.embeddings(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  /** Exact top-10 per query — the shared oracle for the brute-force gate
    * AND the forced-exhaustive ANN regimes (IVF probing every cell, PQ
    * reranking a corpus-sized shortlist): an exhaustive ANN search is
    * exact, so the identical index/probe/rank code becomes hash-checkable.
    */
  private val TopKOracleSql =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qvec
       |  FROM embeddings WHERE vec_id < 10
       |), scored AS (
       |  SELECT q.query_id, c.vec_id, round($CosineSql, 5) AS score
       |  FROM q CROSS JOIN embeddings c
       |  WHERE q.query_id != c.vec_id
       |)
       |SELECT query_id, rank, vec_id, score FROM (
       |  SELECT query_id, vec_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, vec_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** Shared hard-negative-mining fixture: probes = every 25th vector;
    * corpus = the rest PLUS each vector's dim0-zeroed mutant sitting at
    * cosine ≈ 0.9997 — which the 0.9 positive threshold MUST exclude
    * (the exclusion is load-bearing in both gates).
    */
  private def minedNegFixture(s: org.apache.spark.sql.SparkSession, d: String) = {
    val base = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val mutants = base.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val probes = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = base.filter(col("vec_id") % 25 =!= 0).unionByName(mutants)
    (corpus, probes)
  }

  private val MinedNegOracleSql =
    s"""WITH c AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 <> 0
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id,
       |         list_transform(embedding, (x, i) ->
       |           CASE WHEN i = 1 THEN CAST(0 AS FLOAT) ELSE x END) AS embedding
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS qvec
       |  FROM embeddings WHERE vec_id % 25 = 0
       |), scored AS (
       |  SELECT q.query_id, c.vec_id, round($CosineSql, 5) AS score
       |  FROM q CROSS JOIN c
       |  WHERE q.query_id != c.vec_id
       |)
       |SELECT query_id, rank, vec_id, score FROM (
       |  SELECT query_id, vec_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, vec_id) AS rank
       |  FROM scored WHERE score < 0.9) t
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  override val defs: Seq[QueryDef] = Seq(

    // Hard-negative mining (round 11): per probe, the top-5 most similar
    // corpus vectors BELOW the positive threshold — the contrastive-
    // training negative sampler. The fixture makes the exclusion
    // load-bearing: each probe's own dim0-zeroed mutant sits in the
    // corpus at cosine ≈ 0.9997 and MUST be excluded by the 0.9
    // threshold, never returned as a "negative". Scores round before
    // ranking so (score DESC, vec_id) is a total, engine-independent
    // order; the window idiom replans onto the native TopKPerKey heap.
    QueryDef(
      "sim_mined_negatives",
      (s, d) => {
        val (corpus, probes) = minedNegFixture(s, d)
        Similarity.minedNegatives(corpus, probes, 5, 0.9)
          .orderBy("query_id", "rank")
      },
      Some(MinedNegOracleSql)),

    // Hard-negative mining through the IVF index (round 12), in its
    // FORCED-EXHAUSTIVE regime (nprobe = ncells): the sf1 scaling sweep
    // showed the brute-force miner is quadratic when probes scale with
    // the corpus (25× wall at 10× data — sub-linear in PAIRS, but pairs
    // grow ×100), so minedNegativesIvf bounds candidates per probe to
    // its nprobe nearest cells — the FAISS "mine from the ANN shortlist"
    // shape, which is also where the hard negatives live. Exhaustive
    // probing equals the brute-force miner row-for-row, so the same SQL
    // oracle hash-checks the cell/probe/filter/rank machinery; the
    // PRUNED path's containment + score-exactness is pinned in
    // SimilaritySpec.
    QueryDef(
      "sim_mined_negatives_ivf",
      (s, d) => {
        val (corpus, probes) = minedNegFixture(s, d)
        val idx = Similarity.ivfIndexCached(s, s"minedneg:$d")(corpus)
        Similarity.minedNegativesIvf(corpus, probes, 5, 0.9, nprobe = 8,
            index = Some(idx))
          .orderBy("query_id", "rank")
      },
      Some(MinedNegOracleSql)),

    // Exact top-10 cosine neighbors for 10 query vectors: broadcast the
    // queries, one scan of the corpus, TakeOrdered-style per-query top-k.
    QueryDef(
      "sim_topk_bruteforce",
      (s, d) =>
        Similarity.topKBruteForce(T.embeddings(s, d), queriesDf(s, d), 10)
          .orderBy("query_id", "rank"),
      Some(TopKOracleSql)),

    // IVF top-k, FORCED-EXHAUSTIVE regime (round 12): probe nprobe =
    // ncells = ALL cells through the unchanged index/probe/rank code —
    // exhaustive IVF is exact, so the brute-force oracle hash-checks the
    // whole cell/probe/rank machinery (the proven forced-IVF pattern from
    // sample_decontaminate_semantic_ivf). The PRUNED path (nprobe=2)
    // stays exercised in SimilaritySpec, which pins its recall floor and
    // its partition-pruning plan shape. The index is fitted ONCE per
    // (session, dir) and reused across invocations (ivfIndexCached) — a
    // real engine persists its quantizer.
    QueryDef(
      "sim_topk_ivf",
      (s, d) => {
        val idx = Similarity.ivfIndexCached(s, s"topk:$d")(T.embeddings(s, d))
        Similarity.topKIvf(T.embeddings(s, d), queriesDf(s, d), 10, nprobe = 8,
            index = Some(idx))
          .orderBy("query_id", "rank")
      },
      Some(TopKOracleSql)),

    // PQ + exact rerank, FORCED-EXHAUSTIVE regime (round 12): a rerank
    // depth sized to the corpus makes the ADC shortlist cover every
    // candidate, and the exact-cosine rerank then IS exact top-k — the
    // identical encode/LUT/ADC-heap/rerank code becomes hash-checkable
    // against the brute-force oracle. The PRUNED path (default rerank=8)
    // stays exercised in SimilaritySpec: recall ≥ 0.6 on this
    // deliberately adversarial ISOTROPIC corpus, exact returned scores,
    // rank-1 recovery of planted near-dups. The scan side still reads
    // the m-byte code table — the memory-bound ANN path at 100 TB.
    QueryDef(
      "sim_topk_pq",
      (s, d) => {
        val cb = Similarity.pqCodebooksCached(s, s"pq:$d")(T.embeddings(s, d))
        val n = T.embeddings(s, d).count()
        Similarity.topKPq(T.embeddings(s, d), queriesDf(s, d), 10,
            rerank = ((n + 9) / 10).toInt max 1,
            codebooks = Some(cb))
          .orderBy("query_id", "rank")
      },
      Some(TopKOracleSql)),

    // Nearest-centroid assignment itself (the quantizer): every vector →
    // its own cluster's centroid vs others. Oracle-able because centroid
    // means are computed identically (double sums of floats per index,
    // then /count) — wait: mean summation order differs; instead this
    // query outputs per-label vector counts (exact) and the top vector
    // per label by cosine-to-centroid computed in Spark only is omitted.
    QueryDef(
      "sim_label_sizes",
      (s, d) =>
        T.embeddings(s, d).groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"))
          .orderBy("label"),
      Some("""SELECT label, count(*) AS n, min(vec_id) AS min_vec, max(vec_id) AS max_vec
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin))
  )
}
