package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def queriesOf(ids: Seq[Long], terms: Seq[Seq[String]]) =
    ids.zip(terms).toDF("query_id", "terms")
      .join(emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qvec")), "query_id")

  test("rrfFuse: a doc ranked first in BOTH legs outranks every single-leg doc") {
    val sparse = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 10L, 1L), (1L, 13L, 2L), (1L, 14L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(sparse, dense), k = 5)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect()
    assert(fused.head._3 == 10L, s"double-top doc must win: ${fused.toSeq}")
    assert(fused.head._4 == 2.0 / 61.0)
    // single-leg docs still surface (absent leg contributes 0)
    assert(fused.map(_._3).toSet == Set(10L, 11L, 12L, 13L, 14L))
    // equal-rrf ties (rank-2 of each leg: 1/62) break on doc_id
    val tied = fused.filter(_._4 == 1.0 / 62.0).map(_._3).toSeq
    assert(tied == tied.sorted, s"tie-break must be doc_id: $tied")
  }

  test("rrfFuse with one leg preserves that leg's order") {
    val leg = Seq((7L, 3L, 1L), (7L, 9L, 2L), (7L, 1L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(leg), k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(3L, 9L, 1L))
  }

  test("bm25PerQuery: single query agrees with bm25TopK rank-for-rank; native TopK plan") {
    val terms = Seq("hash", "join", "vector")
    val single = Retrieval.bm25PerQuery(docs,
      Seq((0L, terms)).toDF("query_id", "terms"), legK = 20)
    val reference = TextOps.bm25TopK(docs, terms, 20)
      .withColumn("rank", monotonically_increasing_id() + 1)
    val got = single.orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val want = reference.select("doc_id").as[Long].collect().toSeq
    assert(got == want, s"got=$got want=$want")
    // the per-query top-k goes through the native bounded-heap plan
    val plan = single.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan.take(2000))
  }

  test("hybridTopK: dense-only and sparse-only hits both surface; ranks are 1..k per query") {
    val q = queriesOf(Seq(0L, 1L),
      Seq(Seq("hash", "join", "vector"), Seq("scan", "filter", "batch")))
    val out = Retrieval.hybridTopK(docs, emb, q, k = 10, legK = 20).cache()
    val perQuery = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perQuery.forall { case (_, n, mx, mn) => n == 10 && mx == 10 && mn == 1 })
    // a hybrid hit list is genuinely hybrid on this fixture: it contains
    // docs the dense leg alone would never return and vice versa
    val sparse = Retrieval.bm25PerQuery(docs,
      q.select(col("query_id"), col("terms")), 20)
    val dense = Similarity.topKBruteForce(emb,
        q.select(col("query_id"), col("qvec")), 20)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    val sparseOnly = out.join(dense, Seq("query_id", "doc_id"), "left_anti")
    val denseOnly = out.join(sparse, Seq("query_id", "doc_id"), "left_anti")
    assert(sparseOnly.count() > 0 && denseOnly.count() > 0,
      "fixture should exercise both single-leg paths")
    out.unpersist()
  }
}
