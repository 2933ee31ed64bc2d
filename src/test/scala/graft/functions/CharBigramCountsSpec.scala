package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CharBigramCountsSpec extends SparkSpec {

  test("fused counts equal the explode+groupBy formulation on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fused = docs
      .select(col("doc_id"),
        explode(call_function("char_bigram_counts", col("text"))).as("bc"))
      .select(col("doc_id"), col("bc.bigram").as("bigram"),
        col("bc.cnt").as("dcnt"))
    val exploded = docs
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 1)).as("i"))
      .select(col("doc_id"), expr("substr(text, i, 2)").as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("dcnt"))
    assert(fused.exceptAll(exploded).count() == 0 &&
      exploded.exceptAll(fused).count() == 0)
  }

  test("code-point semantics: surrogate pairs count as one character, like substr") {
    import spark.implicits._
    // "a😀b" = 3 characters (😀 is a surrogate pair) → bigrams "a😀", "😀b"
    val df = Seq((1L, "a😀b"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        call_function("char_bigram_counts", col("text")).as("bc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1))
      .toMap
    assert(got(1L).map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("a😀", 1L), ("😀b", 1L)))
    assert(got(2L).isEmpty && got(3L).isEmpty)
    // repeats accumulate into one struct
    val rep = Seq((9L, "aaaa")).toDF("doc_id", "text")
      .select(explode(call_function("char_bigram_counts", col("text"))).as("bc"))
      .select(col("bc.bigram"), col("bc.cnt")).head()
    assert(rep.getString(0) == "aa" && rep.getLong(1) == 3L)
  }
}
