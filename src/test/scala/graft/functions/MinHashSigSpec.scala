package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class MinHashSigSpec extends SparkSpec {

  test("fused minhash32 == the explode + min(hash(h,k)) aggregate form, bit for bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val numPerms = 32
    val fused = Dedup.minhashSignatures(docs, 3, numPerms)
    val exploded = docs
      .select(col("doc_id"), explode(Dedup.shingleHashes(col("text"), 3)).as("h"))
    val minCols = (0 until numPerms).map(k => min(hash(col("h"), lit(k))).as(s"_m$k"))
    val reference = exploded.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerms).map(k => col(s"_m$k")): _*).as("mh"))
    assert(fused.exceptAll(reference).count() == 0 &&
      reference.exceptAll(fused).count() == 0)
  }

  test("shingle-less docs are dropped, matching the aggregate formulation") {
    import spark.implicits._
    val docs = Seq((1L, "one two three four"), (2L, "too short")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, 3, 8).collect()
    assert(sigs.map(_.getLong(0)).toSet == Set(1L))
    assert(sigs.head.getSeq[Int](1).length == 8)
  }
}
