package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary media plumbing: schema, per-partition decode, deterministic features") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.withMediaColumn(docs)
    assert(media.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(media.repartition(4)).cache()
    assert(feats.count() == docs.count())
    // features must agree with the column-level ground truth
    val check = feats.join(docs, "doc_id")
      .withColumn("want_bytes", length(col("text")).cast("long"))
      .withColumn("want_digest", md5(col("text")))
      .filter(col("features.n_bytes") =!= col("want_bytes") ||
        col("features.digest") =!= col("want_digest"))
    assert(check.count() == 0)
    // partitioning must not change results
    val feats1 = Multimodal.extractFeatures(media.repartition(1))
    assert(feats.exceptAll(feats1).count() == 0)
  }
}
