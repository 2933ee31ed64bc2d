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

  test("UTF-8 codec: valid text decodes clean; malformed bytes flagged and repaired") {
    val ok = Multimodal.Utf8TextCodec.decode("héllo\nwörld".getBytes("UTF-8"))
    assert(ok.getBoolean(3) && ok.getLong(1) == 11L && ok.getLong(2) == 2L)
    // 0xC3 with no continuation byte = malformed UTF-8
    val bad = Multimodal.Utf8TextCodec.decode(Array[Byte]('a', 0xC3.toByte))
    assert(!bad.getBoolean(3))
    assert(bad.getLong(1) == 2L) // 'a' + U+FFFD replacement
  }
}
