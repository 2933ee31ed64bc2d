package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Throwaway profiling harness (kept out of CI paths by the `Scratch`
  * prefix convention): times sub-plans of the current optimization
  * target so fixes are measured, not guessed.
  */
class ScratchTimingSpec extends SparkSpec {

  private def timeIt[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  ignore("minhash-lsh stage breakdown at sf0.1") {
    val docs = Dedup.withMutants(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), col("text")))
    timeIt("signatures")(
      Dedup.minhashSignatures(docs, 3, 32).write.format("noop")
        .mode("overwrite").save())
    spark.catalog.clearCache()
    timeIt("candidates")(
      Dedup.lshCandidates(docs, 3, 32, 2).write.format("noop")
        .mode("overwrite").save())
    spark.catalog.clearCache()
    timeIt("full lshNearDups")(
      Dedup.lshNearDups(docs, 3, 0.5, 32, 2).write.format("noop")
        .mode("overwrite").save())
  }
}
