package graft.util

import graft.SparkSpec

/** Pins the scale-adaptive staged-file width (r21): committed appends
  * derive their range-partition width from the batch's row count, so a
  * micro-batch stages one file (file hygiene — every staged file is
  * re-paid by the fingerprint read, the promote rename, and the next
  * compaction) while a backfill still encodes core-wide (the r20
  * parallel-encode win). End-to-end coverage of both regimes lives in
  * DedupSpec ("committed LSH append…") and SimilaritySpec (PQ/SQ8
  * lifecycles); this spec pins the width function itself.
  */
class CommittedAppendWidthSpec extends SparkSpec {

  test("outFilesFor: micro-batches stage one file, backfills cap at shuffle width") {
    val cap = spark.sessionState.conf.numShufflePartitions
    assert(CommittedAppend.outFilesFor(spark, 0L) == 1)
    assert(CommittedAppend.outFilesFor(spark, 1L) == 1)
    assert(CommittedAppend.outFilesFor(spark, 32768L) == 1)
    assert(CommittedAppend.outFilesFor(spark, 32769L) == math.min(2, cap))
    // a 1M-row backfill saturates the cap (the r20 measured regime:
    // 4.2x encode win from core-wide staging)
    assert(CommittedAppend.outFilesFor(spark, 1000000L) == cap)
  }

  test("outFilesFor: spark.graft.append.rowsPerStagedFile tunes the slice size") {
    val key = "spark.graft.append.rowsPerStagedFile"
    try {
      spark.conf.set(key, "100")
      assert(CommittedAppend.outFilesFor(spark, 100L) == 1)
      val cap = spark.sessionState.conf.numShufflePartitions
      assert(CommittedAppend.outFilesFor(spark, 250L) == math.min(3, cap))
    } finally spark.conf.unset(key)
  }
}
