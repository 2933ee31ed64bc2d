package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** A keyed document for the dedup index: `h` is the content digest
  * (md5 of the text — engine-portable), `doc_id` the arrival key.
  */
case class KeyedDoc(h: String, doc_id: Long)

/** One dedup-index bucket: the canonical (minimum) doc_id for a digest
  * plus how many documents collapsed into it.
  */
case class DedupBucket(h: String, canonical: Long, n: Long)

/** Incrementally-maintained exact-dedup index (SURVEY C9 × C10): the
  * ONLINE face of `Dedup.exact*` — as documents stream in, each content
  * digest's bucket tracks its canonical representative and duplicate
  * count, so an ingest pipeline can route duplicates OUT of the corpus
  * the moment they arrive instead of re-running batch dedup per epoch.
  *
  * Same code path in both execution modes (the `stream_dedup_index` gate
  * runs it as a batch query; StreamingSpec drives the identical function
  * through MemoryStream): `mapGroupsWithState` in batch mode sees every
  * group once with empty state. The merge is order-free — canonical =
  * MIN(doc_id), count = running sum — so microbatch boundaries and
  * within-group iterator order cannot change the result, and the
  * streaming answer is bit-identical to the batch one.
  *
  * Scale: state is one (digest, long, long) row per DISTINCT document —
  * the minimum any exact dedup must remember — keyed by a 32-char digest
  * whose hash-partitioning spreads uniformly. No timeout: a dedup index
  * is permanent by design; a bounded-retention deployment would swap in
  * `ProcessingTimeTimeout` + TTL eviction, trading recall on ancient
  * duplicates for bounded state (the standard knob).
  */
object DedupIndex {

  def buckets(docs: Dataset[KeyedDoc]): Dataset[DedupBucket] = {
    implicit val bucketEnc = Encoders.product[DedupBucket]
    implicit val stringEnc = Encoders.STRING
    docs
      .groupByKey(_.h)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (h: String, batch: Iterator[KeyedDoc],
            state: org.apache.spark.sql.streaming.GroupState[DedupBucket]) => {
          var canonical = Long.MaxValue
          var n = 0L
          batch.foreach { d =>
            if (d.doc_id < canonical) canonical = d.doc_id
            n += 1
          }
          val merged = state.getOption match {
            case Some(prev) =>
              DedupBucket(h, math.min(prev.canonical, canonical), prev.n + n)
            case None => DedupBucket(h, canonical, n)
          }
          state.update(merged)
          merged
        })
  }

  /** Streaming runner (Update mode — a bucket re-emits whenever new
    * duplicates land on it; the sink keeps the latest row per digest).
    */
  def run(docs: Dataset[KeyedDoc], queryName: String) =
    buckets(docs).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
}
