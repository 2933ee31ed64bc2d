package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A scored event for the leaderboard (events table projection). */
case class Scored(event_type: String, event_id: Long, value: Double)

/** One leaderboard row: rank is 1-based within the event_type. */
case class Ranked(event_type: String, rank: Long, event_id: Long, value: Double)

/** Per-key top-k state. */
case class Board(rows: Seq[Scored])

/** Continuously-maintained top-k leaderboard (SURVEY C9 × C16): the
  * ARBITRARY-STATE face of top-k-per-key. State per key is the current
  * top-k (bounded: k rows, like the TopKPerKeyExec heap); each
  * microbatch merges its rows and re-emits the refreshed board (Update
  * mode). The merge — top-k of (state ∪ batch) under a total order — is
  * associative and commutative, so ANY batching of the input yields the
  * identical final board, and the batch face (one group call, empty
  * state) equals the streaming answer: the property the
  * `stream_leaderboard` gate hash-checks against the window oracle and
  * StreamingSpec checks across microbatch splits.
  */
object Leaderboard {

  def top(ds: Dataset[Scored], k: Int): Dataset[Ranked] = {
    implicit val rankedEnc = Encoders.product[Ranked]
    implicit val boardEnc = Encoders.product[Board]
    implicit val stringEnc = Encoders.STRING
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[Scored], state: GroupState[Board]) => {
          val merged = (state.getOption.map(_.rows).getOrElse(Seq.empty) ++ batch)
            .sortBy(s => (-s.value, s.event_id))
            .take(k)
          state.update(Board(merged))
          merged.iterator.zipWithIndex.map { case (s, i) =>
            Ranked(key, i + 1L, s.event_id, s.value)
          }
        })
  }

  def run(ds: Dataset[Scored], k: Int, queryName: String) =
    top(ds, k).toDF().writeStream
      .format("memory").queryName(queryName)
      .outputMode(OutputMode.Update()).start()
}
