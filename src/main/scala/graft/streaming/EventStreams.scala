package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exact.dsum

/** Event-time windowed aggregations (SURVEY C9) written once and used by
  * BOTH the batch pack (StreamPack, DuckDB-oracled) and Structured
  * Streaming (StreamingSpec drives them through MemoryStream) — the same
  * `window`/`session_window` expressions plan in either mode, which is the
  * point: the streaming path is the batch semantics plus watermark-driven
  * state eviction.
  *
  * Scale notes: windowed aggregation shuffles on (window, key) with
  * map-side partials; session windows keep per-key state bounded by the
  * watermark delay. At 100 TB/day the shuffle carries only per-window
  * partials, and late data past the watermark is dropped instead of
  * exploding state.
  */
object EventStreams {

  /** Tumbling windows: one window per event. */
  def tumblingAgg(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 3).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows: width/slide overlapping windows per event. */
  def slidingAgg(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Per-user session windows with an inactivity gap. */
  def sessionAgg(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 3).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("sum_value"))

  /** Stateful dedup bounded by the watermark (C9). Spark restricts
    * dropDuplicatesWithinWatermark to streaming plans, so the batch face
    * of the same operator is its documented analog dropDuplicates — the
    * semantics coincide whenever duplicates arrive within the watermark.
    */
  def dedupWithinWatermark(stream: DataFrame, delay: String = "30 minutes"): DataFrame =
    if (stream.isStreaming)
      stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")
    else stream.dropDuplicates("event_id")

  /** Stream-static enrichment join (the dimension-lookup shape every
    * event pipeline runs first): the unbounded event stream joins a
    * bounded dimension table, then aggregates per dimension attribute.
    * No broadcast HINT on the static side: Spark re-plans the join per
    * microbatch from the dim's size stats, so a dim that fits the
    * threshold rides as a broadcast hash table (the common enrich case —
    * stream side never shuffles) while an over-memory dim degrades to a
    * shuffled join instead of an executor OOM; a forced broadcast makes
    * that choice for ALL dim sizes, which is exactly the
    * 100 TB failure mode the dangling-refs audit had. State is only the
    * (tiny) per-segment aggregate. Identical semantics in batch mode
    * (StreamingSpec asserts stream == batch == oracle).
    */
  def enrichAgg(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(customers.select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 3).as("sum_value"))

  /** Stream-stream interval join: each click matched to same-user
    * purchases in the preceding `lookback`. Both sides carry watermarks,
    * and the join condition bounds event-time distance, so Spark can
    * evict join state — the pair of constraints that makes stream-stream
    * joins run with bounded memory at any throughput. Executes
    * identically in batch mode (spec asserts equality).
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      lookback: String = "10 minutes", delay: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", delay).alias("c")
    val p = purchases.withWatermark("ts", delay).alias("p")
    c.join(p, expr(
      s"""c.user_id = p.user_id AND
         |p.ts BETWEEN c.ts - INTERVAL $lookback AND c.ts""".stripMargin))
      .select(col("c.event_id").as("click_id"), col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("p.event_id").as("purchase_id"),
        col("p.ts").as("purchase_ts"), col("p.value").as("purchase_value"))
  }

  /** Streaming tumbling aggregation with watermark (late data dropped). */
  def streamingTumbling(stream: DataFrame, width: String = "10 minutes",
      delay: String = "30 minutes"): DataFrame =
    stream.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Windowed HyperLogLog registers over the event stream — live
    * distinct-users-per-window with BOUNDED state. The register table
    * ((window, bucket) → max rho) is ONE `max` aggregation, exactly the
    * stateful shape Structured Streaming supports: per window the state
    * is ≤ 4096 register rows REGARDLESS of event volume (a billion
    * events in a window still hold 4096 longs), the merge is
    * commutative+idempotent so retries and out-of-order arrival cannot
    * change a register, and the watermark evicts whole windows. The
    * estimate ([[graft.operators.Sketches.hllEstimate]]) is a query
    * over the register sink, not part of the stream — the standard
    * sketch-serving split. Works identically in batch mode (the
    * watermark is a no-op there), which is what the gate's oracle
    * replays.
    */
  def hllUserRegisters(events: DataFrame, width: String = "1 day",
      delay: String = "1 hour"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", delay)
             else events
    graft.operators.Sketches.hllRegisters(
      wm, window(col("ts"), width), col("user_id"))
  }

  /** Batch face of the windowed HLL: per-window estimated distinct
    * users next to the exact count (the accuracy-audit shape; the
    * streaming face cannot afford the exact column — that is the
    * sketch's reason to exist).
    */
  def hllUsersWindowed(events: DataFrame, width: String = "1 day"): DataFrame = {
    val est = graft.operators.Sketches
      .hllEstimate(hllUserRegisters(events, width))
      .select(col("grp.start").as("window_start"), col("hll_est"))
    val exact = events
      .groupBy(window(col("ts"), width).as("w"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .select(col("w.start").as("window_start"), col("n_exact"))
    est.join(exact, "window_start")
  }
}
