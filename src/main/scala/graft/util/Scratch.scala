package graft.util

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for operator-internal ("scratch") cached frames whose
  * lifetime must outlive the operator call: some operators return a LAZY
  * plan that reads a frame the operator cached (e.g. [[graft.operators
  * .Similarity.semDeDup]]'s celled corpus, [[graft.operators.Graph
  * .pageRank]]'s degree-annotated edge list) — the cache fills during
  * the caller's action and cannot be unpersisted before it. The caller
  * holds only the result, not the internal frame, so `result.unpersist()`
  * cannot release it.
  *
  * This registry is that missing handle: every such cache is registered
  * here at creation, and a long-lived session composing several
  * operators calls [[release]] between pipelines to drop them all. The
  * contract is correctness-safe by construction — unpersisting a Spark
  * cache never invalidates a plan, it only makes the next action
  * recompute from lineage.
  *
  * Frames that do NOT need this registry: per-iteration state an
  * operator materializes and retires itself (k-means' corpus cache,
  * HyperBall's superseded register tables) — those are unpersisted
  * inside the operator, before it returns.
  *
  * Entries are evicted when the owning application ends (the
  * [[SessionCache]] lifecycle rationale: a weak map cannot work because
  * DataFrames strongly reference their session).
  */
object Scratch {

  private val reg = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.Queue[DataFrame]]()

  /** Cache `df` and register it for session-scoped release. Returns the
    * same (now cache-marked) frame.
    */
  def cached(df: DataFrame): DataFrame = {
    df.cache()
    register(df)
  }

  /** Register an ALREADY-cached frame (e.g. the surviving iteration
    * checkpoint of a loop that retired its predecessors itself) without
    * re-marking it — `cache()` on a cached frame logs a warning.
    */
  def register(df: DataFrame): DataFrame = {
    val q = reg.computeIfAbsent(df.sparkSession, s => {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          reg.remove(s): Unit
        }
      })
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    })
    q.add(df)
    val scope = activeScope.get().peek()
    if (scope != null) { scope.add(df): Unit }
    df
  }

  /** Unpersist every scratch frame registered for `spark` and forget
    * them. Safe at any point: plans referencing a released cache
    * recompute from lineage on their next action.
    */
  def release(spark: SparkSession): Unit = {
    val q = reg.get(spark)
    if (q != null) {
      var df = q.poll()
      while (df != null) { df.unpersist(); df = q.poll() }
    }
  }

  /** Number of scratch frames currently registered for `spark` —
    * the boundedness observable PersistenceSpec pins.
    */
  def outstanding(spark: SparkSession): Int = {
    val q = reg.get(spark)
    if (q == null) 0 else q.size()
  }

  /** Per-thread stack of open [[scoped]] collectors: registrations made
    * on a thread with an open scope are ALSO recorded in that scope, so
    * its release touches exactly the frames its own work registered —
    * never a concurrent pipeline's (a snapshot diff of the shared queue
    * could not tell the two apart).
    */
  private val activeScope =
    new ThreadLocal[java.util.ArrayDeque[java.util.List[DataFrame]]] {
      override def initialValue() =
        new java.util.ArrayDeque[java.util.List[DataFrame]]()
    }

  /** Run `f` and release ONLY the scratch frames registered by `f`'s own
    * thread — the per-unit-of-work discipline a long-lived driver loop
    * needs (e.g. a foreachBatch body that fully materializes its results
    * within the batch: every internal cache an operator registered
    * during the batch is garbage the moment the batch's sinks commit,
    * but a blanket [[release]] would also drop caches OTHER pipelines in
    * the session still rely on, and concurrent pipelines' registrations
    * must not be caught in this scope either). Scope-tracking is
    * thread-local; released even if `f` throws.
    */
  def scoped[A](spark: SparkSession)(f: => A): A = {
    val mine = new java.util.ArrayList[DataFrame]()
    activeScope.get().push(mine)
    try f
    finally {
      activeScope.get().pop(): Unit
      val q = reg.get(spark)
      mine.forEach { d =>
        d.unpersist()
        if (q != null) { q.remove(d): Unit }
      }
    }
  }
}
