package graft.util

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memoization with explicit lifecycle eviction.
  *
  * Why not a `WeakHashMap[SparkSession, _]`: the cached values here are
  * (or contain) DataFrames, and a DataFrame strongly references its
  * SparkSession through `QueryExecution` — so the map's values keep its
  * keys reachable and weak entries can NEVER be collected. A weak map
  * gives the lifecycle of a strong map while claiming otherwise.
  *
  * Instead, entries are held strongly and evicted by a `SparkListener`
  * when the owning application ends (`SparkContext.stop()`), which is the
  * point at which the cached plans become useless anyway. One listener is
  * registered per session on first use; in a long-lived multi-session JVM
  * dead sessions therefore release their plans instead of leaking.
  */
final class SessionCache[V] {

  private val entries = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[String, V]]()

  /** Get or compute the value for (session, key). `mk` may be evaluated
    * more than once under a rare same-key race (same contract as
    * `TrieMap.getOrElseUpdate`); both results are equivalent plans, one
    * wins.
    */
  def getOrElseUpdate(spark: SparkSession, key: String)(mk: => V): V = {
    val per = entries.computeIfAbsent(spark, s => {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          entries.remove(s): Unit
        }
      })
      scala.collection.concurrent.TrieMap.empty[String, V]
    })
    per.getOrElseUpdate(key, mk)
  }

  /** Visible for tests: number of sessions currently holding entries. */
  def sessionCount: Int = entries.size()
}
