package graft.util

import org.apache.spark.sql.DataFrame

/** Re-balance a frame whose SCAN under-parallelizes a compute-heavy
  * map: split count comes from the input's FILE LAYOUT, not from the
  * operator, so a compact corpus (one parquet split) runs a
  * hash-every-token or cosine-vs-broadcast map on ONE core no matter
  * how many exist — the r18 sf1 probes measured dedup_simhash's 20 M
  * token hashes (19 of 22 s) and the semantic-decontamination
  * train×bench scan serialized exactly this way. At real scale the
  * input has thousands of splits and a repartition would be a wasted
  * full shuffle — so widening is CONDITIONAL: only when the scan has
  * under half the cluster's parallelism. Round-robin (no key — Spark's
  * RoundRobinPartitioning locally sorts first, so retries are
  * deterministic); callers' results are partitioning-invariant maps or
  * aggregations, so output never moves.
  */
object Widen {

  def forHeavyMap(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
  }
}
