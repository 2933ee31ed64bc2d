package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (SURVEY C11).
  *
  * - Brute-force top-k: broadcast the (small) query set against the vector
  *   corpus; one pass over the corpus, per-partition top-k via window —
  *   the exact baseline and the verification oracle.
  * - IVF (inverted-file) top-k: coarse-quantize the corpus by centroid
  *   (here the corpus' own `label` clustering; centroids are computed as
  *   per-label means — a tiny broadcastable table), probe only the
  *   `nprobe` nearest cells. At 100 TB this turns a full corpus scan per
  *   query into a scan of nprobe/ncells of it; the corpus can be
  *   physically partitioned by cell so probes prune partitions.
  *
  * All arithmetic is double-precision, element-order-sequential (HOF
  * `aggregate` over `zip_with`), so scores are engine-reproducible; ranks
  * tie-break on rounded score + vec_id to be robust to last-ulp noise.
  */
object Similarity {

  /** Sequential-order double dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector. `queries` is
    * expected to be small (it is broadcast); ranking is by score rounded
    * to `scale` decimals, ties by vec_id.
    */
  def topKBruteForce(corpus: DataFrame, queries: DataFrame, k: Int,
      scale: Int = 5): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("qvec"), col("embedding")), scale))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id"), col("score"))
  }

  /** Coarse quantizer for IVF: k-means over the corpus (deterministic
    * seed). Returns (corpus + `cell` column, tiny broadcastable centroid
    * table). At 100 TB the model is fit on a sample and the assignment is
    * one narrow map pass; the corpus can then be physically partitioned by
    * cell so probes prune partitions/files at scan time.
    */
  def ivfIndex(corpus: DataFrame, ncells: Int = 8,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = corpus.withColumn("_fv", array_to_vector(col("embedding")))
    val model = new KMeans().setK(ncells).setSeed(seed)
      .setFeaturesCol("_fv").setPredictionCol("cell").fit(feat)
    val assigned = model.transform(feat).drop("_fv")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq.toDF("cell", "centroid")
    (assigned, cents)
  }

  /** IVF top-k: assign each query to its `nprobe` nearest centroids, scan
    * only corpus rows in those cells. Approximate (recall < 1 when true
    * neighbors live outside probed cells) — pair with a recall test vs
    * [[topKBruteForce]].
    */
  def topKIvf(corpus: DataFrame, queries: DataFrame, k: Int,
      ncells: Int = 8, nprobe: Int = 2, scale: Int = 5): DataFrame = {
    val (assigned, cents) = ivfIndex(corpus, ncells)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("cell"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("cscore", cosine(col("qvec"), col("centroid")))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("qvec"), col("embedding")), scale))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id"), col("score"))
  }

  /** Embedding near-dup pairs (cosine ≥ threshold). Computed via a
    * dimension-exploded equi-join + hash aggregation instead of a lambda
    * cosine on a cross join: HOFs run interpreted (~60× slower than
    * codegen), while explode/join/agg is fully whole-stage-codegen'd.
    * The join is still all-pairs in the worst case — the scale path
    * pre-buckets by IVF cell ([[ivfIndex]]) so only same-cell pairs meet.
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double, scale: Int = 5): DataFrame = {
    val norms = corpus.select(col("vec_id"), norm(col("embedding")).as("nrm"))
    val elems = corpus.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"), col("x").cast(DoubleType).as("x"))
    // broadcast one exploded side: the dimension index has only ~64
    // distinct values, so a shuffled hash join would collapse onto 64
    // keys (no parallelism); a broadcast join streams the probe side
    // through every partition instead
    val dots = elems.as("a").join(broadcast(elems.as("b")),
        col("a.i") === col("b.i") && col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .agg(sum(col("a.x") * col("b.x")).as("dot"))
    dots
      .join(norms.select(col("vec_id").as("va"), col("nrm").as("na")), "va")
      .join(norms.select(col("vec_id").as("vb"), col("nrm").as("nb")), "vb")
      .withColumn("score", round(col("dot") / (col("na") * col("nb")), scale))
      .filter(col("score") >= threshold)
      .select(col("va"), col("vb"), col("score"))
  }
}
