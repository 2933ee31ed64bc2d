package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable frequency sketches for corpus-scale counting (C4/C14).
  *
  * The count-min sketch here is DETERMINISTIC end to end — unusual for
  * a sketch, deliberate for this engine: the row hashes are md5-derived
  * (`('0x'||substr(md5(r||':'||token),1,15))` exactly as the DuckDB
  * oracle spells it) and the cells are INTEGER sums, so the sketch is
  * merge-order-free (addition commutes) and every cell — and every
  * point estimate — hash-checks against an exact SQL replay. The
  * approximation error is the usual CMS overestimate bound
  * (est ≥ true; est ≤ true + εN with prob. over the hash family), but
  * WHICH estimate you get is reproducible run to run, partition layout
  * to partition layout.
  */
object Sketches {

  /** (row, bucket) cell counts of a depth×width count-min sketch over
    * the whitespace tokens of `text`. One explode + one integer-sum
    * aggregate: the shuffle carries (depth·width) cells at most —
    * constant in corpus size, the whole point of sketching 100 TB.
    */
  def countMin(docs: DataFrame, text: Column, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth=$depth width=$width")
    val tok = docs.select(explode(split(text, " ")).as("t"))
    // ONE corpus pass: each token explodes to its depth cells inline
    // (a per-row union would rescan the corpus depth times)
    val cells = tok.select(explode(array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        (Dedup.hash60(concat(lit(s"$r:"), col("t"))) % width).as("bucket"))
    }: _*)).as("c"))
    cells.groupBy(col("c.r").as("r"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `words` against a [[countMin]] sketch:
    * est(w) = min over rows of cell(r, h_r(w)) — the standard CMS
    * query, still fully deterministic. Absent cells count 0.
    */
  def cmsEstimate(sketch: DataFrame, words: Seq[String], depth: Int = 4,
      width: Int = 1024): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val probes = words.toDF("word")
      .crossJoin(spark.range(depth).select(col("id").cast("int").as("r")))
      .select(col("word"), col("r"),
        (Dedup.hash60(concat(col("r").cast("string"), lit(":"),
          col("word"))) % width).as("bucket"))
    probes.join(sketch, Seq("r", "bucket"), "left")
      .groupBy("word")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
