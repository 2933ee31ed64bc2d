package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One named engine query plus its DuckDB oracle SQL (None ⇒ the driver
  * records a weaker rows-only check — used for approximate operators whose
  * output can't be reproduced by ANSI SQL).
  *
  * Every query is written to be fully deterministic: total ordering by a
  * unique key, exact (decimal-backed) aggregation of doubles, explicit
  * column aliases matching the oracle SQL exactly (the driver sorts columns
  * by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def defs: Seq[QueryDef]

  /** The DuckDB side of a replay-digest gate: fingerprint the corpus the
    * oracle was handed (`documents` view) and look up the digest the
    * committed Python replay recorded for EXACTLY that corpus. A corpus
    * with no recorded digest returns 0 rows — a loud mismatch, never a
    * silent pass.
    */
  protected final def replayDigestOracle(surface: String): String =
    s"""WITH corpus AS (
       |  SELECT md5(string_agg(CAST(doc_id AS VARCHAR) || CHR(9) || text,
       |                        CHR(10) ORDER BY doc_id)) AS cm
       |  FROM documents
       |)
       |SELECT d.digest
       |FROM read_csv('/root/repo/fixtures/replay_digests.csv', header=true) d,
       |     corpus c
       |WHERE d.surface = '$surface' AND d.corpus_md5 = c.cm""".stripMargin

  /** One-row md5 digest over `line` values in `key` order (newline-
    * joined, trailing newline) — the Spark side of a replay-digest gate
    * (round 20): signals DuckDB cannot recompute (trained BPE, deflate)
    * digest themselves this way and verify against
    * [[replayDigestOracle]]'s lookup. One declarative aggregation
    * (struct-sorted collect_list), no driver collect; the buffer is
    * corpus-line-scale, which at gate scales is the same bound every
    * ordered Verify dump already pays.
    */
  protected final def orderedLineDigest(df: DataFrame, key: Seq[Column],
      line: Column): DataFrame =
    df.select(struct((key :+ line.as("_line")): _*).as("_kl"))
      .agg(md5(concat(
        array_join(
          transform(array_sort(collect_list(col("_kl"))),
            x => x.getField("_line")),
          "\n"),
        lit("\n")).cast("binary")).as("digest"))

  /** Land `segs` as single-file streaming-source segments
    * `<dir>/in/seg<i>.<ext>` with strictly increasing mtimes (so the
    * file source's oldest-first order assigns batch ids 0..n-1) — in
    * ONE Spark write: the segments union with a routing column and
    * write partitioned by it (hash-routing each segment to one task ⇒
    * exactly one file per segment dir), where the previous
    * per-segment `coalesce(1)` writes paid one job round-trip per
    * segment. Row order within a segment file is NOT part of the
    * contract (every consumer is order-free per batch).
    */
  protected final def landSegments(segs: Seq[DataFrame], dir: String,
      ext: String): Unit = {
    val tmp = s"$dir/_segtmp"
    val all = segs.zipWithIndex
      .map { case (s, i) => s.withColumn("_seg", lit(i)) }
      .reduce(_ unionByName _)
      .repartition(col("_seg"))
    val w = all.write.mode("overwrite").partitionBy("_seg")
    (ext match {
      case "json" => w.json(tmp)
      case "parquet" => w.parquet(tmp)
      case other => sys.error(s"landSegments: unsupported ext $other")
    }): Unit
    val t0 = System.currentTimeMillis() - 60000
    segs.indices.foreach { i =>
      val segDir = new java.io.File(s"$tmp/_seg=$i")
      val parts = segDir.listFiles()
        .filter(f => f.getName.endsWith(s".$ext") &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))
      require(parts.length == 1,
        s"landSegments: segment $i wrote ${parts.length} files (want 1); " +
          "empty fixture segment or routing drift")
      val part = parts.head
      val dst = new java.io.File(s"$dir/in/seg$i.$ext")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      require(dst.setLastModified(t0 + i * 10000))
    }
  }

  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  final def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
