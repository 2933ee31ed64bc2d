package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Bloom register epochs (`epoch=<id>` dirs of (word, bits) rows, see
  * [[graft.operators.Sketches.bloomBits]]) as DRIVER-READABLE state.
  *
  * The state is metadata-sized by construction — ≤ mBits/32 BIGINT rows
  * no matter how much history the filter has absorbed — yet reading it
  * through `spark.read` cost the admission pipelines a scan stage (and,
  * with the register folded for a map-side probe, a standalone collect
  * execution) in EVERY micro-batch. Epochs are therefore written as
  * DataFrame JSON (still one Spark job, riding the same publish
  * aggregation that produced the rows) and read back driver-side with no
  * job at all: [[read]] parses the part files' `{"word":w,"bits":b}`
  * lines directly (the MetaJson discipline, multi-row).
  *
  * Crash/replay semantics are untouched: an epoch is still an idempotent
  * whole-dir overwrite keyed by batch id, a batch still reads only epochs
  * strictly below its own id, and GC still keeps the previous epoch for
  * the crash window.
  */
object BloomState {

  /** The epoch's register rows, driver-side — (word, bits) with nulls
    * preserved as None (a null value hashes to null positions; the build
    * keeps that all-null row — the JSON writer spells it `{}` — and a
    * probe can never match it, exactly the old join-on-word semantics).
    * Output is bounded by mBits/32 rows (+1 for the null row) by
    * [[graft.operators.Sketches.bloomBits]]'s construction.
    */
  def read(fs: FileSystem, dir: String): Seq[(Option[Long], Option[Long])] = {
    val parts = fs.listStatus(new Path(dir)).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val field = """"(word|bits)"\s*:\s*(-?\d+)""".r
    parts.toSeq.flatMap { p =>
      val in = fs.open(p.getPath)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
        finally in.close()
      lines.iterator.filter(_.nonEmpty).map { line =>
        var word = Option.empty[Long]
        var bits = Option.empty[Long]
        field.findAllMatchIn(line).foreach { m =>
          if (m.group(1) == "word") word = Some(m.group(2).toLong)
          else bits = Some(m.group(2).toLong)
        }
        (word, bits)
      }.toSeq
    }
  }

  /** The rows of [[read]] as a dense word-indexed bits array (absent
    * words = 0 bits — the all-zeros semantics); null-word rows are
    * unreachable by any probe and are skipped.
    */
  def dense(rows: Seq[(Option[Long], Option[Long])], mBits: Int): Array[Long] = {
    val words = new Array[Long](mBits / 32)
    rows.foreach { case (w, b) =>
      w.foreach(i => words(i.toInt) = b.getOrElse(0L)) }
    words
  }
}
