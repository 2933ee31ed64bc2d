package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Exactly-once batch APPENDS into a partitioned parquet layout, for
  * at-least-once schedulers (foreachBatch, retrying crons) that must be
  * able to call blindly — the shared machinery behind
  * [[graft.operators.Dedup.appendToLshIndexCommitted]] and
  * [[graft.operators.Similarity.appendToIvfIndexCommitted]].
  *
  * Caller contract: `stageWrites(stagingDir)` writes the batch's rows
  * DETERMINISTICALLY in mode(overwrite) under `stagingDir`, mirroring
  * the live tree's relative layout (e.g. `<stage>/cells/cell=X/…` for a
  * live `<root>/cells/cell=X/…`). Deterministic means a retry
  * regenerates row-equivalent files per position: fixed repartitioning
  * — `repartition(1)` or `repartition(col(partitionCol))` (hash routing
  * is stable, and AQE coalescing merges whole shuffle partitions so it
  * can never split one partition value across tasks).
  *
  * `run` then gives exactly-once from three pieces:
  *  1. a `_committed/batch-<id>` marker under the root — a fully landed
  *     batch short-circuits to a no-op (returns false);
  *  2. the deterministic staging above — a retry that finds no marker
  *     rewrites staging from scratch (overwrite), so partial staging is
  *     never promoted;
  *  3. promotion renames staged files to DETERMINISTIC live names
  *     (`batch-<id>-<i>.parquet`, files sorted by name within each dir)
  *     and SKIPS names already present — so a crash at ANY point
  *     (mid-staging, mid-promotion, before the marker) replays to the
  *     exact same live rows with none duplicated.
  *
  * The `_`-prefixed staging/marker dirs sit inside the root and are
  * invisible to readers (exact-subdir reads plus Hadoop's hidden-path
  * filter); nothing existing is rewritten.
  *
  * Promotion relies on atomic FILE rename (local FS, HDFS). Plain S3A
  * emulates rename as copy+delete — still convergent here (a retry
  * skips destinations that exist and re-stages the rest), but the
  * copy is O(file size); prefer an atomic-rename layer for large
  * segments on raw object storage.
  */
object CommittedAppend {

  def run(spark: SparkSession, root: String, batchId: Long)(
      stageWrites: String => Unit): Boolean = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$root/_committed/batch-$batchId")
    val stage = s"$root/_staging/batch=$batchId"
    val stagePath = new Path(stage)
    if (fs.exists(marker)) {
      // already committed — also clear any staging the crash window
      // between marker and cleanup left behind, so the in-flight signal
      // ([[assertNoInflight]]) cannot stick permanently
      if (fs.exists(stagePath)) { fs.delete(stagePath, true): Unit }
      return false
    }
    stageWrites(stage)
    if (fs.exists(stagePath)) promote(fs, batchId, stagePath, rootPath)
    fs.mkdirs(new Path(s"$root/_committed"))
    fs.create(marker, true).close()
    fs.delete(stagePath, true): Unit
    true
  }

  /** Refuse index MAINTENANCE while a committed append is in flight: a
    * compaction that folds a crashed-but-promoted batch's files away
    * BEFORE its retry re-commits would erase the skip-existing
    * promotion names, letting the retry land the batch a SECOND time.
    * The staging dir outlives every crash window until the marker is
    * written (and a committed retry clears leftovers), so its presence
    * IS the in-flight signal.
    */
  def assertNoInflight(fs: FileSystem, root: String): Unit = {
    val st = new Path(s"$root/_staging")
    if (fs.exists(st) && fs.listStatus(st).nonEmpty)
      throw new IllegalStateException(
        s"$root has in-flight committed append(s) under _staging — " +
          "retry them to completion before compacting")
  }

  private def promote(fs: FileSystem, batchId: Long, srcDir: Path,
      dstDir: Path): Unit = {
    val entries = fs.listStatus(srcDir)
    val files = entries.filter(_.isFile).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .sortBy(_.getName)
    if (files.nonEmpty) { fs.mkdirs(dstDir): Unit }
    files.zipWithIndex.foreach { case (src, i) =>
      val dst = new Path(dstDir, s"batch-$batchId-$i.parquet")
      if (fs.exists(dst)) { fs.delete(src, false): Unit }
      else if (!fs.rename(src, dst))
        throw new java.io.IOException(s"promote: rename $src -> $dst failed")
    }
    entries.filter(_.isDirectory).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .foreach(d => promote(fs, batchId, d, new Path(dstDir, d.getName)))
  }
}
