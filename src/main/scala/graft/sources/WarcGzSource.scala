package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `.warc.gz` as a FIRST-CLASS DataSource V2 format:
  * `spark.read.format("warcgz").load(path)` (short name via
  * DataSourceRegister). The same record-boundary splitting as
  * [[Warc.readGzSplits]] — byte-range splits, validated member sync,
  * member-start ownership — but planned INSIDE the source, which buys
  * what a function-style reader cannot:
  *
  *  - **column pruning reaches the reader**: project only
  *    (file, target_uri) and the scan's readSchema drops payload/body —
  *    the reader still inflates members (framing requires it) but never
  *    copies body bytes into rows or runs HTTP header extraction. At
  *    100 TB of crawl data, "count responses per host" stops shipping
  *    page bodies through the scan.
  *  - the split plan is the source's own `planInputPartitions` — one
  *    task per byte range, visible to AQE like any other scan.
  *
  * Options: `splitSize` (bytes, default 128 MB).
  */
class WarcGzSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warcgz"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcGzSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WarcGzTable(properties.asScala.toMap)
}

/** The overwrite commit protocol's visibility fence. Deferred truncation
  * (keep committed objects, delete the rest in `BatchWrite.commit`)
  * removed the truncated-but-not-rewritten window, but committed-task
  * objects are complete, valid members sitting in the LIVE destination —
  * without a fence, a glob read between task commit and job commit (or
  * after a driver death that skipped job commit) returns OLD + NEW
  * records mixed, a silent duplication. The fence is a `_committed`
  * manifest per directory listing the object names that constitute the
  * current generation:
  *
  *  - every reader (batch scan, micro-batch stream, readGzSplits)
  *    filters a directory's files to manifest-listed names when a
  *    manifest exists (directories never written by this sink have no
  *    manifest and list as before);
  *  - an overwrite job writes the NEW manifest first, then deletes the
  *    old generation — a crash between the two leaves stray old objects
  *    that readers ignore, never a mix and never an empty read;
  *  - an append job unions its committed names into the manifest;
  *  - each publication is a NEW versioned name `_committed.<epoch>`
  *    (epoch = previous max + 1) landing via create-temp + atomic
  *    rename; readers resolve the MAX epoch present. Nothing is ever
  *    deleted before its successor is visible — there is no instant at
  *    which a reader finds no manifest (the non-atomic delete-then-
  *    rename window of a single fixed name), and a crash at ANY point
  *    leaves the previous epoch fully readable. Superseded epochs are
  *    garbage-collected after the new one is published; a crash
  *    mid-cleanup leaves stale low-epoch manifests readers ignore. A
  *    reader that resolved an epoch the writer GC'd before the open
  *    retries by re-resolving (a deleted manifest implies a newer epoch
  *    is already visible — see `read`).
  *
  * A crashed job therefore needs NO repair step before reading: the
  * newest surviving manifest names the last committed generation. The
  * next successful overwrite clears any strays.
  *
  * Concurrency contract: SINGLE WRITER PER DIRECTORY (the standard
  * object-store table-sink assumption — concurrent jobs must serialize
  * through an external coordinator). Concurrent appends would each
  * read-modify-write the generation set and the loser's files, while
  * present on disk, would be absent from the surviving manifest; the
  * versioned names make the race detectable but not mergeable. (The
  * detection is an explicit existence probe on the target epoch before
  * the publishing rename — rename-to-existing behavior alone is
  * filesystem-dependent: HDFS fails it, local/POSIX silently
  * overwrites, so the probe is the portable best-effort tripwire.)
  */
private[sources] object WarcGzManifest {
  /** Versioned manifests are `s"$Prefix.<epoch>"`; a bare legacy
    * `_committed` (pre-versioning layout) reads as epoch 0, so any
    * versioned publication supersedes it.
    */
  val Prefix = "_committed"

  private def epochOf(name: String): Option[Long] =
    if (name == Prefix) Some(0L)
    else if (name.startsWith(Prefix + "."))
      scala.util.Try(name.drop(Prefix.length + 1).toLong).toOption
    else None

  /** Newest (max-epoch) manifest in `dir`, if any. */
  private def newest(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[(Long, Path)] = {
    val sts =
      try Option(fs.listStatus(dir)).getOrElse(Array.empty)
      catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
    val cands = sts.toSeq.filter(_.isFile)
      .flatMap(st => epochOf(st.getPath.getName).map(e => (e, st.getPath)))
    if (cands.isEmpty) None else Some(cands.maxBy(_._1))
  }

  /** Newest committed generation, if any. Resolve-then-open is two
    * steps, so a reader racing the single writer can resolve an epoch
    * that write() garbage-collects before the open — but a deleted
    * manifest implies its successor is already visible (GC runs only
    * after the new epoch is published), so on FileNotFoundException we
    * re-resolve and retry: each retry can only land on a strictly newer
    * epoch. Bounded purely as a corruption backstop; one retry per
    * concurrent publish is the steady-state worst case.
    */
  def read(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Option[Set[String]] = {
    var attempt = 0
    while (true) {
      newest(fs, dir) match {
        case None => return None
        case Some((_, mf)) =>
          try {
            val in = fs.open(mf)
            try return Some(scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().filter(_.nonEmpty).toSet)
            finally in.close()
          } catch {
            case e: java.io.FileNotFoundException =>
              attempt += 1
              if (attempt >= 8) throw e
          }
      }
    }
    None // unreachable
  }

  def write(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      names: Set[String]): Unit = {
    val epoch = newest(fs, dir).map(_._1 + 1).getOrElse(1L)
    val tmp = new Path(dir, s".$Prefix.$epoch.tmp")
    val out = fs.create(tmp, true)
    try out.write((names.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val mf = new Path(dir, s"$Prefix.$epoch")
    // best-effort tripwire: rename-to-existing detection is filesystem-
    // dependent (HDFS fails the rename; local/POSIX renameTo silently
    // overwrites), so probe the target epoch explicitly first — a hit
    // means another writer published this epoch between our listing and
    // now, a single-writer-contract violation worth failing loudly on
    // every filesystem.
    if (fs.exists(mf))
      sys.error(s"warcgz: manifest $mf already exists — concurrent " +
        "writer detected (single-writer contract violated)")
    if (!fs.rename(tmp, mf))
      sys.error(s"warcgz: could not publish manifest $mf " +
        "(single-writer contract violated?)")
    // GC superseded epochs only AFTER the successor is visible; each is
    // independently removable (readers always resolve the surviving max)
    try Option(fs.listStatus(dir)).getOrElse(Array.empty).foreach { st =>
      epochOf(st.getPath.getName).foreach { e =>
        if (e < epoch && st.isFile) fs.delete(st.getPath, false)
      }
    } catch { case _: java.io.IOException => () } // strays are harmless
  }

  /** Administrative VACUUM of a sink directory (the Delta-style
    * retention op): delete data objects NOT named by the current
    * committed generation (strays from crashed jobs — readers already
    * ignore them, this reclaims the bytes) and manifests below the
    * current epoch (stale, never resolved). A directory with NO manifest
    * is returned untouched — unmanaged data is not this sink's to
    * delete. Single-writer contract applies: do not vacuum concurrently
    * with a writer (a reader racing the vacuum is safe — the current
    * epoch and its objects are never touched).
    * Returns (data objects deleted, stale manifests deleted).
    */
  def vacuum(fs: org.apache.hadoop.fs.FileSystem, dir: Path): (Int, Int) =
    newest(fs, dir) match {
      case None => (0, 0)
      case Some((epoch, mf)) =>
        val committed = read(fs, dir).getOrElse(Set.empty)
        val sts = try Option(fs.listStatus(dir)).getOrElse(Array.empty)
          catch { case _: java.io.FileNotFoundException =>
            Array.empty[org.apache.hadoop.fs.FileStatus] }
        var objs = 0
        var mfs = 0
        sts.filter(_.isFile).foreach { st =>
          val name = st.getPath.getName
          epochOf(name) match {
            case Some(e) =>
              if (e < epoch && fs.delete(st.getPath, false)) mfs += 1
            case None =>
              if (name.endsWith(".warc.gz") && !committed.contains(name) &&
                  st.getPath != mf && fs.delete(st.getPath, false)) objs += 1
          }
        }
        (objs, mfs)
    }

  /** Filter listed files to each directory's committed generation (a
    * directory with no manifest passes through untouched).
    */
  def filter(fs: org.apache.hadoop.fs.FileSystem,
      files: Seq[org.apache.hadoop.fs.FileStatus])
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    files.groupBy(_.getPath.getParent).toSeq.sortBy(_._1.toString)
      .flatMap { case (dir, sts) =>
        read(fs, dir) match {
          case Some(names) => sts.filter(st => names.contains(st.getPath.getName))
          case None => sts
        }
      }
  }
}

object WarcGzSource {
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("rec_offset", LongType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("record_id", StringType),
    StructField("payload", BinaryType),
    StructField("body", BinaryType)))
}

private[sources] class WarcGzTable(properties: Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    s"warcgz(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = WarcGzSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcGzScanBuilder(
      options.getOrDefault("path", properties.getOrElse("path",
        sys.error("warcgz: no path"))),
      options.getLong("splitsize", 128L << 20))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new WarcGzWriteBuilder(
      info.options.getOrDefault("path", properties.getOrElse("path",
        sys.error("warcgz: no path"))),
      info.schema())
}

private[sources] class WarcGzScanBuilder(path: String, splitSize: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = WarcGzSource.Schema
  private var typeEquals: Option[String] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark hands the pruned projection; empty (count(*)) keeps zero cols
    required = requiredSchema
  }

  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    // accept warc_type = 'x': the reader then skips non-matching records
    // BEFORE row materialization (no body extraction, no row alloc for
    // warcinfo/request records when only responses are wanted). All
    // filters are returned as residual — Spark re-evaluates them, so
    // the pushdown is a pure skip optimization, never a correctness
    // dependency.
    typeEquals = filters.collectFirst {
      case org.apache.spark.sql.sources.EqualTo("warc_type", v: String) => v
    }
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    typeEquals.toArray.map(v =>
      org.apache.spark.sql.sources.EqualTo("warc_type", v))

  override def build(): Scan =
    new WarcGzScan(path, splitSize, required, typeEquals)
}

private[sources] class WarcGzScan(path: String, splitSize: Long,
    required: StructType, typeEquals: Option[String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"warcgz $path splitSize=$splitSize cols=${required.fieldNames.mkString(",")}" +
      typeEquals.fold("")(v => s" type=$v")
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val files = fs.globStatus(p)
    require(files != null && files.nonEmpty, s"warcgz: no files match $path")
    WarcGzManifest.filter(fs, files.toSeq.filter(_.isFile)).flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + splitSize - 1) / splitSize)
      (0L until n).map { i =>
        WarcGzPartition(st.getPath.toString, i * splitSize,
          math.min((i + 1) * splitSize, len), len)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    new WarcGzReaderFactory(
      new Warc.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration),
      required, typeEquals)
  }

  // ------------------------------------------------- streaming face

  /** Micro-batch streaming over ARRIVING archive files (crawl segments
    * land over time): the offset is the set of files already processed
    * (name + length — a file is immutable once landed, the
    * object-store contract), each micro-batch plans the splits of the
    * NEWLY seen files. Same reader, same sync/ownership machinery —
    * `spark.readStream.format("warcgz")` is the batch scan over a
    * growing file set with exactly-once file tracking.
    *
    * Scale contract, stated honestly: the offset carries the full
    * processed-file set and `latestOffset` re-lists the glob, so both
    * grow with TOTAL file count — fine for the
    * thousands-of-segments-per-crawl scale this targets, but a
    * years-long unbounded stream would want a lexicographic floor
    * (crawl segment names sort by date) compacted into the offset, the
    * same contract Spark's own FileStreamSource manages with its
    * maxFileAge log compaction.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcGzMicroBatchStream(path, splitSize, required, typeEquals)
}

private[sources] case class WarcGzOffset(files: Map[String, Long])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  // stable serialization: sorted name=len lines
  override def json(): String =
    files.toSeq.sortBy(_._1).map { case (f, l) => s"$f=$l" }.mkString("\n")
}

private[sources] object WarcGzOffset {
  def fromJson(s: String): WarcGzOffset =
    if (s.isEmpty) WarcGzOffset(Map.empty)
    else WarcGzOffset(s.split("\n").map { line =>
      val i = line.lastIndexOf('=')
      line.substring(0, i) -> line.substring(i + 1).toLong
    }.toMap)
}

private[sources] class WarcGzMicroBatchStream(path: String, splitSize: Long,
    required: StructType, typeEquals: Option[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def listFiles(): Map[String, Long] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(p)
    if (files == null) Map.empty
    else WarcGzManifest.filter(fs, files.toSeq.filter(_.isFile))
      .map(st => st.getPath.toString -> st.getLen).toMap
  }

  override def initialOffset(): Offset = WarcGzOffset(Map.empty)
  override def latestOffset(): Offset = WarcGzOffset(listFiles())
  override def deserializeOffset(json: String): Offset =
    WarcGzOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcGzOffset].files
    val now = end.asInstanceOf[WarcGzOffset].files
    // a file is processed exactly once, at the length it landed with
    // (immutable-object contract; a grown file would be a layout bug)
    now.toSeq.filterNot { case (f, _) => seen.contains(f) }
      .sortBy(_._1)
      .flatMap { case (file, len) =>
        val n = math.max(1L, (len + splitSize - 1) / splitSize)
        (0L until n).map { i =>
          WarcGzPartition(file, i * splitSize,
            math.min((i + 1) * splitSize, len), len)
        }
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    new WarcGzReaderFactory(
      new Warc.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration),
      required, typeEquals)
  }
}

private[sources] case class WarcGzPartition(file: String, start: Long,
    end: Long, fileLen: Long) extends InputPartition

/** Write side: each task streams its rows as per-record gzip members
  * into ONE `.warc.gz` object under the target directory — the
  * object-store pattern. Commit protocol: object names embed the task
  * ATTEMPT id (partitionId + Spark's per-attempt taskId), so a retried
  * or speculated attempt writes a different object and can never clobber
  * or duplicate another attempt's; Spark's commit coordinator lets
  * exactly one attempt per partition commit, the losers' `abort()`
  * deletes their own object. Job-level overwrite truncation is deferred
  * to `BatchWrite.commit`: publish the new generation's [[WarcGzManifest]]
  * first, then delete the old objects — readers filter to the manifest,
  * so there is no window where the destination is truncated, half
  * written, or an OLD+NEW mix. Job-level `abort` deletes committed
  * objects (the manifest still names the old generation). Input schema
  * must be exactly (warc_type, target_uri, record_id, payload).
  */
private[sources] class WarcGzWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  // overwrite semantics: deferred to BatchWrite.commit — manifest
  // publish fences visibility, then the old generation is deleted
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }

  override def build(): org.apache.spark.sql.connector.write.Write = {
    val t = doTruncate
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new WarcGzBatchWrite(path, schema, t)
    }
  }
}

private[sources] class WarcGzBatchWrite(path: String, schema: StructType,
    truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  // Spark reconciles the input against the full table schema (absent
  // columns arrive as nulls); the writer needs these four — the others
  // (file, rec_offset, body) are derivative of the container and ignored
  private val needed = Seq("warc_type", "target_uri", "record_id", "payload")
  require(needed.forall(schema.fieldNames.contains),
    s"warcgz write needs columns $needed, got ${schema.fieldNames.toSeq}")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new Warc.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    fs.mkdirs(p)
    new WarcGzWriterFactory(path, conf, schema)
  }

  /** Commit protocol (see also the writer scaladoc below): tasks write
    * to attempt-unique object names and report them via [[WarcGzCommit]].
    * Job commit publishes the generation through the [[WarcGzManifest]]
    * visibility fence FIRST — overwrite: manifest := committed names;
    * append: manifest := existing ∪ committed (created on first append
    * too, so every sink-written directory is fenced) — and only THEN, on
    * overwrite, deletes the previous generation's objects. A job that
    * dies mid-write leaves the old manifest naming the old generation:
    * readers keep seeing exactly the last committed contents (the new
    * attempt objects are manifest-invisible), never an OLD+NEW mix and
    * never a truncated destination; a crash between manifest publish and
    * the deletes leaves invisible strays the next overwrite clears.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    val committed = messages.collect {
      // n == 0 tasks deleted their empty object — keep it off the manifest
      case m: WarcGzCommit if m.n > 0 => new Path(m.file).getName
    }.toSet
    val generation =
      if (truncate) committed
      else WarcGzManifest.read(fs, p).getOrElse {
        // first manifest over a legacy directory: adopt the existing
        // data files (they ARE the committed generation by assumption —
        // nothing else ever read them differently)
        Option(fs.listStatus(p)).getOrElse(Array.empty).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith(".") &&
            !st.getPath.getName.startsWith("_"))
          .map(_.getPath.getName).toSet
      } ++ committed
    WarcGzManifest.write(fs, p, generation)
    if (truncate) {
      Option(fs.listStatus(p)).getOrElse(Array.empty).foreach { st =>
        val name = st.getPath.getName
        // hidden files (checksum sidecars, markers) aren't data — the
        // standard Hadoop convention; deleting a kept object's .crc
        // would poison later checksummed reads
        if (st.isFile && !generation.contains(name) &&
          !name.startsWith(".") && !name.startsWith("_"))
          fs.delete(st.getPath, false)
      }
    }
  }

  /** Job abort deletes the objects that COMMITTED tasks produced
    * (messages holds one [[WarcGzCommit]] per committed task; slots for
    * tasks that never committed are null — their own
    * `DataWriter.abort()` already removed their attempt object).
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    messages.foreach {
      case m: WarcGzCommit => fs.delete(new Path(m.file), false)
      case _ => ()
    }
  }
}

private[sources] class WarcGzWriterFactory(path: String,
    conf: Warc.SerializableHadoopConf, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new WarcGzDataWriter(path, partitionId, taskId, conf, schema)
}

private[sources] case class WarcGzCommit(file: String, n: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class WarcGzDataWriter(dir: String, partitionId: Int,
    taskId: Long, conf: Warc.SerializableHadoopConf, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val file = new Path(dir,
    f"part-$partitionId%05d-$taskId.warc.gz")
  private val fs = file.getFileSystem(conf.value)
  private val out = fs.create(file, true)
  private var n = 0L

  private val iType = schema.fieldIndex("warc_type")
  private val iUri = schema.fieldIndex("target_uri")
  private val iId = schema.fieldIndex("record_id")
  private val iPayload = schema.fieldIndex("payload")

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(iType) && !row.isNullAt(iPayload),
      "warcgz write: warc_type and payload must be non-null")
    val rec = Warc.WarcRecord(
      row.getUTF8String(iType).toString,
      if (row.isNullAt(iUri)) "" else row.getUTF8String(iUri).toString,
      if (row.isNullAt(iId)) "" else row.getUTF8String(iId).toString,
      row.getBinary(iPayload))
    out.write(Warc.writeGz(Seq(rec)))
    n += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    // an empty partition leaves no object (object stores and glob
    // readers both prefer absence over zero-byte files)
    if (n == 0) fs.delete(file, false)
    WarcGzCommit(file.toString, n)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(file, false)
    ()
  }

  override def close(): Unit = ()
}

private[sources] class WarcGzReaderFactory(
    conf: Warc.SerializableHadoopConf, required: StructType,
    typeEquals: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcGzPartition]
    new WarcGzPartitionReader(p, conf, required, typeEquals)
  }
}

private[sources] class WarcGzPartitionReader(p: WarcGzPartition,
    conf: Warc.SerializableHadoopConf, required: StructType,
    typeEquals: Option[String])
    extends PartitionReader[InternalRow] {

  private val path = new Path(p.file)
  private val in = path.getFileSystem(conf.value).open(path)
  private val fileUtf8 = UTF8String.fromString(p.file)

  private val iter: Iterator[(Long, Warc.WarcRecord)] = {
    in.seek(p.start)
    def readN(n: Int): Array[Byte] = {
      val want = math.min(n.toLong, p.fileLen - in.getPos).toInt
      if (want <= 0) Array.emptyByteArray
      else { val buf = new Array[Byte](want); in.readFully(buf); buf }
    }
    val first = readN(math.toIntExact(math.min(p.end, p.fileLen) - p.start))
    Warc.splitRecords(first, p.start, p.end, p.fileLen, readN)
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    var found = false
    while (!found && iter.hasNext) {
      val (off, rec) = iter.next()
      // pushed warc_type filter: skip before any row materialization
      if (typeEquals.forall(_ == rec.warcType)) {
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          row.update(i, required.fields(i).name match {
            case "file" => fileUtf8
            case "rec_offset" => off
            case "warc_type" => UTF8String.fromString(rec.warcType)
            case "target_uri" => UTF8String.fromString(rec.targetUri)
            case "record_id" => UTF8String.fromString(rec.recordId)
            case "payload" => rec.payload
            case "body" =>
              if (rec.warcType == "response") Warc.httpBody(rec.payload)
              else rec.payload
          })
          i += 1
        }
        current = row
        found = true
      }
    }
    found
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
