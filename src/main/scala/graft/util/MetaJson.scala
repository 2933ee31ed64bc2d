package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** One-record JSON metadata directories (IVF centroids, PQ codebooks, SQ8
  * bounds) read and written DRIVER-SIDE, no Spark job. The record is
  * metadata-sized by contract (kilobytes — a quantizer, not data), yet the
  * DataFrame JSON path costs a job per write (the coalesce(1) sink) and
  * up to two per read (schema inference + head) — pure scheduler overhead
  * in every index-maintenance path that touches one per micro-batch
  * (committed appends read the quantizer per batch; refits write one per
  * generation).
  *
  * The on-disk layout matches the DataFrame JSON writer's — a directory
  * holding one `part-*.json` single-line file — so directories written by
  * either side read interchangeably: [[read]] accepts any pre-existing
  * Spark-written metadata dir, and `spark.read.json` still parses a
  * [[MetaJson]]-written one.
  *
  * Crash window: a torn [[write]] can leave a partial part file, exactly
  * like a torn DataFrame write can leave a partial stage — every caller
  * writes either a fresh index root (broken build, rebuilt wholesale) or
  * a refit stage that the recovery path rolls BACK while the sibling
  * codes/cells stage still exists (the stage ordering guarantees the
  * metadata write precedes any swap), so no torn file is ever promoted.
  */
object MetaJson {

  /** Write `{"<field>":"<value>"}` as `dir/part-00000.json`, replacing
    * any previous contents of `dir`.
    */
  def write(fs: FileSystem, dir: String, field: String, value: String): Unit = {
    val d = new Path(dir)
    fs.delete(d, true)
    fs.mkdirs(d)
    val out = fs.create(new Path(d, "part-00000.json"), true)
    try out.write(
      ("{\"" + escape(field) + "\":\"" + escape(value) + "\"}\n")
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read the single record's `field` value back from `dir` (either a
    * [[write]] layout or a Spark DataFrame JSON write — one data part
    * file holding one JSON line).
    */
  def read(fs: FileSystem, dir: String, field: String): String = {
    val parts = fs.listStatus(new Path(dir)).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    require(parts.length == 1,
      s"$dir: expected exactly one metadata part file, found ${parts.length}")
    val in = fs.open(parts.head.getPath)
    val line =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val key = "\"" + field + "\":\""
    val start = line.indexOf(key)
    require(start >= 0, s"$dir: no field '$field' in metadata record")
    unescape(line, start + key.length)
  }

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Decode the JSON string starting at `from` (just past the opening
    * quote) up to its closing quote.
    */
  private def unescape(line: String, from: Int): String = {
    val sb = new StringBuilder
    var i = from
    while (i < line.length && line.charAt(i) != '"') {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) {
        line.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' =>
            sb += Integer.parseInt(line.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    require(i < line.length, "unterminated JSON string in metadata record")
    sb.result()
  }
}
