package graft.fhir

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MIME type inference (SURVEY A33 / C12), reproducing
  * /root/reference/scripts/assay.py:11-20,123-140:
  *
  * - file name = attachment.title, overridden by the URL's path when the
  *   URL is set and its path contains a '.'
  * - extension lookup: exact match first, then lower-cased (Python
  *   `mimetypes.guess_type` order), fallback `application/octet-stream`
  * - the reference's custom genomics extensions (.R/.maf/.bed/.bed5/.vcf/
  *   .sam/.yaml/.md/.markdown) plus the common built-ins its data hits.
  *
  * Pure Column expressions over a literal map — broadcast-free, codegen'd,
  * O(1) per row: the same plan shape at 100 rows or 100 TB.
  */
object Mime {

  private val Tsv = "text/tab-separated-values"

  /** Extension → MIME. Custom rows cite assay.py:11-20; the rest is the
    * standard `mimetypes` table subset this engine guarantees.
    */
  val table: Map[String, String] = Map(
    ".R" -> "text/x-r", ".r" -> "text/x-r",
    ".maf" -> Tsv, ".bed5" -> Tsv, ".bed" -> Tsv, ".vcf" -> Tsv, ".sam" -> Tsv,
    ".yaml" -> "text/yaml",
    ".md" -> "text/x-markdown", ".markdown" -> "text/x-markdown",
    ".txt" -> "text/plain", ".tsv" -> Tsv, ".csv" -> "text/csv",
    ".json" -> "application/json", ".xml" -> "text/xml",
    ".html" -> "text/html", ".htm" -> "text/html",
    ".pdf" -> "application/pdf", ".zip" -> "application/zip",
    ".png" -> "image/png", ".jpg" -> "image/jpeg", ".jpeg" -> "image/jpeg",
    ".gif" -> "image/gif", ".tif" -> "image/tiff", ".tiff" -> "image/tiff",
    ".svg" -> "image/svg+xml", ".bmp" -> "image/bmp",
    ".mp3" -> "audio/mpeg", ".wav" -> "audio/x-wav",
    ".mp4" -> "video/mp4", ".avi" -> "video/x-msvideo",
    ".dcm" -> "application/dicom")

  val Fallback = "application/octet-stream"

  /** The chosen file name: URL path if it contains a dot, else title
    * (assay.py:129-133). `parse_url(url, 'PATH')` matches Python
    * `urllib.parse.urlparse(url).path` (query/fragment excluded).
    */
  def fileName(title: Column, url: Column): Column = {
    val path = parse_url(url, lit("PATH"))
    when(url.isNotNull && path.contains("."), path).otherwise(title)
  }

  /** Infer the MIME type from title/url. */
  def infer(title: Column, url: Column): Column = {
    val fn = fileName(title, url)
    // last ".ext" with no '.' '/' inside — i.e. the extension of the last
    // path segment, empty when the segment has no dot (posixpath.splitext)
    val ext = regexp_extract(fn, "(\\.[^./]+)$", 1)
    val m = typedlit(table)
    coalesce(element_at(m, ext), element_at(m, lower(ext)), lit(Fallback))
  }
}
