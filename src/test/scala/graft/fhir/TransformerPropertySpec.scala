package graft.fhir

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-style totality tests (SURVEY §5.2): transformers must accept
  * ANY record shape within the schema — every optional field present or
  * absent in any combination — without throwing, and their output
  * invariants must hold on all of them. Records are synthesized with
  * ScalaCheck generators under a fixed seed, materialized once as NDJSON
  * strings, and checked as whole-frame filters (violations == 0).
  */
class TransformerPropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val genCoding: Gen[String] = for {
    sys <- Gen.oneOf("\"http://x\"", "\" http://spaced\"", "\"a'b'c\"")
    code <- Gen.alphaNumStr.map(s => "\"c" + s.take(4) + "\"")
  } yield s"""{"system": $sys, "code": $code}"""

  private val genCC: Gen[String] =
    Gen.nonEmptyListOf(genCoding).map(cs =>
      s"""{"coding": [${cs.take(3).mkString(",")}]}""")

  test("encounter transformer is total over optional class/reason/reference") {
    val gen: Gen[String] = for {
      id <- Gen.uuid.map(_.toString.take(8))
      hasClass <- Gen.oneOf(true, false)
      cls <- genCC
      hasReason <- Gen.oneOf(true, false)
      hasRef <- Gen.oneOf(true, false)
      status <- Gen.oneOf("completed", "planned", "in-progress")
    } yield {
      val parts = Seq(
        Some(s""""resourceType": "Encounter", "id": "$id", "status": "$status""""),
        if (hasClass) Some(s""""class": $cls""") else None,
        if (hasReason) Some(""""reason": [{"use": [{"text": "x"}]}]""") else None,
        if (hasRef) Some(""""reference": [{"reference": "Condition/c1"}]""") else None
      ).flatten
      "{" + parts.mkString(", ") + "}"
    }
    val rows = sample(gen, 80)
    val df = spark.read.schema(FhirSchemas.encounter).json(rows.toDS())
    val out = Transformers.encounter(df).cache()
    assert(out.count() == rows.size) // total: no row lost, nothing threw
    // invariants: status constant; class never null; reasonReference
    // present iff reason present; top-level reference popped iff reason
    val bad = out.filter(
      col("status") =!= "finished" ||
        col("class").isNull ||
        (col("reason").isNotNull && col("reasonReference").isNull) ||
        (col("reason").isNull && col("reasonReference").isNotNull) ||
        (col("reason").isNotNull && col("reference").isNotNull))
    assert(bad.count() == 0)
  }

  test("specimen transformer is total over optional processing/collection") {
    val gen: Gen[String] = for {
      id <- Gen.uuid.map(_.toString.take(8))
      nProc <- Gen.choose(0, 3)
      procs <- Gen.listOfN(nProc, genCC)
      hasColl <- Gen.oneOf(true, false)
      collProc <- Gen.oneOf(true, false)
    } yield {
      val processing =
        if (nProc > 0)
          Some(s""""processing": [${procs.map(c => s"""{"method": $c}""").mkString(",")}]""")
        else None
      val coll =
        if (hasColl)
          Some(s""""collection": {${
            if (collProc) """"procedure": {"reference": "Procedure/p1"}, """ else ""
          }"bodySite": {"text": "site"}}""")
        else None
      val parts = Seq(Some(s""""resourceType": "Specimen", "id": "$id""""),
        processing, coll).flatten
      "{" + parts.mkString(", ") + "}"
    }
    val rows = sample(gen, 80)
    val df = spark.read.schema(FhirSchemas.specimen).json(rows.toDS())
    val out = Transformers.specimen(df).cache()
    assert(out.count() == rows.size)
    // every surviving processing element has procedure (renamed method);
    // collection survives with procedure dropped from the schema
    val bad = out.filter(
      exists(coalesce(col("processing"),
        array().cast(out.schema("processing").dataType)),
        p => p.getField("procedure").isNull))
    assert(bad.count() == 0)
    assert(!out.schema("collection").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("procedure"))
  }

  test("specimen last-wins order contract: file order within one file; two-file input pinned") {
    // The specimenDim ORDER CONTRACT (AssayPipeline.specimenDim): "last" is
    // monotonically_increasing_id order. For one NDJSON file that is file
    // order; across files it follows Spark's split planning (files sorted
    // by size DESCENDING, then packed) — no name-order guarantee. This
    // test pins both so a Spark behavior change is caught, not absorbed.
    def specLine(id: String, patient: String, pad: Int = 0): String =
      s"""{"resourceType": "Specimen", "id": "$id", "subject": {"reference": "Patient/$patient"}""" +
        (if (pad > 0) s""", "note": [{"text": "${"x" * pad}"}]""" else "") + "}"
    val dir = java.nio.file.Files.createTempDirectory("graft_twofile_spec")
    dir.toFile.deleteOnExit()
    // big file (listed FIRST by size-desc planning) holds Patient/A and
    // padding rows; small file holds the duplicate pointing at Patient/B
    java.nio.file.Files.write(dir.resolve("a.ndjson"),
      (specLine("sp-x", "A", pad = 4096) +: (1 to 8).map(i => specLine(s"sp-$i", s"P$i", pad = 512)))
        .mkString("\n").getBytes)
    java.nio.file.Files.write(dir.resolve("b.ndjson"),
      specLine("sp-x", "B").getBytes)
    val groups = Seq(("g-1", "Specimen/sp-x")).toDF("id", "ref")
      .select(col("id"), array(struct(struct(col("ref").as("reference")).as("entity"))).as("member"))
    // single file, duplicate id: the LAST line wins (reference dict semantics)
    val oneFile = dir.resolve("one.ndjson")
    java.nio.file.Files.write(oneFile,
      Seq(specLine("sp-x", "A"), specLine("sp-x", "B")).mkString("\n").getBytes)
    val single = spark.read.schema(FhirSchemas.specimen).json(oneFile.toString)
    assert(AssayPipeline.groupLinks(groups, single)
      .select("patient_ref").head.getString(0) == "Patient/B")
    // two files: size-desc planning puts the small file's row LAST → B wins.
    // If this assert ever flips, Spark's file ordering changed: revisit the
    // ORDER CONTRACT note on specimenDim.
    val multi = spark.read.schema(FhirSchemas.specimen)
      .json(s"$dir/a.ndjson", s"$dir/b.ndjson")
    assert(AssayPipeline.groupLinks(groups, multi)
      .select("patient_ref").head.getString(0) == "Patient/B")
  }

  test("mime inference is total (null title/url combinations included)") {
    val gen: Gen[(Option[String], Option[String])] = for {
      title <- Gen.option(Gen.oneOf("a.maf", "b.xyz", "noext", "c.TXT", "d.tar.gz"))
      url <- Gen.option(Gen.oneOf("https://x/y.csv", "https://x/plain",
        "https://x/a.b/c", "https://x/q.vcf?k=.pdf"))
    } yield (title, url)
    val rows = sample(gen, 100)
    val df = rows.toDF("title", "url")
    val out = df.select(Mime.infer(col("title"), col("url")).as("m")).cache()
    assert(out.count() == rows.size)
    assert(out.filter(col("m").isNull).count() == 0) // always resolves
    val allowed = Mime.table.values.toSet + Mime.Fallback
    val distinctVals = out.select("m").distinct().collect().map(_.getString(0))
    assert(distinctVals.forall(allowed.contains))
  }

  test("uuid5 structural properties on arbitrary strings") {
    val rows = sample(Gen.asciiPrintableStr.map(_.take(64)), 200).distinct
    val df = rows.toDF("name")
      .select(col("name"), call_function("uuid5_dns", col("name")).as("u"))
      .cache()
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    assert(df.filter(!col("u").rlike(re)).count() == 0)
    // injective on the sample (v5 collisions would need SHA-1 collisions)
    assert(df.select("u").distinct().count() == rows.size)
  }
}
