package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** uuid5_dns must be bit-exact vs Python uuid.uuid5(NAMESPACE_DNS, name):
  * vectors pinned by tools/gen_fhir_fixtures.py (fixtures/fhir/
  * uuid5_vectors.csv) from the CPython implementation the reference calls
  * (/root/reference/scripts/assay.py:100).
  */
class Uuid5Spec extends SparkSpec {

  test("matches all pinned Python uuid5 vectors (incl. unicode, long names)") {
    val df = spark.read.option("header", "true")
      .csv("/root/repo/fixtures/fhir/uuid5_vectors.csv")
      .filter(col("name").isNotNull)
      .select(col("uuid"),
        call_function("uuid5_dns", col("name")).as("got"))
    val bad = df.filter(col("uuid") =!= col("got")).count()
    assert(bad == 0)
    assert(df.count() >= 15)
  }

  test("empty string matches RFC vector") {
    // python: uuid.uuid5(uuid.NAMESPACE_DNS, '') =
    //   4ebd0208-8328-5d69-8c44-ec50939c0967
    val got = spark.range(1)
      .select(call_function("uuid5_dns", lit("")).as("u"))
      .head().getString(0)
    assert(got == "4ebd0208-8328-5d69-8c44-ec50939c0967")
  }

  test("null propagates") {
    val got = spark.range(1)
      .select(call_function("uuid5_dns",
        lit(null).cast(org.apache.spark.sql.types.StringType)))
      .head()
    assert(got.isNullAt(0))
  }

  test("usable from SQL and deterministic (version/variant bits)") {
    val u = spark.sql("SELECT uuid5_dns('doc-042-assay') AS u").head().getString(0)
    assert(u.charAt(14) == '5')                    // version nibble
    assert("89ab".contains(u.charAt(19)))          // RFC variant nibble
    assert(u == spark.sql("SELECT uuid5_dns('doc-042-assay')").head().getString(0))
  }
}
