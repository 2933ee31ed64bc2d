package graft.fhir

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FhirSearchSpec extends SparkSpec {

  private lazy val eng = FhirSearch.overFixtures(spark, "/root/repo/fixtures/fhir")

  test("string :exact is case-sensitive full match; default prefix is case-insensitive") {
    assert(eng.search("Patient?name:exact=Family007").count() == 1)
    assert(eng.search("Patient?name:exact=family007").count() == 0)
    assert(eng.search("Patient?name=fAmIlY00").count() == 9) // 001..009
  }

  test("token search: bare code and system| forms") {
    val bare = eng.search("Encounter?class=AMB").count()
    val sys = eng.search(
      "Encounter?class=http://terminology.hl7.org/CodeSystem/v3-ActCode|").count()
    assert(bare > 0 && sys >= bare)
  }

  test("paging is a disjoint total-order partition of the result set") {
    val p1 = eng.search("Patient?_sort=birthdate&_count=25&_page=1").select("id")
    val p2 = eng.search("Patient?_sort=birthdate&_count=25&_page=2").select("id")
    assert(p1.count() == 25 && p2.count() == 15)
    assert(p1.intersect(p2).count() == 0)
  }

  test("_total matches count of unrestricted search") {
    val total = eng.search("Patient?gender=male&_total=accurate&_count=0")
      .head().getLong(0)
    assert(total == eng.search("Patient?gender=male").count())
  }

  test("unknown type and unknown param raise") {
    intercept[RuntimeException](eng.search("Observation?code=x"))
    intercept[RuntimeException](eng.search("Patient?nosuchparam=1"))
  }
}
