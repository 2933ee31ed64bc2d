package graft.fhir

import graft.SparkSpec

/** `_filter` parser unit tests; end-to-end semantics are hash-checked by
  * the search_filter_* driver gates against DuckDB.
  */
class FhirFilterSpec extends SparkSpec {

  import FhirFilter._

  test("precedence: and binds tighter than or") {
    val e = parse("""a eq 1 or b eq 2 and c eq 3""")
    assert(e == Or(Cmp("a", "eq", "1"), And(Cmp("b", "eq", "2"), Cmp("c", "eq", "3"))))
  }

  test("parentheses override precedence; not takes a parenthesized filter") {
    val e = parse("""not (a eq 1 or b eq 2) and c pr true""")
    assert(e == And(Not(Or(Cmp("a", "eq", "1"), Cmp("b", "eq", "2"))),
      Cmp("c", "pr", "true")))
  }

  test("quoted values may contain spaces and keywords") {
    val e = parse("""name eq "and or not" and gender eq male""")
    assert(e == And(Cmp("name", "eq", "and or not"), Cmp("gender", "eq", "male")))
  }

  test("malformed expressions are rejected") {
    intercept[IllegalArgumentException](parse("""a eq"""))          // truncated
    intercept[IllegalArgumentException](parse("""a eq 1 b eq 2""")) // trailing
    intercept[IllegalArgumentException](parse("""not a eq 1"""))    // not w/o parens
    intercept[IllegalArgumentException](parse("""a eq "unterminated"""))
  }

  test("compiled filter equals the equivalent plain-param search") {
    val eng = FhirSearch.overFixtures(spark, "/root/repo/fixtures/fhir")
    val viaFilter = eng.search(
      "Patient?_filter=gender eq \"male\" and active eq true").select("id")
    val viaParams = eng.search("Patient?gender=male&active=true").select("id")
    assert(viaFilter.exceptAll(viaParams).count() == 0 &&
      viaParams.exceptAll(viaFilter).count() == 0)
  }
}
