package graft.functions

import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Sq8AdcSpec extends SparkSpec {

  private def score(lo: Array[Double], hi: Array[Double]) =
    GraftSqlShims.columnOf(Sq8AdcCosineExpr(
      UnresolvedAttribute("q"), UnresolvedAttribute("c"), lo, hi))

  test("matched dims score; ANY dimension mismatch nulls out (never a " +
      "plausible prefix cosine)") {
    import spark.implicits._
    val lo = Array(0.0, 0.0, 0.0)
    val hi = Array(1.0, 1.0, 1.0)
    // codes 255 decode to hi = 1.0 exactly -> cosine(q, [1,1,1])
    val df = Seq(
      (1L, Array(1.0, 1.0, 1.0), Array(255, 255, 255)), // exact match
      (2L, Array(1.0, 1.0, 1.0), Array(255, 255)),      // codes short
      (3L, Array(1.0, 1.0), Array(255, 255, 255))       // query short
    ).toDF("id", "q", "c").select(col("id"), score(lo, hi).as("s"))
      .orderBy("id").collect()
    assert(math.abs(df(0).getDouble(1) - 1.0) < 1e-12)
    assert(df(1).isNullAt(1), "codes/query mismatch scored a prefix")
    assert(df(2).isNullAt(1), "query/bounds mismatch scored a prefix")
    // bounds shorter than the (agreeing) vectors: also a wrong index
    import spark.implicits._
    val shortBounds = Seq((1L, Array(1.0, 1.0, 1.0), Array(255, 255, 255)))
      .toDF("id", "q", "c")
      .select(score(Array(0.0, 0.0), Array(1.0, 1.0)).as("s")).head()
    assert(shortBounds.isNullAt(0), "bounds mismatch scored a prefix")
  }

  test("null in, null out is preserved") {
    val out = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS q, " +
        "array(255, 255) AS c")
      .select(score(Array(0.0, 0.0), Array(1.0, 1.0)).as("s")).head()
    assert(out.isNullAt(0))
  }
}
