package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSpec
import graft.operators.Similarity

class ArrayCosineSpec extends SparkSpec {

  private def hofCosine(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Similarity.dot(a, b) / (Similarity.norm(a) * Similarity.norm(b))

  test("bit-identical to the HOF formulation on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
      .select(
        call_function("array_cosine", col("a.embedding"), col("b.embedding")).as("fast"),
        hofCosine(col("a.embedding"), col("b.embedding")).as("ref"))
    // exact equality, not approximate: the fused loop sums in the same
    // element order, so every double is bit-identical
    assert(pairs.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("mixed float/double arrays widen like the HOF path") {
    val row = spark.sql(
      """SELECT array_cosine(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                    array(CAST(2.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(row - 1.0) < 1e-12)
  }

  test("null in, null out; self-similarity is 1") {
    val out = spark.sql(
      """SELECT array_cosine(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS n,
        |       array_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |                    array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS s""".stripMargin)
      .head()
    assert(out.isNullAt(0) && out.getDouble(1) == 1.0)
  }

  test("array_max_cosine skips NaN (zero-norm vectors) in EVERY position") {
    // a zero-norm vector yields 0/0 = NaN; the documented semantics skip
    // it whether it sits first, middle, or last — and all-NaN yields null
    val out = spark.sql(
      """SELECT
        |  array_max_cosine(array(array(0.0D, 0.0D), array(3.0D, 4.0D)), array(3.0D, 4.0D)) AS nan_first,
        |  array_max_cosine(array(array(3.0D, 4.0D), array(0.0D, 0.0D)), array(3.0D, 4.0D)) AS nan_last,
        |  array_max_cosine(array(array(0.0D, 0.0D)), array(3.0D, 4.0D)) AS all_nan,
        |  array_max_cosine(array(CAST(NULL AS ARRAY<DOUBLE>), array(3.0D, 4.0D)), array(3.0D, 4.0D)) AS null_skip""".stripMargin)
      .head()
    assert(out.getDouble(0) == 1.0, "NaN in first position must be skipped")
    assert(out.getDouble(1) == 1.0, "NaN in last position must be skipped")
    assert(out.isNullAt(2), "all-NaN must yield null")
    assert(out.getDouble(3) == 1.0, "null entries skipped")
  }

  test("stays inside whole-stage codegen (no interpreted HOF in the plan)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val df = e.select(call_function("array_cosine",
      col("embedding"), col("embedding")).cast(DoubleType).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(800)) // codegen stage marker
  }
}
