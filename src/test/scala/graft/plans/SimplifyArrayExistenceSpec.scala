package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayExists, ArrayFilter}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The injected §4.4c optimizer rule: size(filter(arr,f)) > 0 must plan
  * as a short-circuiting exists, with identical results (three-valued
  * logic included).
  */
class SimplifyArrayExistenceSpec extends SparkSpec {

  import spark.implicits._

  private def optimized(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan

  // parquet-backed so ConvertToLocalRelation can't pre-evaluate the plan
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("size(filter(...)) > 0 rewrites to exists; filter disappears") {
    val df = emb.filter(size(filter(col("embedding"), x => x > 2.0f)) > 0)
      .select("vec_id")
    val exprs = optimized(df).collect { case n => n }
      .flatMap(_.expressions).flatMap(_.collect {
        case _: ArrayExists => "exists"
        case _: ArrayFilter => "filter"
      })
    assert(exprs.contains("exists"), optimized(df).treeString)
    assert(!exprs.contains("filter"), optimized(df).treeString)
    // result parity vs the explicit exists form
    val viaExists = emb.filter(exists(col("embedding"), x => x > 2.0f))
      .select("vec_id")
    assert(df.exceptAll(viaExists).count() == 0 &&
      viaExists.exceptAll(df).count() == 0)
  }

  test("= 0 form rewrites to NOT exists with identical null semantics") {
    val withNulls = emb.select(col("vec_id"),
      when(col("vec_id") % 3 === 0, lit(null)).otherwise(col("embedding")).as("arr"))
    val df = withNulls.select(col("vec_id"),
      (size(filter(col("arr"), x => x > 2.0f)) === 0).as("none_match"))
    assert(optimized(df).collect { case n => n }
      .flatMap(_.expressions).flatMap(_.collect {
        case _: ArrayExists => true
      }).nonEmpty, optimized(df).treeString)
    // null arrays stay NULL (non-legacy size semantics preserved)
    assert(df.filter(col("vec_id") % 3 === 0 && col("none_match").isNotNull)
      .count() == 0)
    val ref = withNulls.select(col("vec_id"),
      (!exists(col("arr"), x => x > 2.0f)).as("none_match"))
    assert(df.exceptAll(ref).count() == 0 && ref.exceptAll(df).count() == 0)
  }

  test("NULL-returning lambda: rewrite stays two-valued, rows are kept") {
    // Element predicate NULL for some elements (null struct-ish field) and
    // TRUE for none: filter DROPS the null-predicate element, so
    // size(filter) = 0 is TRUE. A three-valued exists would make
    // NOT(exists) NULL there — silently dropping the row from a WHERE.
    val dir = java.nio.file.Files.createTempDirectory("sae-null").toString
    Seq(
      (1L, Seq(Option("x"), Option("y"))),      // some TRUE
      (2L, Seq(Option.empty[String], Option("y"))), // NULL elem, no TRUE
      (3L, Seq(Option.empty[String], Option("x"))), // NULL elem + TRUE
      (4L, Seq.empty[Option[String]]))          // empty array
      .toDF("id", "vals").write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      v => v === "x"

    val zeroForm = t.filter(size(filter(col("vals"), pred)) === 0).select("id")
    // the rewrite fired: exists present, filter gone
    val exprs = optimized(zeroForm).collect { case n => n }
      .flatMap(_.expressions).flatMap(_.collect {
        case e: ArrayExists => e
      })
    assert(exprs.nonEmpty, optimized(zeroForm).treeString)
    assert(exprs.forall(!_.followThreeValuedLogic), optimized(zeroForm).treeString)
    assert(zeroForm.as[Long].collect().sorted.toSeq == Seq(2L, 4L))

    // > 0 form as a projected value: two-valued FALSE, never NULL
    val proj = t.select(col("id"), (size(filter(col("vals"), pred)) > 0).as("m"))
    assert(proj.filter(col("m").isNull).count() == 0)
    assert(proj.filter(col("m")).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
  }

  test("rewritten search predicate equals the unrewritten computation") {
    // the FHIR-token shape: membership over a coding-like array
    val data = Seq((1L, Seq("a", "b")), (2L, Seq("c")), (3L, Seq.empty[String]))
      .toDF("id", "codes")
    val viaSize = data.filter(size(filter(col("codes"), c => c === "c")) > 0)
      .select("id")
    val viaExists = data.filter(exists(col("codes"), c => c === "c"))
      .select("id")
    assert(viaSize.exceptAll(viaExists).count() == 0 &&
      viaExists.exceptAll(viaSize).count() == 0)
  }
}
