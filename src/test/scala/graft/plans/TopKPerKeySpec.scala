package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TopK

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("native top-k matches the window row_number form") {
    val native = TopK.perKey(li,
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        3)
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber",
        "l_extendedprice")
    val w = Window.partitionBy("l_returnflag", "l_linestatus")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = li
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber",
        "l_extendedprice")
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty)
  }

  test("plan is the two-phase heap operator, not a Window sort") {
    val df = TopK.perKey(li, Seq(col("l_returnflag")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 5)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("partial phase bounds what the shuffle carries") {
    // 8 input partitions, 3 keys, k=2 ⇒ ≤ 48 rows enter the exchange
    val events = spark.range(0, 10000, 1, 8)
      .select(col("id"), (col("id") % 3).as("key"),
        (col("id") * 37 % 9973).as("score"))
    val out = TopK.perKey(events, Seq(col("key")),
      Seq(col("score").desc, col("id")), 2)
    assert(out.count() == 6)
    // ground truth via window on the same frame
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val expect = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    assert(out.exceptAll(expect).isEmpty)
  }

  test("ascending default and k larger than group size degrade gracefully") {
    val tiny = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val out = TopK.perKey(tiny, Seq(col("g")), Seq(col("v")), 10)
      .as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 3)))
  }

  test("RewriteWindowTopK: the window-filter-drop idiom plans as the heap operator") {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val idiom = li
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .drop("rn")
    idiom.write.format("noop").mode("overwrite").save()
    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(!plan.contains("Window"), plan)
    // row set matches the native API (same node, same semantics)
    val direct = TopK.perKey(li, Seq(col("l_returnflag")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 4)
      .select(idiom.columns.map(col): _*)
    assert(idiom.exceptAll(direct).isEmpty && direct.exceptAll(idiom).isEmpty)
  }

  test("null ordering values rank identically to the window form") {
    val data = Seq[(String, java.lang.Integer, Long)](
      ("a", 5, 1), ("a", null, 2), ("a", 3, 3), ("a", null, 4), ("a", 8, 5),
      ("b", null, 6), ("b", 1, 7))
      .toDF("g", "v", "id")
    for (ord <- Seq(col("v").asc, col("v").desc,
        col("v").asc_nulls_first, col("v").desc_nulls_last)) {
      val native = TopK.perKey(data, Seq(col("g")), Seq(ord, col("id")), 2)
      val w = Window.partitionBy("g").orderBy(ord, col("id"))
      val windowed = data.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
      assert(native.exceptAll(windowed).isEmpty &&
        windowed.exceptAll(native).isEmpty, s"ordering $ord")
    }
  }

  test("RewriteWindowTopK rank-preserving: kept rank plans as the heap " +
      "operator and matches the window form") {
    // tie-free ordering (unique key appended) so row_number is
    // deterministic and the two forms are value-identical
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val kept = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    // values (including the rank column) equal the un-rewritten window's:
    // rank() over the same TIE-FREE ordering computes the identical
    // column but is not matched by the rewrite, so it still plans as a
    // real Window — an in-engine oracle
    val noRewrite = li.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 4)
    assert(noRewrite.queryExecution.executedPlan.toString.contains("Window"))
    assert(kept.collect().map(_.toSeq).toSet ==
      noRewrite.collect().map(_.toSeq).toSet)
  }

  test("RewriteWindowTopK leaves rank()/dense_rank() windows alone") {
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_extendedprice").desc)
    val kept = li.withColumn("rk", rank().over(w)).filter(col("rk") <= 4)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("TopKPerKey"), plan.take(3000))
  }
}
