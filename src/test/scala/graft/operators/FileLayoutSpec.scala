package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: Morton-value arithmetic plus the pruning property the
  * layout exists for — a multi-dimensional box predicate touches a strict
  * subset of the clustered files.
  */
class FileLayoutSpec extends SparkSpec {

  test("assignGlobalIds: dense 0..N-1 in order, range-count invariant") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
    val order = Seq(col("len").desc, col("doc_id"))
    val ids = Layout.assignGlobalIds(df, order)
    val n = df.count()
    // dense: exactly 0..N-1 once each
    assert(ids.select("gid").distinct().count() == n)
    assert(ids.agg(min("gid"), max("gid")).as[(Long, Long)].head()
      == ((0L, n - 1)))
    // order-tied: gid ascending == the total order
    val sorted = ids.orderBy("gid")
      .select(col("len"), col("doc_id")).as[(Int, Long)].collect()
    assert(sorted.sliding(2).forall {
      case Array((l1, d1), (l2, d2)) => l1 > l2 || (l1 == l2 && d1 < d2)
      case _ => true
    }, "gid order diverges from the requested total order")
    // the two-phase scan is range-count invariant
    val one = Layout.assignGlobalIds(df, order, nRanges = 1)
    val nine = Layout.assignGlobalIds(df, order, nRanges = 9)
    assert(one.exceptAll(nine).isEmpty && nine.exceptAll(one).isEmpty)
    graft.util.Scratch.release(spark)
  }

  test("interleaveBits round-robins bits across columns") {
    import spark.implicits._
    // a=0b11, b=0b01 → z bits (low→high): a0=1, b0=1, a1=1, b1=0 → 0b0111
    val z = Seq((3L, 1L)).toDF("a", "b")
      .select(Layout.interleaveBits(Seq(col("a"), col("b")), 2).as("z"))
      .head().getLong(0)
    assert(z == 7L)
    // single column degenerates to the identity on the masked bits
    val zid = Seq((5L, 0L)).toDF("a", "b")
      .select(Layout.interleaveBits(Seq(col("a")), 3).as("z"))
      .head().getLong(0)
    assert(zid == 5L)
  }

  test("z-curve locality: 2-D box touches a strict subset of clustered files") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "value")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_spec_zorder"
    Layout.clusterByZ(ev, Seq("user_id", "value"), 8, out)

    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())

    // per-file min/max envelopes via the input_file_name of each row
    val boxed = back
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("value").as("v_min"), max("value").as("v_max"))
      .collect()
    val total = boxed.length
    assert(total >= 6, s"expected ~8 files, got $total")
    // the gate's query box; a file can serve it only if both envelopes
    // intersect — z-ordering must leave some files entirely outside
    val touching = boxed.count { r =>
      r.getLong(1) >= 100L && r.getLong(0) <= 300L &&
        r.getDouble(3) >= 10.0 && r.getDouble(2) <= 40.0
    }
    assert(touching < total,
      s"box touches all $total files — no pruning possible")
  }
}
