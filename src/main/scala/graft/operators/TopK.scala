package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}

import graft.plans.TopKPerKey

/** User-facing API for the native top-k-per-key operator
  * (`graft.plans.TopKPerKey` — custom logical node + strategy + two-phase
  * bounded-heap physical plan). Drop-in for the
  * `row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`
  * pattern when only the surviving ROWS are wanted (no rank column):
  * same row set, no per-partition full sort, and a shuffle that carries
  * at most k rows per key per input partition.
  *
  * `order` columns accept `.asc`/`.desc`; bare columns sort ascending.
  * Determinism: like the window form, ties at the k-boundary are
  * arbitrary — pass a total (unique-suffix) ordering for reproducible
  * output.
  */
object TopK {

  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    val sortOrders = order.map(GraftSqlShims.expressionOf(spark, _) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftSqlShims.ofRows(
      spark,
      TopKPerKey(keys.map(GraftSqlShims.expressionOf(spark, _)), sortOrders, k,
        df.queryExecution.analyzed))
  }
}
