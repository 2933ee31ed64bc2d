package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query plus its DuckDB oracle SQL (None ⇒ the driver
  * records a weaker rows-only check — used for approximate operators whose
  * output can't be reproduced by ANSI SQL).
  *
  * Every query is written to be fully deterministic: total ordering by a
  * unique key, exact (decimal-backed) aggregation of doubles, explicit
  * column aliases matching the oracle SQL exactly (the driver sorts columns
  * by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def defs: Seq[QueryDef]

  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  final def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
