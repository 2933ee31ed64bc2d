package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Testdata schema-drift canary.
  *
  * The driver regenerates `/root/testdata` between rounds, and a silent
  * physical-type change (events.ts: TIMESTAMP(NANOS) → timestamp[us])
  * once took out every windowed/streaming gate at analysis time with no
  * direct diagnosis. This spec reads every TESTDATA.md table through the
  * engine's own loaders and asserts the canonical column→dtype map,
  * failing with a message that names the drifted column — so the next
  * drift costs one line of output, not a round.
  *
  * Columns with known generation variance (raw timestamps can arrive as
  * long nanos, timestamp[us]-NTZ, or UTC-adjusted timestamp) list every
  * accepted dtype; the loaders are required to normalize events.ts to
  * session-zone TimestampType regardless of which variant shipped.
  */
class SchemaCanarySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // raw timestamp columns: any of the observed testdata generations
  private val tsVariants: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> tsVariants, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> tsVariants),
    "events" -> Map(
      "event_id" -> Set(LongType), "ts" -> tsVariants,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType))
  )

  test("every testdata table matches its canonical schema (drift canary)") {
    val drift = Tables.names.flatMap { t =>
      val exp = expected(t)
      val got = Tables.load(spark, dir, t).schema
      val missing = exp.keySet -- got.fieldNames.toSet
      val extra = got.fieldNames.toSet -- exp.keySet
      val wrong = got.fields.toSeq.collect {
        case f if exp.get(f.name).exists(ok => !ok.contains(f.dataType)) =>
          s"$t.${f.name}: got ${f.dataType.simpleString}, accepted " +
            exp(f.name).map(_.simpleString).mkString("{", ", ", "}")
      }
      missing.map(c => s"$t.$c: MISSING from testdata") ++
        extra.map(c => s"$t.$c: NEW column not in canonical schema") ++ wrong
    }
    assert(drift.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT detected (driver regenerated parquet?):\n  " +
        drift.mkString("\n  "))
  }

  test("embedding dimensionality is pinned (the RHP oracle hardcodes it)") {
    // dedup_embedding_rhp's oracle regenerates the 120×dims hyperplane
    // table into SQL with dims = 64; a silent testdata regeneration at
    // another width would hash-mismatch with no obvious cause. Name it.
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dims = Tables.embeddings(spark, s"/root/testdata/sf$sf")
        .selectExpr("size(embedding) AS d").distinct().collect().map(_.getInt(0))
      assert(dims.toSeq == Seq(64),
        s"sf$sf embedding dims drifted to ${dims.mkString(",")} — " +
          "regenerate the rhpPlanesValuesSql dims in DedupPack")
    }
  }

  test("Tables.events normalizes ts to session-zone TimestampType at every sf") {
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dt = Tables.events(spark, s"/root/testdata/sf$sf")
        .schema("ts").dataType
      assert(dt == TimestampType,
        s"sf$sf events.ts normalized to ${dt.simpleString}, want timestamp")
    }
  }

  test("normalizeEventTs handles all three physical ts encodings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val micros = 1696118400000000L // 2023-10-01T00:00:00Z
    val fromLong = Tables.normalizeEventTs(
      Seq(micros * 1000L).toDF("ts")) // legacy nanos-as-long read
    val fromNtz = Tables.normalizeEventTs(
      Seq(micros).toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    val fromLtz = Tables.normalizeEventTs(
      Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts")))
    for ((df, src) <- Seq(fromLong -> "long-nanos", fromNtz -> "ntz",
        fromLtz -> "ltz")) {
      assert(df.schema("ts").dataType == TimestampType, src)
      val got = df.select(unix_micros(col("ts"))).head().getLong(0)
      assert(got == micros, s"$src: $got != $micros")
    }
  }
}
