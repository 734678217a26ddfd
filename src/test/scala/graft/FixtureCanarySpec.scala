package graft

import org.apache.spark.sql.types._

/** Fixture-drift canary (VERDICT r6 #9): round 6 lost 28 queries and 10
  * tests to a driver-side fixture regeneration that silently changed
  * `events.ts` from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS). This
  * spec pins the ENGINE-FACING dtype of every column of every table at
  * every SF, so the next upstream type change fails here first — one
  * loud, named assertion instead of a wave of analysis errors spread
  * across the registry.
  *
  * The events table is asserted twice: the RAW read must be one of the
  * three encodings [[graft.core.Tables]] knows how to normalize, and
  * the normalized read must present `ts: timestamp` to every consumer.
  */
class FixtureCanarySpec extends SparkSpec {

  private val SfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Engine-facing schema after [[graft.core.Tables]] normalization. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  test("every fixture table at every SF presents the pinned engine-facing schema") {
    for (dir <- SfDirs; (table, cols) <- expected) {
      val got = graft.core.Tables(spark, dir, table).schema
        .map(f => f.name -> f.dataType)
      assert(got == cols,
        s"FIXTURE DRIFT at $dir/$table.parquet — the driver regenerated " +
          s"fixtures with new types.\n  expected: $cols\n  got:      $got\n" +
          "If the new encoding is legitimate, teach Tables.apply to " +
          "normalize it and re-pin this canary.")
    }
  }

  test("raw events.ts is one of the encodings Tables.apply normalizes") {
    // nanosAsLong matches Tables.apply's read path, so a NANOS fixture
    // shows up here as LongType rather than an AnalysisException
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (dir <- SfDirs) {
      val raw = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      assert(Seq(LongType, TimestampNTZType, TimestampType).contains(raw),
        s"FIXTURE DRIFT: $dir/events.parquet ts read as $raw — " +
          "not an encoding graft.core.Tables knows; extend Tables.apply")
    }
  }
}
