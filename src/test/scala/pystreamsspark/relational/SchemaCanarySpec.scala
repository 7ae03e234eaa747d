package pystreamsspark.relational

import org.apache.spark.sql.types._
import pystreamsspark.SparkSpec
import pystreamsspark.io.Tables

/** Schema-drift canary: loads every table through `Tables.load` at sf0.001
  * and asserts the POST-LOAD Spark schema (names + types) matches a pinned
  * expectation. The driver has silently remounted the test data before
  * (round 4: `events.ts` flipped from parquet TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS), which broke 40 query keys and 23 tests through one
  * loader). The next drift should fail THIS one obvious test, not 23
  * obscure ones.
  *
  * Note `events.ts` is pinned to TimestampType — that is the loader's
  * normalization contract (Tables.events) regardless of whether the file
  * stores ns-as-int64 or µs NTZ on disk.
  */
class SchemaCanarySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts pinned to TimestampType: the loader's normalization contract.
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  test("every table's post-load schema matches the pinned expectation") {
    Tables.tableNames.foreach { name =>
      val got = Tables.load(spark, sfDir, name).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      assert(got === want, s"schema drift detected in table '$name'")
    }
  }
}
