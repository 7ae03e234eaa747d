package pystreamsspark.streams

import pystreamsspark.SparkSpec
import pystreamsspark.io.Tables

case class Li(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** The reference's primary usage pattern — a typed fluent pipeline —
  * over the real parquet test data, cross-checked against the
  * relational answer. */
class StreamOnDataSpec extends SparkSpec {

  test("typed Stream pipeline over lineitem matches the relational result") {
    val s = spark
    import s.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val ds = Tables.lineitem(s, sfDir)
      .select($"l_orderkey", $"l_quantity", $"l_returnflag").as[Li]

    val got = Stream(ds)
      .filter(_.l_quantity > 30.0)
      .groupByKey(_.l_returnflag)
      .countByKey()
      .collect().toMap

    val want = Tables.lineitem(s, sfDir)
      .filter($"l_quantity" > 30.0)
      .groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)

    // terminal aggregates agree with SQL aggregates
    val qty = Stream(ds).map(_.l_quantity)
    val sqlAgg = Tables.lineitem(s, sfDir)
      .agg(org.apache.spark.sql.functions.sum($"l_quantity"),
        org.apache.spark.sql.functions.max($"l_quantity"),
        org.apache.spark.sql.functions.count($"l_quantity"))
      .collect()(0)
    assert(math.abs(qty.sum - sqlAgg.getDouble(0)) < 1e-6)
    assert(qty.max === sqlAgg.getDouble(1))
    assert(qty.count() === sqlAgg.getLong(2))
  }
}
