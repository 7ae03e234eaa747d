package pystreamsspark.relational

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec
import pystreamsspark.io.Tables

/** Specs for the round-5 scalar/semi-structured additions. The DuckDB
  * oracle does the exact value check per driver round; these pin the
  * semantics locally so a regression fails in `sbt test`.
  */
class SemiStructuredSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("variant round-trip reproduces the base columns exactly") {
    import spark.implicits._
    val got = ScalarQueries.qVariantExtract(spark, sfDir).collect()
    val want = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority".as("pri"))
      .agg(count(lit(1)).as("n"),
        Det.dsum($"o_totalprice").as("sum_price"),
        max($"o_orderstatus").as("max_tag"))
      .orderBy($"pri")
      .collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("xml round-trip reproduces the base columns exactly") {
    import spark.implicits._
    val got = ScalarQueries.qXmlExtract(spark, sfDir).collect()
    val want = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority".as("pri"), $"o_orderstatus".as("status"))
      .agg(count(lit(1)).as("n"),
        min($"o_orderkey").as("min_id"), max($"o_orderkey").as("max_id"))
      .orderBy($"pri", $"status")
      .collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("interp: present slots pass through; gaps are between their neighbors") {
    import spark.implicits._
    val out = TimeQueries.qInterp(spark, sfDir)
    // series of hourly max(value) for cross-checking pass-through rows
    val series = Tables.events(spark, sfDir)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(max($"value").as("v"))
    val joined = out.join(series, Seq("event_type", "hour"), "left").collect()
    assert(joined.nonEmpty)
    var interpolated = 0
    joined.foreach { r =>
      val filled = r.getAs[Boolean]("filled")
      val vOut = Option(r.getAs[java.lang.Double]("v_out"))
      val vRaw = Option(r.getAs[java.lang.Double]("v"))
      if (!filled) assert(vOut == vRaw) // pass-through must be bit-exact
      else if (vOut.isDefined) interpolated += 1
    }
    assert(interpolated > 0, "expected at least one interpolated gap")
    // every interpolated value lies within the series' global [min, max]
    val (lo, hi) = {
      val r = series.agg(min($"v"), max($"v")).head
      (r.getDouble(0), r.getDouble(1))
    }
    joined.filter(_.getAs[Boolean]("filled")).foreach { r =>
      Option(r.getAs[java.lang.Double]("v_out")).foreach { v =>
        assert(v >= lo && v <= hi)
      }
    }
  }
}
