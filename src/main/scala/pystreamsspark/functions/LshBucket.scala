package pystreamsspark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-random-projection LSH bucket id over `planes` hyperplanes, as one
  * fused loop. Plane p's weight for dimension d is ±1 derived from
  * XXH64(d, seed = p) — deterministic, no stored model, any executor
  * recomputes it. Bucket = the `planes`-bit pattern of projection signs.
  */
case class LshBucket(child: Expression, planes: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 62, "planes must be in [1, 62]")
  override def prettyName: String = "lsh_bucket"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val acc = new Array[Double](planes)
    var d = 0
    while (d < n) {
      val x = v.getFloat(d).toDouble
      var p = 0
      while (p < planes) {
        if ((XXH64.hashLong(d, p) & 1L) == 0L) acc(p) += x else acc(p) -= x
        p += 1
      }
      d += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      bucket = (bucket << 1) | (if (acc(p) >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val p = ctx.freshName("p")
      val x = ctx.freshName("x"); val b = ctx.freshName("b")
      s"""
         |int $n = $a.numElements();
         |double[] $acc = new double[$planes];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $x = (double) $a.getFloat($d);
         |  for (int $p = 0; $p < $planes; $p++) {
         |    if (($xxh.hashLong((long) $d, (long) $p) & 1L) == 0L) $acc[$p] += $x;
         |    else $acc[$p] -= $x;
         |  }
         |}
         |long $b = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  $b = ($b << 1) | ($acc[$p] >= 0 ? 1L : 0L);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucket {
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) =
    ("lsh_bucket",
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      (es: Seq[Expression]) => LshBucket(es(0), es(1).eval().asInstanceOf[Int]))
}
