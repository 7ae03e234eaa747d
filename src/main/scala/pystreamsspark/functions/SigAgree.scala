package pystreamsspark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `sig_agree(a, b)` — number of positions where two `array<long>`
  * MinHash signatures agree. `est_jaccard = sig_agree(a, b) / numHashes`
  * is the standard unbiased MinHash estimator (each position agrees with
  * probability J, independently across the hash family), so the
  * signature-verify dedup path (`Dedup.minHashLsh(verify="signature")`)
  * needs exactly this count per surviving candidate pair.
  *
  * A codegen'd counting loop rather than the
  * `aggregate(zip_with(...))` HOF chain: nested lambdas are interpreted
  * (no whole-stage codegen, no subexpression elimination — the measured
  * 30× trap documented in llm/LlmQueries.md5Sigs), and this expression
  * sits on the hottest row stream of the LSH funnel (every candidate
  * collision). Output is an exact integer count — cross-engine safe by
  * construction; the one division happens once, outside, in both
  * engines.
  */
case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "sig_agree"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $agree++;
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigAgree {
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) =
    ("sig_agree",
      new ExpressionInfo(classOf[SigAgree].getName, "sig_agree"),
      (es: Seq[Expression]) => SigAgree(es(0), es(1)))
}
