package pystreamsspark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined word k-shingles as STRINGS: for an
  * `array<string>` token column, emits `array<string>` of the contiguous
  * k-grams, first-occurrence-ordered and per-row distinct — bit-identical
  * to the `array_distinct(transform(sequence, i -> concat_ws(slice)))`
  * formulation in `Dedup.shingles`, but one codegen'd JVM loop per row
  * instead of four interpreted HOF lambdas per GRAM (measured 1.48 s vs
  * 0.19 s for the hash twin over sf0.1 documents — the gram-string hot
  * spot shared by the contamination / boilerplate / inverted-index
  * keys).
  *
  * Same edge semantics as [[ShingleHash]] / `Dedup.shingles`: empty
  * token array → empty result; fewer than k tokens → one shingle over
  * all tokens.
  */
case class ShingleStrings(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "shingle_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val kk = math.min(k, math.max(n, 1))
    val m = math.max(n - kk + 1, if (n == 0) 0 else 1)
    val set = new java.util.LinkedHashSet[UTF8String]()
    var g = 0
    while (g < m) {
      val len = math.min(kk, n - g)
      val win = java.util.Arrays.copyOfRange(toks, g, g + len)
      set.add(UTF8String.concatWs(sep, win: _*))
      g += 1
    }
    new GenericArrayData(set.toArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val toks = ctx.freshName("toks")
      val i = ctx.freshName("i"); val kk = ctx.freshName("kk")
      val m = ctx.freshName("m"); val set = ctx.freshName("set")
      val g = ctx.freshName("g"); val len = ctx.freshName("len")
      val win = ctx.freshName("win")
      s"""
         |int $n = $a.numElements();
         |UTF8String[] $toks = new UTF8String[$n];
         |for (int $i = 0; $i < $n; $i++) { $toks[$i] = $a.getUTF8String($i); }
         |int $kk = java.lang.Math.min($k, java.lang.Math.max($n, 1));
         |int $m = java.lang.Math.max($n - $kk + 1, $n == 0 ? 0 : 1);
         |java.util.LinkedHashSet $set = new java.util.LinkedHashSet();
         |for (int $g = 0; $g < $m; $g++) {
         |  int $len = java.lang.Math.min($kk, $n - $g);
         |  UTF8String[] $win = (UTF8String[])
         |    java.util.Arrays.copyOfRange($toks, $g, $g + $len);
         |  $set.add(UTF8String.concatWs($sepRef, $win));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($set.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) =
    ("shingle_strings",
      new ExpressionInfo(classOf[ShingleStrings].getName, "shingle_strings"),
      (es: Seq[Expression]) => ShingleStrings(es(0), es(1).eval().asInstanceOf[Int]))
}
