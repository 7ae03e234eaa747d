package pystreamsspark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hashed word k-shingles: for an `array<string>` token column, emits
  * `array<long>` where element i is the combined XXH64 of tokens
  * [i, i+k) — the contiguous k-gram — WITHOUT materializing the shingle
  * strings (the interpreted slice+concat formulation in
  * `Dedup.shingles` was the hot spot of the MinHash pipeline; this is
  * one codegen loop hashing each token once then mixing k token-hashes
  * per gram).
  *
  * Shorter-than-k documents emit one shingle over all tokens (same
  * semantics as `Dedup.shingles`). May contain duplicate hashes — wrap
  * in `array_distinct` (cheap on longs) where set semantics matter.
  */
case class ShingleHash(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "shingle_hash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tokHash = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      tokHash(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      i += 1
    }
    val kk = math.min(k, math.max(n, 1))
    val m = math.max(n - kk + 1, if (n == 0) 0 else 1)
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      var h = -7046029254386353131L // arbitrary odd seed
      var j = 0
      while (j < kk && g + j < n) { h = XXH64.hashLong(tokHash(g + j), h); j += 1 }
      out(g) = h
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val th = ctx.freshName("th")
      val i = ctx.freshName("i"); val kk = ctx.freshName("kk")
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val g = ctx.freshName("g"); val h = ctx.freshName("h")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long[] $th = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $s = $a.getUTF8String($i);
         |  $th[$i] = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |}
         |int $kk = java.lang.Math.min($k, java.lang.Math.max($n, 1));
         |int $m = java.lang.Math.max($n - $kk + 1, $n == 0 ? 0 : 1);
         |long[] $out = new long[$m];
         |for (int $g = 0; $g < $m; $g++) {
         |  long $h = -7046029254386353131L;
         |  for (int $j = 0; $j < $kk && $g + $j < $n; $j++) {
         |    $h = $xxh.hashLong($th[$g + $j], $h);
         |  }
         |  $out[$g] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash {
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) =
    ("shingle_hash",
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
      (es: Seq[Expression]) => ShingleHash(es(0), es(1).eval().asInstanceOf[Int]))
}
