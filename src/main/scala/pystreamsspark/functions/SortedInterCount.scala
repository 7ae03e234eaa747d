package pystreamsspark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `sorted_inter_count(a, b)` — |a ∩ b| for two SORTED-ascending,
  * DISTINCT, null-free arrays (both `array<bigint>` or both
  * `array<string>`), via a single zero-allocation merge loop.
  *
  * This is the exact-verify kernel of every set-similarity funnel
  * (Jaccard / containment / gram-overlap): the previous form
  * `size(array_intersect(a, b))` builds a hash set AND materializes the
  * intersection array per candidate pair only to take its length —
  * measured ~88 µs/pair on the sf0.1 block-join verify (14 s of CPU for
  * 159k pairs), vs a ~60-comparison merge here. Pairing it with
  * `n_union = size(a) + size(b) - n_inter` (exact for distinct arrays)
  * also removes the second hash-set pass `size(array_union(a, b))` the
  * old verify paid.
  *
  * CONTRACT (caller-enforced, not checked): both arrays sorted ascending
  * by their type's natural order (`array_sort` order — longs numeric,
  * strings UTF8 binary), elements distinct. Every call site in this
  * engine feeds arrays built with `array_sort(array_distinct(...))` or
  * an order-normalized substrate. The produced count is bit-identical to
  * `size(array_intersect(a, b))` under that contract, so swapping
  * implementations cannot change any oracle-compared value.
  *
  * NULL elements (r15, ADVICE r14 #1): the function is registered in the
  * public session registry, so user SQL can feed arrays the engine never
  * produces. A null element previously NPE'd (string path) or silently
  * read as 0 (long path). Now handled with `array_intersect` parity
  * under the `array_sort` order (nulls sort LAST): null compares greater
  * than every value, and null-in-both counts as one shared element. The
  * checks are emitted ONLY for inputs whose ArrayType declares
  * `containsNull = true` — every engine hot path (ShingleHash and the
  * minhash substrates declare containsNull = false) keeps the original
  * zero-branch merge loop.
  */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_inter_count"
  override def dataType: DataType = IntegerType

  private def elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case _ => LongType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ts = Seq(left, right).map(_.dataType)
    val ok = ts match {
      case Seq(ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case Seq(ArrayType(StringType, _), ArrayType(StringType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> or two array<string> " +
        s"arguments, got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
  }

  // static per-side nullability: false on every engine substrate, so the
  // hot merge loop stays branch-free there; true only for user SQL whose
  // schema admits null elements
  private def sideMayBeNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    val lN = sideMayBeNull(left); val rN = sideMayBeNull(right)
    var i = 0; var j = 0; var c = 0
    if (elemType == LongType) {
      while (i < na && j < nb) {
        val xn = lN && x.isNullAt(i); val yn = rN && y.isNullAt(j)
        if (xn || yn) {
          // nulls sort LAST under array_sort: null > every value,
          // null == null (array_intersect counts a shared null once)
          if (xn && yn) { c += 1; i += 1; j += 1 }
          else if (xn) j += 1
          else i += 1
        } else {
          val xv = x.getLong(i); val yv = y.getLong(j)
          if (xv < yv) i += 1
          else if (xv > yv) j += 1
          else { c += 1; i += 1; j += 1 }
        }
      }
    } else {
      while (i < na && j < nb) {
        val xn = lN && x.isNullAt(i); val yn = rN && y.isNullAt(j)
        if (xn || yn) {
          if (xn && yn) { c += 1; i += 1; j += 1 }
          else if (xn) j += 1
          else i += 1
        } else {
          val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
          if (cmp < 0) i += 1
          else if (cmp > 0) j += 1
          else { c += 1; i += 1; j += 1 }
        }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val merge = if (elemType == LongType) {
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |long $xv = $a.getLong($i);
           |long $yv = $b.getLong($j);
           |if ($xv < $yv) $i++;
           |else if ($xv > $yv) $j++;
           |else { $c++; $i++; $j++; }
         """.stripMargin
      } else {
        val cmp = ctx.freshName("cmp")
        s"""
           |int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |if ($cmp < 0) $i++;
           |else if ($cmp > 0) $j++;
           |else { $c++; $i++; $j++; }
         """.stripMargin
      }
      // null-element handling compiled in ONLY when a side's ArrayType
      // admits nulls (see class scaladoc) — engine substrates declare
      // containsNull=false and keep the branch-free loop verbatim
      val body =
        if (!sideMayBeNull(left) && !sideMayBeNull(right)) merge
        else {
          val xn = ctx.freshName("xn")
          val yn = ctx.freshName("yn")
          val lChk = if (sideMayBeNull(left)) s"$a.isNullAt($i)" else "false"
          val rChk = if (sideMayBeNull(right)) s"$b.isNullAt($j)" else "false"
          s"""
             |boolean $xn = $lChk;
             |boolean $yn = $rChk;
             |if ($xn || $yn) {
             |  if ($xn && $yn) { $c++; $i++; $j++; }
             |  else if ($xn) $j++;
             |  else $i++;
             |} else {
             |  $merge
             |}
           """.stripMargin
        }
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  $body
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedInterCount {
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) =
    ("sorted_inter_count",
      // the sorted+distinct CONTRACT in the registry's usage text, so
      // SQL users see it in DESCRIBE FUNCTION (ADVICE r14 #2): on
      // unsorted or duplicate-bearing input the count silently
      // undercounts vs array_intersect semantics
      new ExpressionInfo(classOf[SortedInterCount].getName, null,
        "sorted_inter_count",
        "_FUNC_(a, b) - |a INTERSECT b| for two arrays that MUST be " +
          "sorted ascending (array_sort order, nulls last) with distinct " +
          "elements — e.g. built via array_sort(array_distinct(...)). " +
          "On input violating that contract the result is undefined " +
          "(silently undercounts vs array_intersect). Both arguments " +
          "must be array<bigint> or both array<string>.",
        ""),
      (es: Seq[Expression]) => SortedInterCount(es(0), es(1)))
}
