package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Intersection size of two SORTED, de-duplicated arrays (STRING or BIGINT
  * elements) as a single codegen'd merge loop.
  *
  * `array_intersect(a, b)` builds a hash set of one side and materializes
  * the intersection array PER CALL — in a blocked similarity join that is
  * per-pair allocation on the hottest path in the engine. When both inputs
  * are pre-sorted once per row (`array_sort`, amortized over all pairs the
  * row participates in), the count needs one allocation-free merge scan:
  * O(|a|+|b|) comparisons, no hashing, no output array. Inputs MUST be
  * sorted ascending and distinct (Spark's array_sort order); NULL input or
  * a NULL element (which has no sort position) → NULL, mirroring
  * [[DotProduct]].
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) |
           (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_sorted_inter_n requires two ARRAY<STRING> or two ARRAY<BIGINT> args, " +
          s"got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (xa.numElements(), xb.numElements())
    // array_sort places NULL elements LAST, so a null last element catches
    // any null in the tail the merge loop never reaches (the loop's own
    // checks cover the scanned prefix) — '[NULL element] → NULL' holds for
    // the whole array, not just the scanned part
    if ((n > 0 && xa.isNullAt(n - 1)) || (m > 0 && xb.isNullAt(m - 1))) return null
    var i = 0; var j = 0; var c = 0L
    if (elemType == StringType) {
      while (i < n && j < m) {
        if (xa.isNullAt(i) || xb.isNullAt(j)) return null
        val cmp = xa.getUTF8String(i).compareTo(xb.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1 else j += 1
      }
    } else {
      while (i < n && j < m) {
        if (xa.isNullAt(i) || xb.isNullAt(j)) return null
        val cmp = java.lang.Long.compare(xa.getLong(i), xb.getLong(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1 else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, m, i, j, c, cmp) = (ctx.freshName("n"), ctx.freshName("m"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("cmp"))
      val cmpExpr = elemType match {
        case StringType => s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        case _ => s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      }
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |// array_sort puts NULLs last: a null last element covers the
         |// unscanned tail, keeping '[NULL element] -> NULL' exact
         |if (($n > 0 && $a.isNullAt($n - 1)) || ($m > 0 && $b.isNullAt($m - 1))) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0; int $j = 0; long $c = 0L;
         |  while ($i < $n && $j < $m) {
         |    if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $cmp = $cmpExpr;
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; } else { $j++; }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft_sorted_inter_n") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_sorted_inter_n", exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")
    }
}
