package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the suffix-repeat operator (X220/q253): the
  * per-position anchor scan and the longest-common-prefix extension are
  * each a tight byte loop here instead of an interpreted per-position HOF
  * lambda — measured 3.5 s → sub-second for the q253 anchor pass at sf0.1
  * (~1.4M candidate positions; the HOF paid ~2.4 µs of interpreter
  * overhead per position). Both kernels are codepoint-correct on any
  * UTF-8 text (offsets walk leading bytes), so they replay exactly
  * against DuckDB's per-codepoint substr arithmetic. */
object SuffixText {

  private def codePointOffsets(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val offs = new Array[Int](s.numChars() + 1)
    var j = 0
    var c = 0
    while (j < bytes.length) {
      offs(c) = j
      j += UTF8String.numBytesForFirstByte(bytes(j))
      c += 1
    }
    offs(c) = bytes.length
    offs
  }

  /** 1-based codepoint positions p <= numChars-keyLen+1 whose ctx-codepoint
    * window hashes ([[Fingerprint]]'s byte fold) to 0 mod `mod`. */
  def anchorPositions(s: UTF8String, ctx: Int, mod: Int, keyLen: Int): Array[Long] = {
    val n = s.numChars()
    if (n < keyLen) return Array.emptyLongArray
    val bytes = s.getBytes
    val offs = codePointOffsets(s)
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / mod + 1)
    var p = 0
    while (p <= n - keyLen) {
      var acc = 0L
      var j = offs(p)
      val end = offs(p + ctx)
      while (j < end) {
        acc = (acc * 31 + (bytes(j) & 0xff)) % 1000000007L
        j += 1
      }
      if (acc % mod == 0) out += (p + 1).toLong
      p += 1
    }
    out.toArray
  }

  /** Longest common prefix in CODEPOINTS: equal-byte prefix truncated to
    * the last complete codepoint (UTF-8 prefixes are codepoint-aligned or
    * split mid-codepoint; only complete ones count, matching per-codepoint
    * substr comparison in the oracle). */
  def lcp(a: UTF8String, b: UTF8String): Long = {
    val ab = a.getBytes
    val bb = b.getBytes
    val lim = math.min(ab.length, bb.length)
    var i = 0
    while (i < lim && ab(i) == bb(i)) i += 1
    // count complete codepoints inside the matched byte prefix [0, i)
    var j = 0
    var cnt = 0L
    while (j < i) {
      val w = UTF8String.numBytesForFirstByte(ab(j))
      if (j + w > i) return cnt
      cnt += 1
      j += w
    }
    cnt
  }

  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft_anchor_positions", "graft_lcp") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_anchor_positions",
        exprs => SuffixAnchorPositions(exprs(0), exprs(1), exprs(2), exprs(3)),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_lcp", exprs => GraftLcp(exprs(0), exprs(1)), "built-in")
    }
}

/** `graft_anchor_positions(str, ctx, mod, keyLen)` — see [[SuffixText
  * .anchorPositions]]. ctx/mod/keyLen must be foldable ints. Evaluated via
  * CodegenFallback: the per-row work is an internal compiled loop, so the
  * fallback's boxing cost is per ROW, not per position. */
case class SuffixAnchorPositions(str: Expression, ctx: Expression,
    mod: Expression, keyLen: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(str, ctx, mod, keyLen)
  override def nullable: Boolean = str.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType == StringType &&
        Seq(ctx, mod, keyLen).forall(e => e.foldable &&
          (e.dataType == IntegerType || e.dataType == LongType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_anchor_positions(str, ctx, mod, keyLen) needs a string and 3 foldable ints")

  private lazy val ctxV = ctx.eval(InternalRow.empty).asInstanceOf[Number].intValue()
  private lazy val modV = mod.eval(InternalRow.empty).asInstanceOf[Number].intValue()
  private lazy val keyV = keyLen.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): Any = {
    val v = str.eval(input)
    if (v == null) null
    else new GenericArrayData(SuffixText.anchorPositions(
      v.asInstanceOf[UTF8String], ctxV, modV, keyV))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SuffixAnchorPositions =
    copy(str = newChildren(0), ctx = newChildren(1),
      mod = newChildren(2), keyLen = newChildren(3))
}

/** `graft_lcp(a, b)` — codepoint LCP, see [[SuffixText.lcp]]. */
case class GraftLcp(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_lcp needs two strings")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SuffixText.lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftLcp =
    copy(left = newLeft, right = newRight)
}
