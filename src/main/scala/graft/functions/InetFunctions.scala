package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** MySQL INET_ATON / INET_NTOA (SURVEY.md §2.4 network table;
  * `sync_viewddl.go:83-85, 540-565`) — Spark has no native inet functions,
  * so these are the two genuine custom scalar functions the §2.4 surface
  * needs. Cold-path (CodegenFallback): they appear in rewritten view select
  * lists, not in hot aggregation loops.
  *
  * Semantics follow MySQL: INET_ATON accepts 1-4 dot-separated parts
  * (`127.1` ≡ `127.0.0.1`: the last part fills the remaining bytes);
  * invalid input → NULL. INET_NTOA of out-of-range values → NULL.
  */
case class InetAton(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val parts = s.split("\\.", -1)
    if (parts.isEmpty || parts.length > 4 || parts.exists(p => p.isEmpty || !p.forall(_.isDigit)))
      return null
    val nums = parts.map(_.toLong)
    if (nums.exists(_ > 255) && parts.length == 4) return null
    // MySQL: last part covers the remaining low bytes
    val lastMax = parts.length match {
      case 1 => 0xffffffffL
      case 2 => 0xffffffL
      case 3 => 0xffffL
      case _ => 0xffL
    }
    if (nums.init.exists(_ > 255) || nums.last > lastMax) return null
    val high = nums.init.zipWithIndex.foldLeft(0L) { case (acc, (n, i)) =>
      acc | (n << (8 * (3 - i)))
    }
    java.lang.Long.valueOf(high | nums.last)
  }

  override protected def withNewChildInternal(newChild: Expression): InetAton =
    copy(child = newChild)
}

case class InetNtoa(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DataTypes.StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case _ => return null
    }
    if (v < 0L || v > 0xffffffffL) return null
    UTF8String.fromString(
      s"${(v >> 24) & 0xff}.${(v >> 16) & 0xff}.${(v >> 8) & 0xff}.${v & 0xff}")
  }

  override protected def withNewChildInternal(newChild: Expression): InetNtoa =
    copy(child = newChild)
}

object InetFunctions {
  def register(spark: SparkSession): Unit = Registration.once(spark, "inet_aton", "inet_ntoa") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "inet_aton", exprs => InetAton(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "inet_ntoa", exprs => InetNtoa(exprs.head), "built-in")
  }
}
