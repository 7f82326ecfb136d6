package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(str)` — Unicode NFC normalization (canonical decomposition +
  * canonical reordering + composition, UAX #15) via `java.text.Normalizer`.
  * DuckDB's `nfc_normalize` (utf8proc) implements the same standard, so
  * the two engines agree byte-for-byte on every string — q256 pins that
  * over precomposed/decomposed twins, the U+212B/U+2126 singletons, and a
  * combining-class reorder pair. CodegenFallback: the per-row work is the
  * JDK's compiled normalizer; ASCII fast path skips it entirely (the
  * common corpus case — quickCheck YES means already NFC). */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft_nfc") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
    }
}
