package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}

/** Decode a MySQL-internal POINT value (4-byte SRID prefix + 21-byte WKB:
  * byte order, uint32 type=1, float64 x, float64 y — 25 bytes total) into
  * `struct(x double, y double)`.
  *
  * Re-implements the reference's `parseMySQLPoint`
  * (`internal/postgres/connection.go:596-633`) as a Catalyst expression so
  * the decode runs on executors inside the scan projection rather than in a
  * driver-side row loop. Also accepts bare 21-byte WKB (no SRID prefix).
  * Malformed input → null (the reference falls back to a zero point; null
  * is the honest Spark semantics).
  */
case class PointDecode(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val wkb =
      if (bytes.length == 25) bytes.drop(4)      // SRID-prefixed MySQL format
      else if (bytes.length == 21) bytes         // bare WKB
      else return null
    val littleEndian = wkb(0) == 0x01
    val buf = ByteBuffer.wrap(wkb, 1, 20)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val geomType = buf.getInt
    if (geomType != 1) return null               // 1 = WKB Point
    InternalRow(buf.getDouble, buf.getDouble)
  }

  override protected def withNewChildInternal(newChild: Expression): PointDecode =
    copy(child = newChild)
}

object PointDecode {
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft_point_decode") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_point_decode", exprs => PointDecode(exprs.head), "built-in")
    }

  /** Build a MySQL-internal point byte array (for tests / fixtures). */
  def encode(x: Double, y: Double, srid: Int = 0): Array[Byte] = {
    val buf = ByteBuffer.allocate(25).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(srid)
    buf.put(0x01.toByte)
    buf.putInt(1)
    buf.putDouble(x)
    buf.putDouble(y)
    buf.array()
  }
}
