package graft.types

import java.sql.Types
import java.util.Locale
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** JDBC dialect carrying the reference's MySQL type semantics into Spark's
  * JDBC *reader* (SURVEY.md §4 "custom Catalyst work" item 1) — the
  * catalog-introspection replacement for the reference's regex type mapper
  * (`sync_tableddl.go:113-167`):
  *
  *  - `tinyint(1)` → BooleanType (`sync_tableddl.go:121`)
  *  - unsigned integers widen one step (the fidelity fix over the
  *    reference's silent strip, `:365-366`): `tinyint/smallint unsigned` →
  *    Integer, `int/mediumint unsigned` → Long, `bigint unsigned` →
  *    Decimal(20,0)
  *  - `year` → IntegerType (`:150`)
  *  - `json` → StringType parsed on demand (`:152`)
  *  - spatial types → BinaryType (pair with [[graft.functions.PointDecode]])
  *
  * TIME is deliberately NOT overridden: the JDBC driver materializes
  * `java.sql.Time` values, so remapping the column type would break row
  * conversion — the portable micros-of-day mapping is applied post-read by
  * [[TypeMapper]] when a schema is built from DDL instead of JDBC metadata.
  *
  * Use [[MySqlGraftDialect.install]] once per JVM; `spark.read.jdbc` then
  * picks it up for any `jdbc:mysql:` URL. [[sourceUrl]] appends the
  * zero-date handling the reference implements in its row converter
  * (`connection.go:526-541`) — at the protocol level, where it is free.
  */
object MySqlGraftDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:mysql")

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = {
    val tn = typeName.toUpperCase(Locale.ROOT)
    val unsigned = tn.endsWith(" UNSIGNED") || tn.contains(" UNSIGNED ")
    tn.split(' ').head match {
      case "TINYINT" if size == 1 && !unsigned => Some(BooleanType)
      case "TINYINT" | "SMALLINT" if unsigned => Some(IntegerType)
      case "INT" | "INTEGER" | "MEDIUMINT" if unsigned => Some(LongType)
      case "BIGINT" if unsigned => Some(DecimalType(20, 0))
      case "YEAR" => Some(IntegerType)
      case "JSON" => Some(StringType)
      case "POINT" | "GEOMETRY" | "LINESTRING" | "POLYGON" | "MULTIPOINT" |
           "MULTILINESTRING" | "MULTIPOLYGON" | "GEOMETRYCOLLECTION" =>
        Some(BinaryType)
      case _ => None
    }
  }

  /** Write-side mapping (only needed if a MySQL endpoint is a *sink*). */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case BooleanType => Some(JdbcType("TINYINT(1)", Types.TINYINT))
    case StringType => Some(JdbcType("TEXT", Types.LONGVARCHAR))
    case BinaryType => Some(JdbcType("BLOB", Types.BLOB))
    case t: DecimalType => Some(JdbcType(s"DECIMAL(${t.precision},${t.scale})", Types.DECIMAL))
    case _ => None
  }

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** Reference row-converter behaviors pushed to the driver protocol:
    * zero dates arrive as NULL, and TINYINT(1) stays integral unless the
    * Boolean mapping is wanted. */
  def sourceUrl(url: String, tinyInt1isBit: Boolean = true): String = {
    val sep = if (url.contains("?")) "&" else "?"
    s"$url${sep}zeroDateTimeBehavior=convertToNull&tinyInt1isBit=$tinyInt1isBit"
  }

  private val installed = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Once-only JVM-wide registration. The registry's dialect list is an
    * unsynchronized var, so an unregister/re-register pair on every read
    * would open a window where a concurrent `spark.read.jdbc` resolves the
    * default MySQL dialect (and e.g. BIGINT UNSIGNED maps differently,
    * tripping checksum validation). */
  def install(): Unit =
    if (installed.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}
