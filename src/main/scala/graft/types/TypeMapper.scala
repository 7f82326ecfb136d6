package graft.types

import org.apache.spark.sql.types._
import java.util.Locale

/** MySQL column type → (Spark DataType, PostgreSQL DDL type).
  *
  * Re-expresses the reference's `typeMap` + precision-preserving patterns
  * (`internal/converter/postgres/sync_tableddl.go:78-167`, applied at
  * `:539-573`) as a data-driven mapper instead of ordered regex replacement.
  * Notable semantics carried over:
  *  - `tinyint(1)` → BOOLEAN (`sync_tableddl.go:121`, fast path `:315-318`)
  *  - decimal/char/varchar/datetime precision preserved (`:100-110`)
  *  - `json(n)` display-width collapse (`:30-31`, `:320-323`)
  *  - enum/set → VARCHAR(255) (`:165-166`, `:601-603`)
  *  - spatial: `point` → POINT, others → BYTEA (`:155-163`)
  *  - `char(0)`/`varchar(0)` clamped (`connection.go:84`, `:604`)
  *  - zerofill/display-width stripped (`:524-525`)
  * and one deliberate fidelity *fix* over the reference (SURVEY.md §1.2):
  * `unsigned` widens one step (`int unsigned` → BIGINT) instead of being
  * silently stripped (`sync_tableddl.go:365-366`).
  */
object TypeMapper {

  final case class MappedType(spark: DataType, pg: String)

  private val ParenArgs = """^([a-z ]+?)\s*\(\s*([^)]*)\s*\)\s*$""".r

  /** Normalize: lowercase, strip zerofill, collapse whitespace; returns
    * (baseType, args, unsigned). */
  private def parse(raw: String): (String, List[String], Boolean) = {
    var s = raw.trim.toLowerCase(Locale.ROOT)
      .replaceAll("\\s+", " ")
      .replace(" zerofill", "")
    val unsigned = s.contains(" unsigned")
    s = s.replace(" unsigned", "").trim
    s match {
      case ParenArgs(base, args) =>
        (base.trim, args.split(",").map(_.trim).filter(_.nonEmpty).toList, unsigned)
      case _ => (s, Nil, unsigned)
    }
  }

  /** Map a MySQL type string (as in SHOW FULL COLUMNS / DDL) to Spark + PG.
    * @param widenUnsigned when true (default), unsigned integer types widen
    *        one step; false replicates the reference's lossy strip.
    * @param tinyint1Boolean when false, tinyint(1) stays SMALLINT — MySQL's
    *        own runtime semantics (it computes ROUND(bool_col) happily);
    *        true is the PG-target mapping the reference uses.
    * @param timeNative when true, TIME maps to Spark 4's native TimeType
    *        (requires spark.sql.timeType.enabled); default keeps the
    *        portable micros-of-day BIGINT. */
  def map(mysqlType: String, widenUnsigned: Boolean = true,
          tinyint1Boolean: Boolean = true,
          timeNative: Boolean = false): MappedType = {
    val (base, args, unsigned) = parse(mysqlType)
    def arg0: Option[Int] = args.headOption.flatMap(_.toIntOption)
    val widen = unsigned && widenUnsigned

    base match {
      case "tinyint" if arg0.contains(1) && !unsigned && tinyint1Boolean =>
        MappedType(BooleanType, "BOOLEAN")
      case "tinyint" | "smallint" | "tinyinteger" | "smallinteger" =>
        if (widen) MappedType(IntegerType, "INTEGER")
        else MappedType(ShortType, "SMALLINT")
      case "int" | "integer" | "mediumint" =>
        if (widen) MappedType(LongType, "BIGINT")
        else MappedType(IntegerType, "INTEGER")
      case "bigint" | "biginteger" =>
        if (widen) MappedType(DecimalType(20, 0), "NUMERIC(20,0)")
        else MappedType(LongType, "BIGINT")
      case "year" => MappedType(IntegerType, "INTEGER")
      case "bit" =>
        arg0 match {
          case Some(1) | None => MappedType(BooleanType, "BOOLEAN")
          case Some(n)        => MappedType(LongType, s"BIT($n)")
        }
      case "decimal" | "numeric" | "dec" | "fixed" =>
        val p = math.max(args.headOption.flatMap(_.toIntOption).getOrElse(10), 1)
        // scale outside [0, precision] is invalid even in MySQL; clamp so
        // the mapper stays total on malformed catalog strings (negative
        // scales are also rejected by Spark's DecimalType since 3.0)
        val sc = math.min(math.max(args.lift(1).flatMap(_.toIntOption).getOrElse(0), 0), p)
        val kw = if (base == "numeric") "NUMERIC" else "DECIMAL"
        // MySQL allows DECIMAL up to (65,30); Spark caps precision at 38.
        // Clamp preserving integer digits first (documented lossy edge);
        // the PG side keeps the original precision (PG supports it).
        val intDigits = math.min(p - sc, DecimalType.MAX_PRECISION)
        val sparkScale = math.min(sc, DecimalType.MAX_PRECISION - intDigits)
        val sparkPrec = math.min(p, DecimalType.MAX_PRECISION)
        MappedType(DecimalType(sparkPrec, sparkScale), s"$kw($p,$sc)")
      case "double" | "double precision" | "real" =>
        MappedType(DoubleType, "DOUBLE PRECISION")
      case "float" => MappedType(FloatType, "REAL")
      case "char" | "character" =>
        val n = math.max(arg0.getOrElse(1), 1) // char(0) clamp
        MappedType(StringType, s"CHAR($n)")
      case "varchar" | "character varying" =>
        val n = math.max(arg0.getOrElse(255), 1) // varchar(0) clamp
        MappedType(StringType, s"VARCHAR($n)")
      case "text" | "longtext" | "mediumtext" | "tinytext" =>
        MappedType(StringType, "TEXT")
      case "blob" | "longblob" | "mediumblob" | "tinyblob" | "binary" | "varbinary" =>
        MappedType(BinaryType, "BYTEA")
      case "datetime" | "timestamp" =>
        val prec = arg0.map(p => s"($p)").getOrElse("")
        MappedType(TimestampType, s"TIMESTAMP$prec")
      case "date" => MappedType(DateType, "DATE")
      case "time" =>
        val prec = arg0.map(p => s"($p)").getOrElse("")
        if (timeNative)  // Spark 4 native TIME (behind spark.sql.timeType.enabled)
          MappedType(TimeType(math.min(arg0.getOrElse(6), 6)), s"TIME$prec")
        else  // portable default: micros-of-day (lossless, sortable)
          MappedType(LongType, s"TIME$prec")
      case "json" => MappedType(StringType, "JSON")   // json(n) collapse
      case "jsonb" => MappedType(StringType, "JSONB")
      case "enum" | "set" => MappedType(StringType, "VARCHAR(255)")
      case "point" => MappedType(BinaryType, "POINT")
      case "geometry" | "linestring" | "polygon" | "multipoint" |
           "multilinestring" | "multipolygon" | "geometrycollection" =>
        MappedType(BinaryType, "BYTEA")
      case "boolean" | "bool" => MappedType(BooleanType, "BOOLEAN")
      case other => MappedType(StringType, s"TEXT /* unmapped: $other */")
    }
  }

  /** AUTO_INCREMENT DDL emission (sync_tableddl.go:351-357, :793-821).
    * Widens unsigned one step, matching [[map]]'s widening fix: an
    * `int unsigned AUTO_INCREMENT` id can exceed 2^31, so it must land in
    * BIGSERIAL, not SERIAL. `bigint unsigned AUTO_INCREMENT` has no PG
    * serial/identity type wide enough (identity requires an int type, so
    * NUMERIC(20,0) identity is not an option): emitted as BIGSERIAL with
    * the documented lossy edge that values above 2^63-1 are unsupported —
    * in practice unreachable for an auto-increment counter. */
  def serialFor(mysqlType: String): Option[String] = {
    val (base, _, unsigned) = parse(mysqlType)
    base match {
      case "int" | "integer" | "mediumint" =>
        Some(if (unsigned) "BIGSERIAL" else "SERIAL")
      case "bigint" => Some("BIGSERIAL")
      case "smallint" | "tinyint" =>
        Some(if (unsigned) "SERIAL" else "SMALLSERIAL")
      case _ => None
    }
  }
}
